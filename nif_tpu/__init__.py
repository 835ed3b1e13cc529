"""nif_tpu — a TPU-native (JAX/XLA/Pallas) Neural Implicit Flow framework.

A ground-up rebuild of the capabilities of the reference NIF library
(pswpswpsw/nif): mesh-agnostic dimensionality reduction of parametric
spatio-temporal fields via hypernetworks, redesigned for TPU:

* pure-functional models (init/apply) instead of Keras builder objects;
* the hot op — per-sample-generated-weight MLP evaluation — has a point-wise
  reference path, a grouped MXU path, and a fused Pallas kernel;
* data parallelism over the point axis via ``jax.sharding`` meshes;
* optax-based training with L-BFGS fine-tuning, Sobolev losses as
  jacfwd/jvp compositions, orbax checkpointing.
"""
from .__about__ import __version__
from . import compression
from . import data
from . import demo
from . import layers
from . import models
from . import ops
from . import optimizers
from . import parallel
from . import serving
from . import training
from . import utils
from .config import NIFConfig, ParameterNetConfig, ShapeNetConfig
from .models import NIF, NIFMultiScale, NIFMultiScaleLastLayerParameterized
from .utils.policy import Policy, get_policy

__all__ = [
    "__version__",
    "NIF",
    "NIFMultiScale",
    "NIFMultiScaleLastLayerParameterized",
    "NIFConfig",
    "ShapeNetConfig",
    "ParameterNetConfig",
    "Policy",
    "get_policy",
    "data",
    "demo",
    "layers",
    "models",
    "ops",
    "optimizers",
    "parallel",
    "serving",
    "training",
    "utils",
    "compression",
]
