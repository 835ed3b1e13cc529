"""Weight initializers matching the reference's distributions.

Init parity is what makes convergence parity with the reference achievable,
so each function documents the distribution it replicates:

* ``truncated_normal_init`` — TF ``TruncatedNormal(stddev=0.1)`` used for the
  vanilla ParameterNet (reference nif/model.py:181-182 etc.). TF truncates at
  two standard deviations and resamples, which is exactly
  ``jax.random.truncated_normal(-2, 2) * stddev``.
* ``siren_first_init`` / ``siren_hidden_init`` — SIREN position-dependent
  uniform ranges (reference nif/layers/siren.py:178-204).
* ``hyper_linear_init`` — the hypernetwork head init whose *bias* is scaled
  per-segment so the generated ShapeNet weights start in the right SIREN
  regime (reference nif/layers/siren.py:6-63).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "truncated_normal_init",
    "siren_first_init",
    "siren_hidden_init",
    "hyper_linear_init",
    "hyper_bias_scales",
]


def truncated_normal_init(key, shape, stddev: float = 0.1, dtype=jnp.float32):
    """TF-style TruncatedNormal: N(0, stddev) truncated at +/- 2 stddev."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev


def siren_first_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """SIREN first-layer init: W ~ U(+/- 1/fan_in), b ~ U(+/- 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -1.0 / fan_in, 1.0 / fan_in)
    lim_b = 1.0 / np.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), dtype, -lim_b, lim_b)
    return w, b


def siren_hidden_init(key, fan_in: int, fan_out: int, omega_0: float, dtype=jnp.float32):
    """SIREN hidden/bottleneck init: W ~ U(+/- sqrt(6/fan_in)/omega_0),
    b ~ U(+/- 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    lim_w = np.sqrt(6.0 / fan_in) / omega_0
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -lim_w, lim_w)
    lim_b = 1.0 / np.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), dtype, -lim_b, lim_b)
    return w, b


def hyper_bias_scales(
    num_outputs: int,
    num_weight_first: int,
    num_weight_hidden: int,
    num_weight_last: int,
    input_dim: int,
    width: int,
    omega_0: float,
) -> np.ndarray:
    """Per-output bias init half-range for the hypernetwork head.

    Segment layout (matching the ShapeNet weight-vector slicing order):
    [first-layer W | hidden Ws | last W | all biases]; scales replicate
    reference nif/layers/siren.py:42-58.
    """
    scale = np.ones((num_outputs,), dtype=np.float64)
    i0 = num_weight_first
    i1 = i0 + num_weight_hidden
    i2 = i1 + num_weight_last
    scale[:i0] /= input_dim
    scale[i0:i1] *= np.sqrt(6.0 / width) / omega_0
    scale[i1:i2] *= np.sqrt(6.0 / (width + width))
    scale[i2:] /= width
    return scale


def hyper_linear_init(
    key,
    fan_in: int,
    fan_out: int,
    weight_factor: float,
    num_weight_first: int,
    num_weight_hidden: int,
    num_weight_last: int,
    input_dim: int,
    width: int,
    omega_0: float,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hypernetwork head init (reference nif/layers/siren.py:6-63).

    W ~ U(+/- sqrt(6/fan_in) * weight_factor); b ~ U(-s_j, s_j) where s_j is
    the per-segment scale from :func:`hyper_bias_scales`.
    """
    kw, kb = jax.random.split(key)
    lim_w = np.sqrt(6.0 / fan_in) * weight_factor
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -lim_w, lim_w)
    scale = jnp.asarray(
        hyper_bias_scales(
            fan_out,
            num_weight_first,
            num_weight_hidden,
            num_weight_last,
            input_dim,
            width,
            omega_0,
        ),
        dtype,
    )
    b = jax.random.uniform(kb, (fan_out,), dtype, -1.0, 1.0) * scale
    return w, b
