"""Functional SIREN blocks (init/apply pairs).

Pure-functional equivalents of the reference layers:

* siren            — sine-activated dense with position-dependent init
                     (reference nif/layers/siren.py:100-305). 'bottleneck'
                     position is LINEAR in the forward pass, matching
                     reference nif/layers/siren.py:271-281.
* siren_resnet     — ``0.5 * (x + sin(w0 * h @ W2 + b2))`` with
                     ``h = sin(w0 * x @ W + b)``
                     (reference nif/layers/siren.py:307-421).
* hyper_linear     — the hypernetwork head: linear layer emitting the full
                     ShapeNet weight vector, with SIREN-aware scaled init
                     (reference nif/layers/siren.py:423-538).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ShapeNetConfig, shapenet_segment_sizes
from .initializers import hyper_linear_init, siren_first_init, siren_hidden_init

__all__ = [
    "siren_init",
    "siren_apply",
    "siren_resnet_init",
    "siren_resnet_apply",
    "hyper_linear_init_params",
    "hyper_linear_apply",
]


def siren_init(key, fan_in, fan_out, layer_position, omega_0, dtype=jnp.float32):
    if layer_position == "first":
        w, b = siren_first_init(key, fan_in, fan_out, dtype)
    elif layer_position in ("hidden", "bottleneck"):
        w, b = siren_hidden_init(key, fan_in, fan_out, omega_0, dtype)
    else:
        raise ValueError(f"unsupported SIREN layer_position {layer_position!r}")
    return {"w": w, "b": b}


def siren_apply(params, x, omega_0, layer_position):
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    if layer_position == "bottleneck":
        # Linear — matches reference nif/layers/siren.py:271-274.
        return x @ w + b
    return jnp.sin(jnp.asarray(omega_0, x.dtype) * (x @ w) + b)


def siren_resnet_init(key, width, omega_0, dtype=jnp.float32):
    # The reference ties the second matmul's init to the first: SIREN_ResNet
    # builds w2/b2 from the SAME w_init/b_init tensors as w/b (reference
    # nif/layers/siren.py:370-379), so every resblock starts with w2 == w
    # and b2 == b exactly. Init parity (joint, not just marginal) is what
    # makes seeded convergence trajectories comparable.
    p1 = siren_init(key, width, width, "hidden", omega_0, dtype)
    return {"w": p1["w"], "b": p1["b"], "w2": p1["w"], "b2": p1["b"]}


def siren_resnet_apply(params, x, omega_0):
    om = jnp.asarray(omega_0, x.dtype)
    h = jnp.sin(om * (x @ params["w"].astype(x.dtype)) + params["b"].astype(x.dtype))
    y = jnp.sin(om * (h @ params["w2"].astype(x.dtype)) + params["b2"].astype(x.dtype))
    return 0.5 * (x + y)


def hyper_linear_init_params(
    key, fan_in: int, fan_out: int, cfg_shape: ShapeNetConfig, dtype=jnp.float32
):
    """Init the hypernetwork head for a given ShapeNet config.

    For connectivity='last_layer' the whole output is treated as the
    last-layer weight segment (reference nif/layers/siren.py:485-488).
    """
    if cfg_shape.connectivity == "full":
        nw_first, nw_hidden, nw_last, _ = shapenet_segment_sizes(cfg_shape)
    elif cfg_shape.connectivity == "last_layer":
        nw_first, nw_hidden, nw_last = 0, 0, fan_out
    else:
        raise ValueError(f"bad connectivity {cfg_shape.connectivity!r}")
    w, b = hyper_linear_init(
        key,
        fan_in,
        fan_out,
        weight_factor=cfg_shape.weight_init_factor,
        num_weight_first=nw_first,
        num_weight_hidden=nw_hidden,
        num_weight_last=nw_last,
        input_dim=cfg_shape.input_dim,
        width=cfg_shape.units,
        omega_0=cfg_shape.omega_0,
        dtype=dtype,
    )
    return {"w": w, "b": b}


def hyper_linear_apply(params, x):
    return x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)
