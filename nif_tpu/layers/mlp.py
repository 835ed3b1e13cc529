"""Functional MLP building blocks (init/apply pairs).

Pure-functional equivalents of the reference's Keras layers:

* dense            — ``keras.layers.Dense`` (reference nif/layers/__init__.py)
* mlp_shortcut     — ``MLP_SimpleShortCut``: ``x + Dense_act(x)``
                     (reference nif/layers/mlp.py:102-190)
* mlp_resnet       — ``MLP_ResNet``: ``act(x + Dense2(Dense1_act(x)))``
                     (reference nif/layers/mlp.py:5-99)

Params are plain dicts of jnp arrays; every ``apply`` is jit/vmap/grad-safe.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from .initializers import truncated_normal_init

__all__ = [
    "get_activation",
    "dense_init",
    "dense_apply",
    "mlp_shortcut_init",
    "mlp_shortcut_apply",
    "mlp_resnet_init",
    "mlp_resnet_apply",
]

_ACTIVATIONS: Dict[str, Callable] = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "softplus": jax.nn.softplus,
    "sine": jnp.sin,
}


def get_activation(name) -> Callable:
    if callable(name):
        return name
    if name is None:
        return _ACTIVATIONS["linear"]
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; expected one of {sorted(_ACTIVATIONS)}"
        ) from None


def dense_init(key, fan_in: int, fan_out: int, stddev: float = 0.1, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    return {
        "w": truncated_normal_init(kw, (fan_in, fan_out), stddev, dtype),
        "b": truncated_normal_init(kb, (fan_out,), stddev, dtype),
    }


def dense_apply(params, x, activation=None):
    y = x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)
    return get_activation(activation)(y) if activation is not None else y


def mlp_shortcut_init(key, width: int, dtype=jnp.float32):
    return {"dense": dense_init(key, width, width, dtype=dtype)}


def mlp_shortcut_apply(params, x, activation):
    return x + dense_apply(params["dense"], x, activation)


def mlp_resnet_init(key, width: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "dense1": dense_init(k1, width, width, dtype=dtype),
        "dense2": dense_init(k2, width, width, dtype=dtype),
    }


def mlp_resnet_apply(params, x, activation):
    h = dense_apply(params["dense1"], x, activation)
    h = dense_apply(params["dense2"], h)
    return get_activation(activation)(x + h)
