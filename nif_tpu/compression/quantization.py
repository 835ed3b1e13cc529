"""Post-training quantization.

Tutorial 7 of the reference quantizes the ParameterNet with tfmot
(reference README.md:228-230). Here: symmetric per-tensor int8 PTQ of the
kernel tensors — each rank>=2 tensor is stored as int8 values + one f32
scale; biases stay f32. ``dequantize_params`` reconstructs a params pytree
usable by any ``apply`` function, and models can run directly off the
dequantized weights (XLA folds the rescale into the matmul).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantize_params", "dequantize_params", "quantized_size_bytes"]


def _quantizable(p: jnp.ndarray) -> bool:
    return p.ndim >= 2 and jnp.issubdtype(p.dtype, jnp.floating)


def quantize_params(params: Any) -> Any:
    """Quantize kernels to int8: each leaf becomes either the original array
    (biases / small tensors) or a dict {"q": int8, "scale": f32}."""

    def q(p):
        if not _quantizable(p):
            return p
        scale = jnp.max(jnp.abs(p)) / 127.0
        scale = jnp.where(scale == 0, 1.0, scale)
        return {
            "q": jnp.clip(jnp.round(p / scale), -127, 127).astype(jnp.int8),
            "scale": scale.astype(jnp.float32),
        }

    return jax.tree_util.tree_map(q, params)


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def dequantize_params(qparams: Any, dtype=jnp.float32) -> Any:
    def dq(x):
        if _is_qleaf(x):
            return (x["q"].astype(dtype) * x["scale"].astype(dtype))
        return x

    return jax.tree_util.tree_map(dq, qparams, is_leaf=_is_qleaf)


def quantized_size_bytes(qparams: Any) -> Tuple[int, int]:
    """(quantized_bytes, float_equivalent_bytes) for compression reporting."""
    qbytes = 0
    fbytes = 0

    def visit(x):
        nonlocal qbytes, fbytes
        if _is_qleaf(x):
            qbytes += x["q"].size + 4
            fbytes += x["q"].size * 4
        else:
            qbytes += x.size * x.dtype.itemsize
            fbytes += x.size * 4

    jax.tree_util.tree_map(visit, qparams, is_leaf=_is_qleaf)
    return qbytes, fbytes
