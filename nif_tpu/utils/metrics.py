"""Evaluation metrics.

``rel_l2`` is the north-star accuracy metric for NIF workflows (BASELINE.md:
rel-L2 field error < 1e-3): the relative L2 norm of the reconstruction error
over the whole field.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rel_l2", "mse", "rmse"]


def rel_l2(pred, target, axis=None) -> jnp.ndarray:
    """||pred - target||_2 / ||target||_2 (over everything by default).

    Computed in (at least) float32 regardless of input dtypes: the accuracy
    bar (rel-L2 < 1e-3) sits below bf16 resolution, so downcasting the
    target to a bf16 pred's dtype would measure quantization, not error.
    """
    pred = jnp.asarray(pred)
    dt = jnp.promote_types(
        jnp.promote_types(pred.dtype, jnp.asarray(target).dtype), jnp.float32
    )
    pred = pred.astype(dt)
    target = jnp.asarray(target, dt)
    num = jnp.sqrt(jnp.sum(jnp.square(pred - target), axis=axis))
    den = jnp.sqrt(jnp.sum(jnp.square(target), axis=axis))
    return num / jnp.maximum(den, jnp.finfo(dt).tiny)


def mse(pred, target) -> jnp.ndarray:
    return jnp.mean(jnp.square(jnp.asarray(pred) - jnp.asarray(target)))


def rmse(pred, target) -> jnp.ndarray:
    return jnp.sqrt(mse(pred, target))
