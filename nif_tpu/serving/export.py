"""Inference serving: batched predict and ahead-of-time export.

The reference has no serving story beyond ``model.predict`` inside Keras.
Here:

* ``predict``       — device-batched inference over arbitrarily many points
  with automatic padding to a fixed batch (one compiled executable, no
  recompiles for ragged final batches).
* ``export_apply``  — serialize the jitted apply (params baked in or as an
  argument) with ``jax.export`` to a portable StableHLO artifact that can
  be reloaded and run without the model-building Python code.
* ``load_exported`` — reload and call.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["predict", "export_apply", "load_exported"]


def predict(
    model,
    params,
    inputs: np.ndarray,
    batch_size: int = 65536,
) -> np.ndarray:
    """Run point-wise inference over any number of points.

    Pads the final batch so only ONE executable is compiled regardless of
    ``len(inputs)``.
    """
    inputs = np.asarray(inputs)
    n = inputs.shape[0]
    batch_size = min(batch_size, max(n, 1))
    fn = jax.jit(model.apply)
    outs = []
    for s in range(0, n, batch_size):
        chunk = inputs[s : s + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.broadcast_to(chunk[-1:], (pad,) + chunk.shape[1:])]
            )
        out = np.asarray(fn(params, jnp.asarray(chunk)))
        outs.append(out[: batch_size - pad])
    if outs:
        return np.concatenate(outs)
    # Empty input keeps the (0, so_dim) shape/dtype every non-empty call
    # returns, so downstream reshape/concatenate over shards never hits an
    # empty-shard special case.
    return np.zeros((0, model.so_dim), np.dtype(model.policy.param_dtype))


def export_apply(
    model,
    params,
    batch_size: int,
    path: Optional[str] = None,
    platforms=None,
) -> bytes:
    """Serialize ``model.apply`` with baked-in params to StableHLO.

    The artifact depends only on jax for execution (no nif_tpu needed at
    load time). ``batch_size`` fixes the compiled input shape — pair with
    :func:`predict`-style padding at serve time.
    """
    d_in = model.pi_dim + model.si_dim

    def serve_fn(inputs):
        return model.apply(params, inputs)

    exported = jax.export.export(
        jax.jit(serve_fn),
        platforms=platforms,
    )(jax.ShapeDtypeStruct((batch_size, d_in), jnp.float32))
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class _LoadedModel:
    def __init__(self, exported):
        self._exported = exported
        self._call = jax.jit(exported.call)

    def __call__(self, inputs):
        return self._call(jnp.asarray(inputs, jnp.float32))

    @property
    def in_avals(self):
        return self._exported.in_avals


def load_exported(path_or_bytes) -> _LoadedModel:
    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    else:
        blob = path_or_bytes
    return _LoadedModel(jax.export.deserialize(blob))
