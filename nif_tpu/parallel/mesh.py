"""Device-mesh data parallelism.

The reference's only parallelism is user-side
``tf.distribute.MirroredStrategy`` data parallelism (reference
README.md:42-52); every coordinate point is independent, so NIF training is
embarrassingly parallel over the point axis. Here that becomes a
``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis and
parameters replicated: XLA inserts the gradient ``psum`` over ICI
automatically when the jitted train step reduces the loss.

Axes beyond ``data`` are supported for scale-out of huge hypernet heads
(sharding the po_dim output column-wise — tensor parallelism) via the
``model`` axis; see ``hyper_head_sharding``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_to_multiple",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    mesh_shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-D mesh named 'data' over all devices. Pass
    ``axis_names=('data', 'model')`` and a ``mesh_shape`` to add tensor
    parallelism for very large hypernetwork heads.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a [B, ...] batch: split dim 0 over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad dim 0 up to a multiple (returns padded array and original length).

    Point batches must divide evenly across the mesh; padding with copies of
    the first row is safe for inference, and training uses sample weights to
    zero out pad rows.
    """
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = np.broadcast_to(arr[:1], (rem,) + arr.shape[1:])
    return np.concatenate([arr, pad], axis=0), n


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of [B, ...] arrays sharded over the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
