"""Device-mesh data parallelism.

The reference's only parallelism is user-side
``tf.distribute.MirroredStrategy`` data parallelism (reference
README.md:42-52); every coordinate point is independent, so NIF training is
embarrassingly parallel over the point axis. Here that becomes a
``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis and
parameters replicated: XLA inserts the gradient ``psum`` over ICI
automatically when the jitted train step reduces the loss.

Axes beyond ``data`` are supported for scale-out of huge hypernetwork
heads (row-parallel split of the latent contracting dim) via a ``model``
axis — see ``__graft_entry__.dryrun_multichip`` for the full recipe — and
multi-slice deployments get a leading DCN ``replica`` axis from
:func:`make_hybrid_mesh`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "batch_sharding",
    "batch_axis_size",
    "replicated_sharding",
    "model_axis_specs",
    "put_params_model_parallel",
    "shard_batch",
    "pad_to_multiple",
    "init_distributed",
    "put_batch",
    "put_replicated",
]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> int:
    """Multi-host bootstrap: ``jax.distributed.initialize`` + sanity report.

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU clusters pass them explicitly. Idempotent (re-initialization is
    a no-op). Returns ``jax.process_index()``. The reference has no
    multi-host story at all (its ceiling is single-node MirroredStrategy,
    reference README.md:42-52); this is the pod-scale axis of the rebuild:
    call this first, then build a :func:`make_mesh`/:func:`make_hybrid_mesh`
    over the now-global ``jax.devices()``.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def put_batch(arr, mesh: Mesh, axis=None):
    """Place one batch array onto the mesh, sharded over the batch axes.

    Single-process: a plain ``device_put``. Multi-process: ``arr`` is this
    process's LOCAL shard and the global array is assembled from every
    process's contribution (``jax.make_array_from_process_local_data``) —
    the global batch dim is ``local_dim * num_processes``.
    """
    sh = batch_sharding(mesh, axis)
    if not isinstance(arr, (jax.Array, np.ndarray)):
        # lists/tuples: device_put would treat them as pytrees of scalars
        arr = np.asarray(arr)
    if jax.process_count() == 1:
        # device_put is a no-op on an already-placed array (and a
        # device-side reshard otherwise) — prefetched batches must not
        # round-trip through the host
        return jax.device_put(arr, sh)
    if isinstance(arr, jax.Array) and arr.sharding == sh:
        return arr
    return jax.make_array_from_process_local_data(sh, np.asarray(arr))


def put_batch_tuple(arrays, mesh: Optional[Mesh]):
    """None-preserving batch placement for a tuple of arrays: each shards
    dim 0 over the batch axes (plain device arrays without a mesh). The
    shared helper behind both trainers' batch staging."""
    if mesh is None:
        import jax.numpy as jnp

        return tuple(None if a is None else jnp.asarray(a) for a in arrays)
    return tuple(
        None if a is None else put_batch(a, mesh) for a in arrays
    )


def put_global(leaf, sharding):
    """Place ONE host array that every process holds identically (same
    seed / deterministic init) under an arbitrary sharding — process-safe.

    Single-controller: plain ``device_put``. Multi-controller: passes the
    full array as process-local data WITH ``global_shape=leaf.shape`` so
    each device slices its own shard out of the local copy — required for
    specs whose sharded axis spans processes (omitting global_shape would
    make JAX infer a global dim of ``local * n_processes`` and concatenate
    the copies)."""
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    a = np.asarray(leaf)
    return jax.make_array_from_process_local_data(sharding, a, a.shape)


def put_replicated(tree, mesh: Mesh):
    """Replicate a pytree onto the mesh (multi-process safe: each process
    must hold the same values, e.g. from an identical PRNG seed)."""
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    return jax.tree_util.tree_map(lambda a: put_global(a, sh), tree)


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


def make_hybrid_mesh(
    ici_axes: Sequence[str] = ("data",),
    ici_shape: Optional[Sequence[int]] = None,
    dcn_axis: str = "replica",
    num_slices: Optional[int] = None,
) -> Mesh:
    """Multi-slice mesh: a DCN ('replica') axis across slices and ICI axes
    within each slice.

    Shardings that only touch ICI axes keep their collectives on the
    fast intra-slice interconnect; putting pure data parallelism on the
    ``dcn_axis`` means only the gradient all-reduce crosses DCN — the
    standard multi-slice recipe. Falls back to a flat mesh when the
    runtime reports a single slice (or no slice info, e.g. CPU).
    """
    devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    n_slices = num_slices or len(slice_ids)
    if n_slices <= 1:
        mesh = make_mesh(axis_names=tuple(ici_axes), mesh_shape=ici_shape)
        # Present a degenerate replica axis so sharding specs are portable.
        dev = mesh.devices.reshape((1,) + mesh.devices.shape)
        return Mesh(dev, (dcn_axis,) + tuple(ici_axes))
    from jax.experimental import mesh_utils

    per_slice = len(devices) // n_slices
    if ici_shape is None:
        ici_shape = (per_slice,) + (1,) * (len(ici_axes) - 1)
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=tuple(ici_shape),
        dcn_mesh_shape=(n_slices,) + (1,) * (len(ici_axes) - 1),
        devices=devices,
    )
    # hybrid mesh returns shape (n_slices*ici...)—reshape to lead with DCN
    dev_array = np.asarray(dev_array).reshape((n_slices,) + tuple(ici_shape))
    return Mesh(dev_array, (dcn_axis,) + tuple(ici_axes))


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes a [B, ...] batch shards over: every axis named
    'replica' or 'data' that is present (hybrid meshes shard across
    DCN x ICI jointly), else the first axis (arbitrary-named 1-D meshes).

    The ONE source of truth — sharding specs, divisibility checks, and the
    trainers' pmean reductions must all use the same axis set, or a batch
    can end up sharded over an axis the gradients are never reduced over.
    """
    axes = tuple(a for a in mesh.axis_names if a in ("replica", "data"))
    return axes if axes else tuple(mesh.axis_names[:1])


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Sharding for a [B, ...] batch: split dim 0 over :func:`batch_axes`."""
    if axis is None:
        axis = batch_axes(mesh)
    return NamedSharding(mesh, P(axis))


def batch_axis_size(mesh: Mesh) -> int:
    """Total device count along the batch-sharded axes — the divisibility
    requirement for dim 0 of anything placed with :func:`batch_sharding`."""
    size = 1
    for a in batch_axes(mesh):
        size *= mesh.shape[a]
    return size


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_axis_specs(params, mesh: Mesh, axis: str = "model"):
    """PartitionSpec pytree for tensor-parallel parameter placement.

    The hypernetwork head kernel (``pnet.last.w``, shape
    ``[latent_dim, po_dim]``) is the one parameter that can get huge —
    po_dim scales with the ShapeNet's units^2 (SURVEY.md section 2.6). It
    splits row-parallel: the *contracting* latent dim shards over
    ``axis`` and XLA inserts the partial-sum reduce after the head
    matmul (po_dim is usually odd, so the output column cannot divide
    evenly). Everything else replicates. Leaves whose contracting dim
    does not divide the axis stay replicated rather than erroring.
    """
    n_model = mesh.shape.get(axis, 1)

    def spec_for(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)
        if (
            n_model > 1
            and "last" in keys
            and keys[-1] == "w"
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[0] % n_model == 0
        ):
            return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def moment_follows_head(leaf, head_shape, n_model: int) -> bool:
    """True when ``leaf`` is an optimizer moment of the tensor-parallel
    hypernetwork head kernel: same 2-D shape and a contracting dim that
    divides the model axis. The single source of truth for 'which
    opt-state leaves shard P('model', None)' — both trainers consult it
    so their placements cannot diverge."""
    return (
        head_shape is not None
        and n_model > 1
        and getattr(leaf, "ndim", 0) == 2
        and tuple(leaf.shape) == tuple(head_shape)
        and leaf.shape[0] % n_model == 0
    )


def put_params_model_parallel(params, mesh: Mesh, axis: str = "model"):
    """Place a params pytree with the head kernel sharded over ``axis``
    (see :func:`model_axis_specs`); everything else replicated.
    Multi-process safe for model axes that span processes
    (:func:`put_global` semantics)."""
    specs = model_axis_specs(params, mesh, axis)
    return jax.tree_util.tree_map(
        lambda leaf, spec: put_global(leaf, NamedSharding(mesh, spec)),
        params, specs,
    )


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


def shard_batch(batch, mesh: Mesh, axis=None):
    """Device-put a pytree of [B, ...] arrays sharded over the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
