"""Global (mesh / multi-host) evaluation helpers.

The north-star metric (rel-L2, BASELINE.md) must be computable at pod
scale, where the dataset is striped across hosts (round-2 review: the
trainers' evaluators were host-local and the multihost worker reported
only the final step loss). The recipe:

* each host accumulates LOCAL error/target sums — coordinate points are
  independent, so evaluation needs no collectives until the final scalar
  reduction;
* :func:`global_sums` reduces the per-host partial sums with
  ``multihost_utils.process_allgather`` (a single tiny all-gather over
  DCN), giving every process the identical global metric;
* single-process meshes instead shard the eval batch over the mesh inside
  one jit — XLA inserts the cross-device psum for the ``jnp.sum``.

No reference equivalent: the reference's ceiling is single-node
``MirroredStrategy`` and its metrics are whatever ``model.evaluate``
prints (reference README.md:42-52).
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

__all__ = ["global_sums", "local_params", "metrics_from_sums"]


def global_sums(*partials: float) -> Tuple[float, ...]:
    """Sum scalar partial sums across every JAX process.

    Single-process: identity. Multi-process: one
    ``process_allgather`` of the stacked scalars (every process must
    call this the same number of times — it is a collective).
    """
    if jax.process_count() == 1:
        return tuple(float(p) for p in partials)
    from jax.experimental import multihost_utils

    stacked = np.asarray([float(p) for p in partials], np.float64)
    gathered = multihost_utils.process_allgather(stacked)
    return tuple(float(v) for v in np.sum(gathered, axis=0))


def metrics_from_sums(sse: float, sst: float, n_el: float) -> dict:
    """MSE and rel-L2 from (globally reduced) squared-error/target sums."""
    return {
        "mse": sse / max(n_el, 1.0),
        "rel_l2": float(np.sqrt(sse / max(sst, 1e-300))),
    }


def local_params(params):
    """Host-local view of a (possibly multi-host global) params pytree.

    Multi-controller runs hold params as non-fully-addressable global
    arrays; feeding those into a host-local eval jit alongside per-host
    numpy batches is an error. The full value is reassembled from the
    ADDRESSABLE shards at their indices — correct for replicated arrays
    AND for tensor-parallel-sharded leaves (e.g. the hypernetwork head
    under ``shard_model_axis``, whose first shard is only 1/n_model of
    the kernel — taking ``addressable_shards[0]`` alone silently
    evaluated with a truncated model; round-4 multi-host TP test).
    Leaves whose sharded axis spans processes are completed with one
    host allgather. Single-process (and plain numpy leaves): identity.
    """
    def to_local(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            out = np.zeros(a.shape, a.dtype)
            seen = np.zeros(a.shape, bool)
            for s in a.addressable_shards:
                out[s.index] = np.asarray(s.data)
                seen[s.index] = True
            if not seen.all():
                # sharded axis spans processes: merge every process's
                # addressable pieces (tiny — params, not data)
                from jax.experimental import multihost_utils

                outs = multihost_utils.process_allgather(out)
                seens = multihost_utils.process_allgather(seen)
                for o, m in zip(outs, seens):
                    out[m] = o[m]
            return out
        return a

    return jax.tree_util.tree_map(to_local, params)
