"""Magnitude pruning.

The reference integrates tfmot low-magnitude pruning: every custom layer
implements ``PrunableLayer.get_prunable_weights`` and tutorial 7 prunes the
ParameterNet (reference nif/layers/siren.py:298-304, README.md:228-230).
The functional equivalent: compute a 0/1 mask pytree from parameter
magnitudes and either (a) apply it once post-training, or (b) enforce it
during training with the ``MagnitudePruning`` optax wrapper (gradual
sparsity ramp, reapplied every step — the tfmot PolynomialDecay schedule
analog).

By convention only rank>=2 tensors ("kernels") are pruned; biases are left
dense, matching ``get_prunable_weights`` returning ``[self.w]``.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["prune_by_magnitude", "apply_mask", "sparsity", "MagnitudePruning"]


def _prunable(p: jnp.ndarray) -> bool:
    return p.ndim >= 2


def prune_by_magnitude(params: Any, target_sparsity: float) -> Any:
    """Return a 0/1 mask pytree keeping the largest-|w| entries per tensor."""

    def mask_of(p):
        if not _prunable(p):
            return jnp.ones_like(p)
        k = int(round(p.size * (1.0 - target_sparsity)))
        if k <= 0:
            return jnp.zeros_like(p)
        thresh = jnp.sort(jnp.abs(p).ravel())[-k]
        return (jnp.abs(p) >= thresh).astype(p.dtype)

    return jax.tree_util.tree_map(mask_of, params)


def apply_mask(params: Any, mask: Any) -> Any:
    return jax.tree_util.tree_map(lambda p, m: p * m, params, mask)


def sparsity(params: Any, prunable_only: bool = True) -> float:
    """Fraction of exactly-zero entries (over prunable tensors by default)."""
    leaves = jax.tree_util.tree_leaves(params)
    if prunable_only:
        leaves = [p for p in leaves if _prunable(p)]
    total = sum(p.size for p in leaves)
    zeros = sum(int(jnp.sum(p == 0)) for p in leaves)
    return zeros / max(total, 1)


class PruningState(NamedTuple):
    inner: Any
    step: jnp.ndarray
    mask: Any


def MagnitudePruning(
    inner: optax.GradientTransformation,
    final_sparsity: float,
    begin_step: int = 0,
    end_step: int = 1000,
    update_every: int = 100,
) -> optax.GradientTransformation:
    """Wrap an optimizer with a gradual magnitude-pruning schedule.

    Sparsity ramps cubically from 0 to ``final_sparsity`` between
    ``begin_step`` and ``end_step`` (tfmot ``PolynomialDecay`` semantics).
    The mask is recomputed (a full |w| sort per prunable tensor) only every
    ``update_every`` steps and HELD FIXED in between — tfmot semantics, and
    it keeps the O(n log n) sort off the hot path; every step still
    projects the updated params onto the current mask.
    """

    def schedule(step):
        t = jnp.clip((step - begin_step) / max(end_step - begin_step, 1), 0.0, 1.0)
        return final_sparsity * (1.0 - (1.0 - t) ** 3)

    def fresh_mask(params, s):
        def mask_of(p):
            if not _prunable(p):
                return jnp.ones((), jnp.bool_)  # placeholder leaf, unused
            k = jnp.maximum((p.size * (1.0 - s)).astype(jnp.int32), 1)
            absval = jnp.abs(p).ravel()
            thresh = jnp.sort(absval)[absval.size - k]
            return jnp.abs(p) >= thresh

        return jax.tree_util.tree_map(mask_of, params)

    def init_fn(params):
        ones = jax.tree_util.tree_map(
            lambda p: (jnp.ones(p.shape, jnp.bool_) if _prunable(p)
                       else jnp.ones((), jnp.bool_)),
            params,
        )
        return PruningState(inner.init(params), jnp.zeros((), jnp.int32), ones)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("MagnitudePruning requires params in update()")
        updates, inner_state = inner.update(updates, state.inner, params)
        step = state.step + 1
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        # Recompute on the update_every cadence while inside the ramp, AND
        # at end_step (tfmot always prunes at the ramp's end so
        # final_sparsity is reached even when the cadence overshoots a
        # short ramp). After end_step the mask FREEZES — continuing to
        # re-derive it at final sparsity would churn the pattern forever
        # (weights resurrecting/dying each cadence), which is what tfmot's
        # [begin, end] window prevents.
        recompute = (
            (step % update_every == 1) | (update_every <= 1)
            | (step == end_step) | (step == begin_step + 1)
        ) & (step <= end_step) & (step > begin_step)
        mask = jax.lax.cond(
            recompute,
            lambda: fresh_mask(new_params, schedule(step)),
            lambda: state.mask,
        )

        def project(u, p, m):
            if not _prunable(p):
                return u
            return (p + u) * m.astype(p.dtype) - p  # update landing on mask

        updates = jax.tree_util.tree_map(project, updates, params, mask)
        return updates, PruningState(inner_state, step, mask)

    return optax.GradientTransformation(init_fn, update_fn)
