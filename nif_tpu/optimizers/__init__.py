"""Optimizers.

Feature parity with the reference ``nif/optimizers`` package, rebuilt on
optax:

* ``adam``                      — standard Adam (what the tutorials use).
* ``adabelief``                 — AdaBelief with the reference's linear
  warmup + decay schedule knobs (reference
  nif/optimizers/external_optimizers.py:321-628).
* ``lion``                      — sign-momentum Lion (reference :631-735).
* ``LBFGS`` / ``lbfgs_minimize`` — full-batch fine-tuning (reference
  nif/optimizers/lbfgs.py, lbfgs_V2.py).
* ``centralize_gradients``      — Gradient Centralization as an optax
  transform (reference nif/optimizers/gtcf.py — which is dead TF1 code;
  this one actually works).

The reference's ``L4Adam`` is intentionally NOT ported: it is unfinished and
assigns ``None`` into variables (reference external_optimizers.py:149-155).
"""
from __future__ import annotations

from typing import Optional

import optax

from .adabelief import adabelief_full, scale_by_belief
from .lbfgs import LBFGS, GroupedLBFGS, lbfgs_minimize

__all__ = [
    "adam",
    "adabelief_full",
    "scale_by_belief",
    "adabelief",
    "lion",
    "LBFGS",
    "GroupedLBFGS",
    "lbfgs_minimize",
    "centralize_gradients",
    "warmup_linear_decay",
    "get_optimizer",
]


def warmup_linear_decay(
    peak_lr: float,
    total_steps: int,
    warmup_proportion: float = 0.1,
    min_lr: float = 0.0,
):
    """Linear warmup to ``peak_lr`` then linear decay to ``min_lr`` — the
    schedule baked into the reference's AdaBelief (``total_steps`` /
    ``warmup_proportion`` / ``min_lr`` knobs, reference
    external_optimizers.py:408-427)."""
    warmup = max(1, int(total_steps * warmup_proportion))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, warmup),
            optax.linear_schedule(peak_lr, min_lr, max(1, total_steps - warmup)),
        ],
        boundaries=[warmup],
    )


def adam(learning_rate=1e-3, **kw) -> optax.GradientTransformation:
    return optax.adam(learning_rate, **kw)


def adabelief(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-14,
    weight_decay: float = 0.0,
    total_steps: int = 0,
    warmup_proportion: float = 0.1,
    min_lr: float = 0.0,
) -> optax.GradientTransformation:
    """AdaBelief; pass total_steps>0 to enable the reference's warmup+decay."""
    lr = learning_rate
    if total_steps and total_steps > 0:
        lr = warmup_linear_decay(learning_rate, total_steps, warmup_proportion, min_lr)
    if weight_decay:
        # Decoupled (AdamW-style) decay, matching the reference and
        # adabelief_full: the decay term bypasses the belief moments, so it
        # must sit AFTER the scaling, before the learning rate.
        return optax.chain(
            optax.scale_by_belief(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    return optax.adabelief(lr, b1=b1, b2=b2, eps=eps)


def lion(
    learning_rate: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.99,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    return optax.lion(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)


def centralize_gradients() -> optax.GradientTransformation:
    """Gradient Centralization (Yong et al., 2020): subtract the per-tensor
    mean over all axes but the last from every gradient with rank > 1.
    Chain before the optimizer: ``optax.chain(centralize_gradients(),
    optax.adam(...))``."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def center(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - g.mean(axis=axes, keepdims=True)
            return g

        import jax

        return jax.tree_util.tree_map(center, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(name: str, learning_rate: float = 1e-3, **kw):
    name = name.lower()
    if name == "adam":
        return adam(learning_rate, **kw)
    if name == "adabelief":
        return adabelief(learning_rate, **kw)
    if name == "lion":
        return lion(learning_rate, **kw)
    raise ValueError(f"unknown optimizer {name!r}")
