"""AdaBelief with the reference's full feature set.

The reference vendors AdaBelief (reference nif/optimizers/
external_optimizers.py:321-628) with: belief variance ``s_t = var(g - m)``,
RAdam-style rectification (``sma_t`` gate), optional AMSGrad, linear
warmup + decay via ``total_steps / warmup_proportion / min_lr``, and
decoupled weight decay. ``optax.adabelief`` covers only the core, so the
rectified/amsgrad variants are implemented here as a first-class optax
transformation.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["adabelief_full", "scale_by_belief"]


class BeliefState(NamedTuple):
    count: jnp.ndarray
    m: Any
    s: Any
    s_max: Any


def scale_by_belief(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-14,
    rectify: bool = True,
    amsgrad: bool = False,
    sma_threshold: float = 5.0,
    degenerated_to_sgd: bool = True,
) -> optax.GradientTransformation:
    """Core AdaBelief scaling (reference external_optimizers.py:520-608).

    With ``rectify`` the step uses the RAdam variance-rectification term
    ``r_t`` when the simple-moving-average length ``sma_t`` exceeds
    ``sma_threshold``; below it, takes an SGD-with-momentum step if
    ``degenerated_to_sgd`` else zero.
    """

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        # s_max only exists under amsgrad — a None subtree otherwise, so
        # the state doesn't carry (and donate/replicate) a dead
        # params-sized buffer every step.
        return BeliefState(
            jnp.zeros((), jnp.int32), zeros(), zeros(),
            zeros() if amsgrad else None,
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state.m, updates
        )
        s = jax.tree_util.tree_map(
            lambda ss, mm, g: b2 * ss + (1 - b2) * jnp.square(g - mm) + eps,
            state.s,
            m,
            updates,
        )
        s_used = s
        s_max = state.s_max
        if amsgrad:
            s_max = jax.tree_util.tree_map(jnp.maximum, state.s_max, s)
            s_used = s_max

        bc1 = 1 - b1**t
        bc2 = 1 - b2**t

        if not rectify:
            new_updates = jax.tree_util.tree_map(
                lambda mm, ss: (mm / bc1) / (jnp.sqrt(ss / bc2) + eps),
                m,
                s_used,
            )
        else:
            sma_inf = 2.0 / (1 - b2) - 1.0
            sma_t = sma_inf - 2.0 * t * (b2**t) / bc2
            r_t = jnp.sqrt(
                jnp.clip(
                    (sma_t - 4.0)
                    / jnp.maximum(sma_inf - 4.0, 1e-9)
                    * (sma_t - 2.0)
                    / jnp.maximum(sma_inf - 2.0, 1e-9)
                    * sma_inf
                    / jnp.maximum(sma_t, 1e-9),
                    0.0,
                )
            )
            use_adaptive = sma_t >= sma_threshold
            sgd_scale = 1.0 if degenerated_to_sgd else 0.0

            def upd(mm, ss):
                adaptive = r_t * (mm / bc1) / (jnp.sqrt(ss / bc2) + eps)
                sgd = sgd_scale * (mm / bc1)
                return jnp.where(use_adaptive, adaptive, sgd)

            new_updates = jax.tree_util.tree_map(upd, m, s_used)
        return new_updates, BeliefState(count, m, s, s_max)

    return optax.GradientTransformation(init_fn, update_fn)


def adabelief_full(
    learning_rate=1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-14,
    weight_decay: float = 0.0,
    rectify: bool = True,
    amsgrad: bool = False,
    sma_threshold: float = 5.0,
    degenerated_to_sgd: bool = True,
    total_steps: int = 0,
    warmup_proportion: float = 0.1,
    min_lr: float = 0.0,
) -> optax.GradientTransformation:
    """Drop-in replacement for the reference ``AdaBeliefOptimizer``."""
    from . import warmup_linear_decay

    lr = learning_rate
    if total_steps and total_steps > 0:
        lr = warmup_linear_decay(learning_rate, total_steps, warmup_proportion, min_lr)
    chain = [
        scale_by_belief(
            b1, b2, eps, rectify, amsgrad, sma_threshold, degenerated_to_sgd
        )
    ]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(
        optax.scale_by_learning_rate(lr)
    )
    return optax.chain(*chain)
