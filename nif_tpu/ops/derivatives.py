"""Input-output derivatives and Sobolev training.

Replaces the reference's tape-based wrapper layers (reference
nif/layers/gradient.py: ``JacobianLayer`` :4-49, ``HessianLayer`` :130-180,
``JacRegLatentLayer`` :52-127) with forward-mode compositions. NIF inputs
are tiny (a handful of coordinates/parameters per point), so ``jacfwd`` is
the right mode: one JVP per input column instead of one VJP per output —
and unlike ``tf.GradientTape.batch_jacobian`` it fuses into the same XLA
program as the forward pass.

All functions take a *batched* function ``fn: [B, d_in] -> [B, d_out]``
(e.g. ``lambda inp: model.apply(params, inp)``) and compute per-sample
derivatives with ``vmap``.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "output_and_jacobian",
    "output_jacobian_hessian",
    "jacobian_regularization",
    "sobolev_loss",
]

Index = Union[int, Sequence[int], None]


def _as_index_array(idx: Index, dim: int):
    if idx is None:
        return jnp.arange(dim)
    return jnp.atleast_1d(jnp.asarray(idx))


def output_and_jacobian(
    fn: Callable,
    inputs: jnp.ndarray,
    y_index: Index = None,
    x_index: Index = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample (y, dy/dx): the ``JacobianLayer`` equivalent.

    Args:
      fn: batched function ``[B, d_in] -> [B, d_out]``.
      inputs: ``[B, d_in]``.
      y_index/x_index: output rows / input columns of the Jacobian to keep
        (reference JacobianLayer semantics, nif/layers/gradient.py:207-231).

    Returns:
      ``y [B, d_out]`` and ``jac [B, |y_index|, |x_index|]``.
    """

    def single(row):
        f = lambda r: fn(r[None, :])[0]
        return f(row), jax.jacfwd(f)(row)

    y, jac = jax.vmap(single)(inputs)
    yi = _as_index_array(y_index, jac.shape[-2])
    xi = _as_index_array(x_index, jac.shape[-1])
    return y, jac[:, yi][..., xi]


def output_jacobian_hessian(
    fn: Callable,
    inputs: jnp.ndarray,
    y_index: Index = None,
    x_index: Index = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample (y, dy/dx, d2y/dx2): the ``HessianLayer`` equivalent
    (reference nif/layers/gradient.py:234-261), via nested forward-mode.

    Returns ``y [B, d_out]``, ``jac [B, |yi|, |xi|]``,
    ``hess [B, |yi|, |xi|, |xi|]``.
    """

    def single(row):
        f = lambda r: fn(r[None, :])[0]
        return f(row), jax.jacfwd(f)(row), jax.jacfwd(jax.jacfwd(f))(row)

    y, jac, hess = jax.vmap(single)(inputs)
    yi = _as_index_array(y_index, jac.shape[-2])
    xi = _as_index_array(x_index, jac.shape[-1])
    return y, jac[:, yi][..., xi], hess[:, yi][:, :, xi][..., xi]


def jacobian_regularization(
    fn: Callable, inputs: jnp.ndarray, l1: float, y_index: Index = None,
    x_index: Index = None,
) -> jnp.ndarray:
    """``l1 * mean((d fn / d x)^2)`` — the ``JacRegLatentLayer`` penalty
    (reference nif/layers/gradient.py:107-112)."""
    _, jac = output_and_jacobian(fn, inputs, y_index, x_index)
    return l1 * jnp.mean(jnp.square(jac))


def sobolev_loss(
    fn: Callable,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    target_jac: Optional[jnp.ndarray] = None,
    target_hess: Optional[jnp.ndarray] = None,
    w_value: float = 1.0,
    w_jac: float = 1.0,
    w_hess: float = 1.0,
    y_index: Index = None,
    x_index: Index = None,
):
    """Sobolev training loss (tutorial 8): match values and derivatives.

    Returns ``(total, terms_dict)`` where ``terms_dict`` holds the separate
    value/jacobian/hessian MSEs — the reference monitors these with custom
    Keras metrics (reference README.md:233); returning them as a dict is the
    functional equivalent.
    """
    terms = {}
    if target_hess is not None:
        y, jac, hess = output_jacobian_hessian(fn, inputs, y_index, x_index)
        terms["hessian_mse"] = jnp.mean(jnp.square(hess - target_hess))
    else:
        y, jac = output_and_jacobian(fn, inputs, y_index, x_index)
    # The value term accepts targets for the FULL output or, with y_index
    # set, for just the selected columns; anything else raises. A silent
    # broadcast (e.g. y [B,2] vs targets [B,1]) would otherwise return a
    # plausible-looking wrong loss.
    tshape = jnp.shape(targets)
    if tshape == y.shape:
        y_val = y
    elif y_index is not None:
        y_val = y[:, _as_index_array(y_index, y.shape[-1])]
        if y_val.shape != tshape:
            raise ValueError(
                f"sobolev_loss: value targets shape {tshape} matches "
                f"neither the full output {y.shape} nor the "
                f"y_index-selected output {y_val.shape}"
            )
    else:
        raise ValueError(
            f"sobolev_loss: value targets shape {tshape} does not match "
            f"the output shape {y.shape}"
        )
    terms["value_mse"] = jnp.mean(jnp.square(y_val - targets))
    if target_jac is not None:
        terms["jacobian_mse"] = jnp.mean(jnp.square(jac - target_jac))
    total = w_value * terms["value_mse"]
    if "jacobian_mse" in terms:
        total = total + w_jac * terms["jacobian_mse"]
    if "hessian_mse" in terms:
        total = total + w_hess * terms["hessian_mse"]
    return total, terms
