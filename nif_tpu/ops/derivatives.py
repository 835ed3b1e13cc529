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
    "output_and_jacobian_grouped",
    "output_jacobian_hessian_grouped",
    "sobolev_loss_grouped",
]

Index = Union[int, Sequence[int], None]


def _as_index_array(idx: Index, dim: int):
    if idx is None:
        return jnp.arange(dim)
    return jnp.atleast_1d(jnp.asarray(idx))


def _select_jac(jac, y_index: Index, x_index: Index):
    """Apply y_index/x_index subsetting to ``[..., d_out, d_in]`` — a no-op
    when both are None (an unconditional arange-gather costs real time on
    TPU for million-point Jacobians)."""
    if y_index is not None:
        jac = jac[..., _as_index_array(y_index, jac.shape[-2]), :]
    if x_index is not None:
        jac = jac[..., _as_index_array(x_index, jac.shape[-1])]
    return jac


def _select_hess(hess, y_index: Index, x_index: Index):
    """Same, for ``[..., d_out, d_in, d_in]`` Hessians (x_index applies to
    both trailing axes)."""
    if y_index is not None:
        hess = hess[..., _as_index_array(y_index, hess.shape[-3]), :, :]
    if x_index is not None:
        xi = _as_index_array(x_index, hess.shape[-1])
        hess = hess[..., xi, :][..., xi]
    return hess


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
    return y, _select_jac(jac, y_index, x_index)


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
    return (y, _select_jac(jac, y_index, x_index),
            _select_hess(hess, y_index, x_index))


def _grouped_point_fn(model, params, wb_g):
    """Single-point ShapeNet closure given one group's generated weights.

    NIF-linear's ``x_to_u_given_w`` additionally needs the trainable phi
    trunk (``params``); detect that from its signature once.
    """
    import inspect

    needs_params = "params" in inspect.signature(
        model.x_to_u_given_w
    ).parameters
    if needs_params:
        return lambda r: model.x_to_u_given_w(
            r[None], wb_g[None], params=params
        )[0]
    return lambda r: model.x_to_u_given_w(r[None], wb_g[None])[0]


def _fusable(model, x, fused, supported_fn) -> bool:
    """Shared tri-state gating for the fused derivative-eval kernels:
    ``fused=False`` never routes; explicit ``True`` routes iff the
    config/tile passes ``supported_fn`` (interpret mode on CPU); ``None``
    (auto) additionally requires TPU. Applies to the plain generated-chain
    models (NIF/NIFMultiScale with 'full' connectivity — NIF-linear's
    trunk carries trainable params the kernels do not take)."""
    import inspect

    if fused is False:
        return False
    needs_params = "params" in inspect.signature(
        model.x_to_u_given_w
    ).parameters
    if needs_params or not hasattr(model, "cfg_shape_net"):
        return False
    supported = supported_fn(
        model.cfg_shape_net, model.shapenet_variant, x.shape[1], x.shape[2]
    )
    if fused is True:
        return supported
    from ..models.nif import _on_tpu

    return supported and _on_tpu()


def _linear_fusable(model, x, fused, supported_fn) -> bool:
    """NIF-linear form of :func:`_fusable`: routes through the model's
    effective generated chain (bottleneck + latent contraction are both
    linear — see NIFMultiScaleLastLayerParameterized._fwd_jac_effective_chain)."""
    if fused is False or not hasattr(model, "_fwd_jac_effective_chain"):
        return False
    supported = supported_fn(
        model._fwd_jac_cfg, "siren", x.shape[1], x.shape[2]
    )
    if fused is True:
        return supported
    from ..models.nif import _on_tpu

    return supported and _on_tpu()


def _fwd_jac_fusable(model, x, fused) -> bool:
    """Route (y, dy/dx) through the fused forward+JVP Pallas kernel?"""
    from .pallas_shapenet import fwd_jac_supported

    return _fusable(model, x, fused, fwd_jac_supported)


def _fwd_jac_linear_fusable(model, x, fused) -> bool:
    from .pallas_shapenet import fwd_jac_supported

    return _linear_fusable(model, x, fused, fwd_jac_supported)


def output_and_jacobian_grouped(
    model,
    params,
    t: jnp.ndarray,
    x: jnp.ndarray,
    y_index: Index = None,
    x_index: Index = None,
    fused: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped (y, dy/dx): ParameterNet runs ONCE per group.

    The point-wise ``output_and_jacobian`` closes over the full ``apply``,
    so every coordinate re-runs the entire hypernetwork under ``jacfwd`` —
    orders of magnitude off at the million-point scale the rest of the
    framework targets (round-2 review item 4). Here the weight vector is
    generated once per (t, mu) group and forward-mode differentiates only
    the ShapeNet chain w.r.t. x (reference derivative semantics:
    nif/layers/gradient.py:207-231, per-point d u / d x).

    On TPU the (y, jac) evaluation runs in ONE fused Pallas pass
    (``shapenet_fwd_jac``) when the config supports it: reverse-mode
    cotangent sweeps over the VMEM-resident chain when so < si (the
    flagship scalar-field case), forward-mode tangent streams otherwise.
    ``fused=False`` forces the XLA jacfwd path, ``fused=True`` forces the
    kernel (e.g. under interpret mode on CPU).

    Args:
      t: ``[G, pi]`` parameters; x: ``[G, P, si]`` coordinates.

    Returns:
      ``y [G, P, so]`` and ``jac [G, P, |y_index|, |x_index|]``.
    """
    if _fwd_jac_fusable(model, x, fused):
        from .pallas_shapenet import shapenet_fwd_jac

        wb = model.p_to_w(params, t)  # hypernet runs once per group
        # the XLA path casts to the compute dtype inside x_to_u_given_w;
        # the kernel must see the same dtype (f32 x under a bf16 policy
        # silently ran the whole kernel at f32: exact trig + 6-pass
        # HIGHEST matmuls, measured 4x slower)
        y, jac = shapenet_fwd_jac(
            wb, model.policy.cast_to_compute(x),
            model.cfg_shape_net, model.shapenet_variant,
        )
    elif _fwd_jac_linear_fusable(model, x, fused):
        from .pallas_shapenet import shapenet_fwd_jac

        wb_eff, cfg_eff = model._fwd_jac_effective_chain(params, t)
        y, jac = shapenet_fwd_jac(
            wb_eff, model.policy.cast_to_compute(x), cfg_eff, "siren"
        )
    else:
        wb = model.p_to_w(params, t)  # hypernet runs once per group

        def single(wb_g, row):
            f = _grouped_point_fn(model, params, wb_g)
            return f(row), jax.jacfwd(f)(row)

        y, jac = jax.vmap(
            jax.vmap(single, in_axes=(None, 0)), in_axes=(0, 0)
        )(wb, x)
    return y, _select_jac(jac, y_index, x_index)


def _fwd_hess_fusable(model, x, fused) -> bool:
    """Route (y, jac, hess) through the fused forward-over-forward Pallas
    kernel (sine chains, si <= 4)?"""
    from .pallas_shapenet import fwd_hess_supported

    return _fusable(model, x, fused, fwd_hess_supported)


def _fwd_hess_linear_fusable(model, x, fused) -> bool:
    """NIF-linear (y, jac, hess) via its effective generated chain — the
    bottleneck and latent contraction are both linear, so the second
    derivative of the effective sine chain IS the model's hessian."""
    from .pallas_shapenet import fwd_hess_supported

    return _linear_fusable(model, x, fused, fwd_hess_supported)


def output_jacobian_hessian_grouped(
    model,
    params,
    t: jnp.ndarray,
    x: jnp.ndarray,
    y_index: Index = None,
    x_index: Index = None,
    fused: Optional[bool] = None,
):
    """Grouped (y, dy/dx, d2y/dx2) — the ``HessianLayer`` equivalent with
    the ParameterNet evaluated once per group.

    On TPU the evaluation runs in ONE fused forward-over-forward Pallas
    pass (``shapenet_fwd_hess``: value + si first-order + si(si+1)/2
    unique second-order tangent streams riding the same stacked matmuls)
    when the config supports it — post-training curvature/Laplacian
    evaluation without nesting two ``jacfwd`` passes over the whole
    chain. ``fused=False`` forces the XLA path (and keeps the result
    differentiable w.r.t. params — the kernel is evaluation-only, no
    VJP); ``fused=True`` forces the kernel (interpret mode on CPU)."""
    if _fwd_hess_fusable(model, x, fused):
        from .pallas_shapenet import shapenet_fwd_hess

        wb = model.p_to_w(params, t)
        # cast like the XLA path's x_to_u_given_w — an f32 x under a bf16
        # policy would silently run the kernel at f32 (see
        # output_and_jacobian_grouped)
        y, jac, hess = shapenet_fwd_hess(
            wb, model.policy.cast_to_compute(x),
            model.cfg_shape_net, model.shapenet_variant,
        )
    elif _fwd_hess_linear_fusable(model, x, fused):
        from .pallas_shapenet import shapenet_fwd_hess

        wb_eff, cfg_eff = model._fwd_jac_effective_chain(params, t)
        y, jac, hess = shapenet_fwd_hess(
            wb_eff, model.policy.cast_to_compute(x), cfg_eff, "siren"
        )
    else:
        wb = model.p_to_w(params, t)

        def single(wb_g, row):
            f = _grouped_point_fn(model, params, wb_g)
            return (f(row), jax.jacfwd(f)(row),
                    jax.jacfwd(jax.jacfwd(f))(row))

        y, jac, hess = jax.vmap(
            jax.vmap(single, in_axes=(None, 0)), in_axes=(0, 0)
        )(wb, x)
    return (y, _select_jac(jac, y_index, x_index),
            _select_hess(hess, y_index, x_index))


def sobolev_loss_grouped(
    model,
    params,
    t: jnp.ndarray,
    x: jnp.ndarray,
    targets: jnp.ndarray,
    target_jac: Optional[jnp.ndarray] = None,
    target_hess: Optional[jnp.ndarray] = None,
    w_value: float = 1.0,
    w_jac: float = 1.0,
    w_hess: float = 1.0,
    y_index: Index = None,
    x_index: Index = None,
    weight: Optional[jnp.ndarray] = None,
):
    """Sobolev training loss on the grouped layout (tutorial 8 semantics,
    scalable to million-point groups).

    targets ``[G, P, so]`` (or y_index-selected columns); target_jac
    ``[G, P, |yi|, |xi|]``; target_hess adds the second-order term.
    ``weight [G, P]`` (optional) multiplies every term's squared error
    per point under a plain ``mean`` — the trainers' padding convention
    (zero-weight filler rows, real rows scaled by n_target/n_real) makes
    padded batches exact. Returns ``(total, terms_dict)`` like
    :func:`sobolev_loss`.
    """
    def wmean(sq, extra_dims):
        if weight is None:
            return jnp.mean(sq)
        w = weight.astype(sq.dtype).reshape(
            weight.shape + (1,) * extra_dims
        )
        return jnp.mean(sq * w)

    if target_hess is not None:
        # fused=False: this loss is differentiated w.r.t. params and the
        # fused hess-eval kernel has no VJP — hessian-target TRAINING
        # rides its own single-pass kernel (shapenet_hessian_grads)
        y, jac, hess = output_jacobian_hessian_grouped(
            model, params, t, x, y_index, x_index, fused=False
        )
        terms = {"hessian_mse": wmean(jnp.square(hess - target_hess), 3)}
    else:
        # fused=False: the training loss is differentiated w.r.t. params,
        # and the fused fwd+jac kernel is evaluation-only (no VJP rule) —
        # Sobolev training stays on the XLA jacfwd path
        y, jac = output_and_jacobian_grouped(
            model, params, t, x, y_index, x_index, fused=False
        )
        terms = {}
    tshape = jnp.shape(targets)
    if tshape == y.shape:
        y_val = y
    elif y_index is not None:
        y_val = y[..., _as_index_array(y_index, y.shape[-1])]
        if y_val.shape != tshape:
            raise ValueError(
                f"sobolev_loss_grouped: value targets shape {tshape} "
                f"matches neither the full output {y.shape} nor the "
                f"y_index-selected output {y_val.shape}"
            )
    else:
        raise ValueError(
            f"sobolev_loss_grouped: value targets shape {tshape} does not "
            f"match the output shape {y.shape}"
        )
    terms["value_mse"] = wmean(jnp.square(y_val - targets), 1)
    if target_jac is not None:
        terms["jacobian_mse"] = wmean(jnp.square(jac - target_jac), 2)
    total = w_value * terms["value_mse"]
    if "jacobian_mse" in terms:
        total = total + w_jac * terms["jacobian_mse"]
    if "hessian_mse" in terms:
        total = total + w_hess * terms["hessian_mse"]
    return total, terms


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
