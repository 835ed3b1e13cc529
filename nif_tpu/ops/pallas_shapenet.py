"""Fused Pallas TPU kernel for the grouped ShapeNet chain.

Why this kernel exists: the grouped ShapeNet layer is
``u = sin(omega * (u @ W_g) + b_g)`` — a batched matmul with a scaled-and-
shifted sine epilogue. XLA fuses bare ``sin(matmul)`` into the matmul, but
the ``omega *`` scale / bias add breaks its epilogue fusion and every
``[G, P, n]`` intermediate round-trips through HBM (measured 7x slowdown on
v5e: 0.39 ms -> 2.9 ms forward for G=32, P=8192, n=128). This kernel runs
the whole chain — every layer's matmul, scale, bias, and activation — in
one ``pallas_call`` with activations resident in VMEM, plus a hand-written
backward kernel (recompute-in-backward, flash-attention style) for the
training path.

Layout contract: identical to :mod:`nif_tpu.ops.shapenet` (the XLA
reference path) — weights arrive as the flattened per-group vector in the
reference slicing order; unpacking into per-layer tensors happens in XLA
outside the kernel (cheap 2 MB copies), so the kernel sees clean
``[G, n, n]`` operands and never reshapes in-kernel.

Variants supported (same semantics as the XLA path):
  * 'siren' plain      — ``u = sin(w0*z + b)`` chain
  * 'siren' resblock   — ``u = 0.5*(u + sin(w0*z2 + b2))``
  * 'vanilla'          — ``u = act(z + b) [+ shortcut]``
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ShapeNetConfig
from .shapenet import shapenet_grouped, unpack_shapenet_weights

__all__ = [
    "shapenet_grouped_fused",
    "shapenet_mse_grads",
    "fused_supported",
    "fused_unsupported_reason",
    "niflinear_mse_grads",
    "linear_fused_supported",
    "linear_fused_unsupported_reason",
    "shapenet_fwd_jac",
    "fwd_jac_supported",
    "fwd_jac_unsupported_reason",
    "shapenet_sobolev_grads",
    "sobolev_fused_supported",
    "sobolev_fused_unsupported_reason",
    "shapenet_hessian_grads",
    "hessian_fused_supported",
    "hessian_fused_unsupported_reason",
    "shapenet_fwd_hess",
    "fwd_hess_supported",
    "fwd_hess_unsupported_reason",
]


# --------------------------------------------------------------------------
# Fast polynomial sine for bf16 compute.
#
# The VPU's exact f32 sine costs ~25 ops/element and dominates the kernel
# (measured: 2.4 ms of a 2.9 ms forward at G=32, P=8192, n=128). Activations
# are cast to bf16 between layers anyway (eps ~ 3.9e-3), so a low-degree odd
# minimax polynomial on the range-reduced argument (degree 7 by default
# since round 4, max error 2.5e-4 — 15x below bf16 rounding; degree 9 via
# NIF_SIN_DEGREE=9, error 1.7e-5) is a free 3-4x kernel speedup. The
# backward pass uses the TRUE derivative of the forward polynomial, so
# gradients are exact for the function actually computed.
# --------------------------------------------------------------------------
_INV2PI = float(1.0 / (2.0 * np.pi))
# sin(2*pi*t) ~ t*(c1 + c3 t^2 + c5 t^4 + c7 t^6 + c9 t^8), t in [-0.5, 0.5]
_SIN_C = (6.28308846, -41.33324754, 81.40008977, -74.67588387, 33.16809461)
# Degree-7 variant: max err 2.5e-4 — 15x below the bf16 output rounding
# the activations hit anyway (~3.9e-3 relative), and measured +13.7%
# train points/s at the flagship width-128 config (round-4 probe:
# 3.76 -> 3.31 ms/step; width-256 is traversal-bound and moves <1%).
# DEFAULT for bf16 compute since round 4; set NIF_SIN_DEGREE=9 for the
# round-3 degree-9 polynomial (err 1.7e-5) if the extra two digits
# matter more than the speed. Backward/second-derivative polynomials
# follow the same degree so gradients stay exact for the computed
# function.
_SIN_C7 = (6.27863546, -41.09373072, 77.93034984, -56.08639487)


def _sin_degree() -> int:
    import os

    return 9 if os.environ.get("NIF_SIN_DEGREE") == "9" else 7


def _sin_poly(t):
    s = t * t
    if _sin_degree() == 7:
        c1, c3, c5, c7 = _SIN_C7
        return t * (c1 + s * (c3 + s * (c5 + s * c7)))
    c1, c3, c5, c7, c9 = _SIN_C
    return t * (c1 + s * (c3 + s * (c5 + s * (c7 + s * c9))))


def _dsin_poly(t):
    """d/dt of _sin_poly, times d t/d y = 1/2pi folded in by callers."""
    s = t * t
    if _sin_degree() == 7:
        c1, c3, c5, c7 = _SIN_C7
        return c1 + s * (3 * c3 + s * (5 * c5 + s * (7 * c7)))
    c1, c3, c5, c7, c9 = _SIN_C
    return c1 + s * (3 * c3 + s * (5 * c5 + s * (7 * c7 + s * (9 * c9))))


def _fast_sin(y):
    t = y * _INV2PI
    t = t - jnp.round(t)
    return _sin_poly(t)


def _fast_sin_grad(y):
    """d/dy of _fast_sin — the exact gradient of the forward polynomial."""
    t = y * _INV2PI
    t = t - jnp.round(t)
    return _dsin_poly(t) * _INV2PI


def _fast_sin_and_grad(y):
    """(sin y, d sin/dy) sharing one range reduction.

    Mosaic already CSEs the shared ``t``/``s`` when both polynomials are
    evaluated in one kernel (measured: separate evaluations cost the same
    as this joint form), but the joint form lets forward-saving kernels
    store the derivative VALUE as the residual — at the compute dtype —
    which halves backward-kernel VMEM liveness and drops the backward
    polynomial entirely."""
    t = y * _INV2PI
    t = t - jnp.round(t)
    return _sin_poly(t), _dsin_poly(t) * _INV2PI


def _fast_sin_grad2(y):
    """d2/dy2 of _fast_sin — exact curvature of the forward polynomial.

    P(t) = t(c1 + c3 s + c5 s^2 + c7 s^3 [+ c9 s^4]), s = t^2, so
    P''(t) = t(6 c3 + 20 c5 s + 42 c7 s^2 [+ 72 c9 s^3])."""
    t = y * _INV2PI
    t = t - jnp.round(t)
    s = t * t
    if _sin_degree() == 7:
        _, c3, c5, c7 = _SIN_C7
        poly = 6 * c3 + s * (20 * c5 + s * (42 * c7))
    else:
        _, c3, c5, c7, c9 = _SIN_C
        poly = 6 * c3 + s * (20 * c5 + s * (42 * c7 + s * (72 * c9)))
    return t * poly * (_INV2PI * _INV2PI)


def _fast_sin_grad3(y):
    """d3/dy3 of _fast_sin — third derivative of the forward polynomial.

    P(t) = c1 t + c3 t^3 + c5 t^5 + c7 t^7 [+ c9 t^9], s = t^2, so
    P'''(t) = 6 c3 + 60 c5 s + 210 c7 s^2 [+ 504 c9 s^3]. The hessian
    train kernel's backward multiplies by it (reverse-mode through a
    second-order tangent touches f''')."""
    t = y * _INV2PI
    t = t - jnp.round(t)
    s = t * t
    if _sin_degree() == 7:
        _, c3, c5, c7 = _SIN_C7
        poly = 6 * c3 + s * (60 * c5 + s * (210 * c7))
    else:
        _, c3, c5, c7, c9 = _SIN_C
        poly = 6 * c3 + s * (60 * c5 + s * (210 * c7 + s * (504 * c9)))
    return poly * (_INV2PI * _INV2PI * _INV2PI)


def _trig3_for(dtype):
    """(sin, d1, d2, d3) — the hessian train kernel's backward needs the
    activation's first three derivatives, exact for the function the
    kernel computes (polynomial chain for bf16, true trig for f32)."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return _fast_sin, _fast_sin_grad, _fast_sin_grad2, _fast_sin_grad3
    return (jnp.sin, jnp.cos, lambda z: -jnp.sin(z),
            lambda z: -jnp.cos(z))


def _trig_for(dtype):
    """(sin, dsin/dy) — polynomial for bf16 compute, exact for f32."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return _fast_sin, _fast_sin_grad
    return jnp.sin, jnp.cos


def _act_with_grad(name: str, dtype):
    """z -> (act(z), act'(z)) evaluated jointly at the compute dtype.

    The joint form shares the range reduction for the bf16 sine pair and
    lets forward-saving kernels store the DERIVATIVE value as the residual
    (instead of the pre-activation), so the backward sweep never re-runs an
    activation polynomial."""
    if name == "sine":
        if jnp.dtype(dtype) == jnp.bfloat16:
            return _fast_sin_and_grad
        return lambda z: (jnp.sin(z), jnp.cos(z))
    act, dact = _act_pair(name)
    return lambda z: (act(z), dact(z))


def _trig2_for(dtype):
    """(sin, d1, d2) — the curvature term the Sobolev backward needs."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return _fast_sin, _fast_sin_grad, _fast_sin_grad2
    return jnp.sin, jnp.cos, lambda z: -jnp.sin(z)


# --------------------------------------------------------------------------
# Activation / derivative pairs (derivative expressed in terms of z).
# --------------------------------------------------------------------------
def _act_pair(name: str) -> Tuple[Callable, Callable]:
    if name == "sine":
        return jnp.sin, jnp.cos
    if name == "tanh":
        return jnp.tanh, lambda z: 1.0 - jnp.square(jnp.tanh(z))
    if name == "relu":
        return (
            lambda z: jnp.maximum(z, 0.0),
            lambda z: (z > 0.0).astype(z.dtype),
        )
    if name in ("swish", "silu"):
        def d_swish(z):
            s = jax.nn.sigmoid(z)
            return s * (1.0 + z * (1.0 - s))
        return jax.nn.swish, d_swish
    if name == "sigmoid":
        def d_sigmoid(z):
            s = jax.nn.sigmoid(z)
            return s * (1.0 - s)
        return jax.nn.sigmoid, d_sigmoid
    if name == "linear":
        return (lambda z: z), (lambda z: jnp.ones_like(z))
    raise ValueError(f"activation {name!r} not supported by the fused kernel")


def _act_triple(name: str) -> Tuple[Callable, Callable, Callable]:
    """(act, act', act'') — reverse-mode through a forward-mode tangent
    multiplies by the activation's second derivative."""
    act, d1 = _act_pair(name)
    if name == "sine":
        return act, d1, lambda z: -jnp.sin(z)
    if name == "tanh":
        def d2(z):
            a = jnp.tanh(z)
            return -2.0 * a * (1.0 - jnp.square(a))
        return act, d1, d2
    if name == "relu":
        return act, d1, lambda z: jnp.zeros_like(z)
    if name in ("swish", "silu"):
        def d2(z):
            s = jax.nn.sigmoid(z)
            # f'' = s'(2 + z(1-2s)), s' = s(1-s)
            return s * (1.0 - s) * (2.0 + z * (1.0 - 2.0 * s))
        return act, d1, d2
    if name == "sigmoid":
        def d2(z):
            s = jax.nn.sigmoid(z)
            return s * (1.0 - s) * (1.0 - 2.0 * s)
        return act, d1, d2
    if name == "linear":
        return act, d1, lambda z: jnp.zeros_like(z)
    raise ValueError(f"activation {name!r} not supported by the fused kernel")


def fused_unsupported_reason(cfg: ShapeNetConfig, variant: str,
                             P: int) -> Optional[str]:
    """Why the fused kernel can NOT handle this config (None = it can).

    The string feeds the fast-path fallback log (round-2 review: a user
    with an awkward P silently trained ~8x slower on the XLA path)."""
    if cfg.connectivity != "full":
        return f"connectivity={cfg.connectivity!r} (fused kernel runs the full generated chain)"
    if variant == "vanilla":
        try:
            _act_pair(cfg.activation)
        except ValueError:
            return f"activation {cfg.activation!r} has no fused kernel implementation"
    # Tiny widths gain nothing and hit Mosaic tiling corner cases.
    if cfg.units < 8:
        return f"units={cfg.units} < 8 (tiny widths gain nothing from the kernel)"
    if _pick_tile(P, cfg) is None:
        return (f"points-per-group P={P} is not divisible by any supported "
                f"point tile — pad P to a multiple of 256")
    return None


def fused_supported(cfg: ShapeNetConfig, variant: str, P: int) -> bool:
    """Whether the fused kernel handles this config (else XLA path)."""
    return fused_unsupported_reason(cfg, variant, P) is None


# VMEM budget for the residuals held live by the backward/train kernels
# (v5e/v5p have ~16 MB/core; leave headroom for weights, temporaries, and
# the double-buffered input tiles).
_VMEM_RESIDUAL_BUDGET = 8 * 1024 * 1024
# bf16 compute leaves more real headroom than the conservative model
# above: TP=4096 at width-128 depth-2 measured 11% faster than 2048 and
# compiles fine (TP=8192 OOMs); width-256, deep-resblock, and width-64
# enlarged tiles were each validated at real compile. 12 MB puts the
# validated configs exactly at their measured-good tiles.
_VMEM_BF16_BACKWARD_BUDGET = 12 * 1024 * 1024


def _pick_tile(P: int, cfg: ShapeNetConfig = None, backward: bool = True,
               itemsize: int = 2):
    """Largest point-tile that divides P within the VMEM budget.

    The backward/train kernels hold every layer input AND pre-activation
    live at once (compute dtype); the forward kernel holds only ~3
    activations, so it can take 2-4x larger tiles (measured ~13% faster at
    TP=8192 for the width-128 chain).

    The constants are hardware-calibrated for bf16 compute. f32 compute
    (``itemsize=4`` — the fine-tuning/accuracy path) doubles the lane-
    padded x/target double buffers (narrow dims pad to 128 lanes), which
    the bf16 headroom absorbed: charge them explicitly so e.g. the
    width-128 train kernel drops TP 2048 -> 1024 instead of exceeding the
    16 MB scoped-vmem stack by ~3 MB at real-compile time.
    """
    # x + target tiles pad to 128 lanes and double-buffer: 4 * 128 lanes
    # per row. Charged only for f32 — the bf16 constants below absorb
    # their (half-size) pads in the budget's headroom, and measured usage
    # (18.84M at f32/TP=2048 vs <16M at bf16/TP=2048, width-128 depth-2)
    # confirms the f32 surcharge must count the full padded tiles.
    #
    # NOTE (round 4): residuals now store at the COMPUTE dtype (half the
    # round-3 bytes for bf16), but the 4-bytes/value charge here stays —
    # enlarged tiles were re-probed on hardware and FAIL real compiles
    # anyway (w256 train @TP=4096 and w128-d4-resblock @TP=2048 both blow
    # the 16 MB scoped stack: Mosaic's true liveness includes transient
    # f32 activations and dz streams the residual count doesn't model),
    # and the one extra tile step bought nothing where it did compile.
    pad_extra = 4 * 128 * itemsize if itemsize > 2 else 0
    if cfg is not None:
        budget = _VMEM_RESIDUAL_BUDGET
        if backward:
            n_sine = 1 + (2 if cfg.use_resblock else 1) * cfg.nlayers
            bytes_per_row = 2 * n_sine * cfg.units * 4 + pad_extra
            if itemsize <= 2:
                cap, budget = 4096, _VMEM_BF16_BACKWARD_BUDGET
            else:
                cap = 2048
        else:
            bytes_per_row = 3 * cfg.units * 4 + pad_extra
            cap = 8192
            if itemsize <= 2:
                # bf16 forward headroom, measured like the backward case:
                # TP=8192 at width-128 is another +9% (491.9 vs 449.6
                # Mpts/s) and compiles; width-256 @4096 validated too.
                budget = _VMEM_BF16_BACKWARD_BUDGET
        cap = max(min(cap, budget // max(bytes_per_row, 1)), 8)
    else:
        cap = 2048
    for tp in (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if tp <= cap and P % tp == 0:
            return tp
    return None


def _precision_for(a, b):
    """f32 operands run full-precision MXU passes (the f32 kernel paths are
    the fine-tuning/accuracy paths — measured ~1% grad error at default
    precision on sine chains). bf16 operands PIN the default precision
    explicitly: returning None lets an ambient
    ``jax.default_matmul_precision("highest")`` context (the L-BFGS
    fine-tuner traces under one) stamp fp32 contract precision onto bf16
    matmuls, which Mosaic rejects at real compile time ("Bad lhs type" —
    found by the round-5 bench, not by interpret mode)."""
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _matmul(a, b):
    # [TP, k] x [k, m] -> [TP, m], f32 accumulation on the MXU.
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision_for(a, b),
    )


def _first_matmul(x, w0):
    """First-layer matmul: K = si is tiny (1-3 coords), so an MXU pass pads
    K to 128 and wastes a full systolic pass; a VPU broadcast-fma chain is
    cheaper. Falls back to the MXU for wider inputs."""
    si = x.shape[-1]
    if si > 4:
        return _matmul(x, w0)
    z = x[:, 0:1].astype(jnp.float32) * w0[0:1, :].astype(jnp.float32)
    for i in range(1, si):
        z = z + x[:, i : i + 1].astype(jnp.float32) * w0[i : i + 1, :].astype(
            jnp.float32
        )
    return z


def _last_matmul(u, wl):
    """Last-layer matmul: N = so is tiny (often 1), so the MXU pads N to
    128; a VPU multiply + lane reduction is cheaper for so == 1."""
    so = wl.shape[-1]
    if so != 1:
        return _matmul(u, wl)
    return jnp.sum(
        u.astype(jnp.float32) * wl[:, 0].astype(jnp.float32)[None, :],
        axis=1,
        keepdims=True,
    )


def _forward_layers(x, ws, bs, cfg: ShapeNetConfig, variant: str, save: bool):
    """Shared fwd chain: returns (out, ins, dacts) where ``ins`` are the
    layer inputs and ``dacts`` the ACTIVATION-DERIVATIVE values at each
    pre-activation — exactly the residuals the backward pass needs, so it
    never recomputes a forward matmul or an activation polynomial.
    (Both lists are empty when save=False.)

    Residuals are stored at the COMPUTE dtype: the backward matmuls lift
    them to that dtype anyway, and for bf16 this halves the scoped-VMEM
    liveness of the train/backward kernels (the binding constraint on the
    point tile — see :func:`_pick_tile`). The derivative-valued residual
    replaces the round-3 pre-activation residual: combined with the joint
    sin/grad evaluation it removes the whole backward activation
    polynomial (9 VPU ops/element at w256 — measured 25.9% of the train
    kernel was sine epilogue).

    ``ws``/``bs`` are the per-layer 2-D weight matrices / 1-D biases in
    chain order (resblock layers contribute two consecutive entries).
    """
    l = cfg.nlayers
    ins: List[Any] = []
    dacts: List[Any] = []
    cdt = x.dtype

    def lift(u):
        return u.astype(cdt)

    if variant == "siren":
        sin_fn, _ = _trig_for(cdt)
        pair_fn = _act_with_grad("sine", cdt)
    else:
        sin_fn, _ = _act_pair(cfg.activation)
        pair_fn = _act_with_grad(cfg.activation, cdt)

    def layer(u_in, w, b, first=False):
        # NOTE: sine-chain weights arrive PRE-SCALED by omega_0 (folded in
        # XLA outside the kernel), so no per-element scale runs on the VPU.
        mm = _first_matmul if first else _matmul
        u_c = u_in if first else lift(u_in)
        z = mm(u_c, w) + b.astype(jnp.float32)
        if save:
            ins.append(u_c)
            u, d = pair_fn(z)
            dacts.append(lift(d))
            return u
        return sin_fn(z)

    if variant == "siren":
        u = layer(x, ws[0], bs[0], first=True)
        if cfg.use_resblock:
            for i in range(l):
                h = layer(u, ws[1 + 2 * i], bs[1 + 2 * i])
                u = 0.5 * (u + layer(h, ws[2 + 2 * i], bs[2 + 2 * i]))
        else:
            for i in range(l):
                u = layer(u, ws[1 + i], bs[1 + i])
    else:
        u = layer(x, ws[0], bs[0], first=True)
        for i in range(l):
            u = layer(u, ws[1 + i], bs[1 + i]) + u

    u_last = lift(u)
    if save:
        ins.append(u_last)
    out = _last_matmul(u_last, ws[-1]) + bs[-1].astype(jnp.float32)
    return out, ins, dacts


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------
def _fwd_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, *refs):
    # refs: w_0..w_{n_w-1}, b_0..b_{n_w-1}, x, out
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    out_ref = refs[2 * n_w + 1]
    out, _, _ = _forward_layers(x_ref[0], ws, bs, cfg, variant, save=False)
    out_ref[0] = out.astype(out_ref.dtype)


def _split_chain(parts: Dict[str, Any]):
    """Flattened per-layer (weights, biases) lists from the unpack dict."""
    ws = [parts["w_first"], *parts["w_hidden"], parts["w_last"]]
    bs = [parts["b_first"], *parts["b_hidden"], parts["b_last"]]
    return ws, bs


def _prescale(ws, cfg: ShapeNetConfig, variant: str):
    """Fold omega_0 into the sine-fed weight matrices (all but the linear
    last layer) so the kernels never run a per-element scale."""
    if variant != "siren":
        return ws
    om = cfg.omega_0
    return [w * om for w in ws[:-1]] + [ws[-1]]


def _unscale_grads(dws, cfg: ShapeNetConfig, variant: str):
    """Chain rule back to the unscaled weights: dL/dW = omega * dL/dW'."""
    if variant != "siren":
        return dws
    om = cfg.omega_0
    return [d * om for d in dws[:-1]] + [dws[-1]]


def _fwd_pallas(ws, bs, x, cfg: ShapeNetConfig, variant: str, interpret: bool):
    G, P, si = x.shape
    so = cfg.output_dim
    TP = _pick_tile(P, cfg, backward=False, itemsize=x.dtype.itemsize)
    n_w = len(ws)
    grid = (G, P // TP)

    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]
    bs = [b[:, None, :] for b in bs]  # [G, 1, n] — TPU block alignment
    b_specs = [
        pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for b in bs
    ]
    x_spec = pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TP, so), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, cfg, variant, n_w)
    n = cfg.units
    l_mats = len(ws) - 2
    flops = 2 * G * P * (si * n + l_mats * n * n + n * so)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*w_specs, *b_specs, x_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, P, so), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=G * P * n * (len(ws) - 1),
        ),
        interpret=interpret,
    )(*ws, *bs, x)
    return out


# --------------------------------------------------------------------------
# Backward kernel (recompute forward, accumulate weight grads over P-tiles)
# --------------------------------------------------------------------------
def _mmT_nt(a, b):
    # a [TP, m], b [k, m] -> a @ b.T : [TP, k]
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision_for(a, b),
    )


def _mmT_tn(a, b):
    # a [TP, k], b [TP, m] -> a.T @ b : [k, m]
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision_for(a, b),
    )


def _backward_chain(go, ws, ins, dacts, cfg: ShapeNetConfig, variant: str,
                    cdt, need_dx: bool = True):
    """Given dL/dout and the saved residuals, produce (dws, dbs, dx).

    ``need_dx=False`` (the train kernels — x is data, not a parameter)
    skips the input-cotangent matmul entirely: its [TP, si] output pads
    si to a full lane tile on the MXU, so relying on Mosaic to
    dead-code-eliminate it is not worth the risk.

    ``dacts`` carry the activation DERIVATIVE values precomputed by the
    forward chain (same polynomial as the forward for bf16 compute), so
    gradients are exact for the computed function and the backward sweep
    is pure multiply + matmul.
    """
    l = cfg.nlayers
    n_w = len(ws)

    def lift(u):
        return u.astype(cdt)

    def d32(k):
        return dacts[k].astype(jnp.float32)

    def colsum(dz_c):
        """Bias grad: sum a [TP, n] cotangent over rows.

        Default: exact f32 VPU summation. NIF_COLSUM_MXU=1 moves the
        reduction to the MXU as a [1, TP] x [TP, n] ones-matmul —
        hardware A/B (round 4, same-process interleaved): +1.5% at w128,
        -1% at w256, i.e. within chip noise either way, so the exact
        summation stays the default. (The same A/B settled that the w256
        train kernel responds to neither VPU-op cuts nor MXU-work cuts —
        its time is serial per-tile traversal structure.) Takes the
        LIFTED (compute-dtype) cotangent the sibling dW matmul already
        materialized — same operand buffer, zero extra liveness (an f32
        ones-matmul variant pushed the w128 TP=4096 stack 872K over the
        16 MB scoped limit at real compile).
        """
        import os

        if (jnp.dtype(cdt) == jnp.bfloat16
                and os.environ.get("NIF_COLSUM_MXU") == "1"):
            ones = jnp.ones((1, dz_c.shape[0]), cdt)
            return _matmul(ones, dz_c)[0]
        return jnp.sum(dz_c, axis=0)

    dws: List[Any] = [None] * n_w
    dbs: List[Any] = [None] * n_w

    # ---- last (linear) layer: out = u_last @ W_l + b_l
    u_last = ins[-1]
    go_c = lift(go)
    dws[-1] = _mmT_tn(lift(u_last), go_c)
    dbs[-1] = colsum(go_c)
    if ws[-1].shape[-1] == 1:
        # so == 1 (the flagship case): the MXU form pads the K=1
        # contraction to 128 — half a hidden-matmul pass of 99%-wasted
        # systolic time per tile. A VPU broadcast costs 1 multiply/elem
        # (same [1, n] row-extraction trick as _last_matmul).
        wl_row = ws[-1][:, 0][None, :].astype(jnp.float32)  # [1, n]
        du = go.astype(jnp.float32) * wl_row  # [TP, n]
    else:
        du = _mmT_nt(lift(go), ws[-1]).astype(jnp.float32)  # [TP, n]

    if variant == "siren":
        if cfg.use_resblock:
            # ins/dacts layout per block i: [.., u_i @ 1+2i, h_i @ 2+2i, ..]
            for i in range(l - 1, -1, -1):
                u_in, h = ins[1 + 2 * i], ins[2 + 2 * i]
                w1, w2 = ws[1 + 2 * i], ws[2 + 2 * i]
                dz2_c = lift(0.5 * du * d32(2 + 2 * i))
                dws[2 + 2 * i] = _mmT_tn(lift(h), dz2_c)
                dbs[2 + 2 * i] = colsum(dz2_c)
                dh = _mmT_nt(dz2_c, w2).astype(jnp.float32)
                dz1_c = lift(dh * d32(1 + 2 * i))
                dws[1 + 2 * i] = _mmT_tn(lift(u_in), dz1_c)
                dbs[1 + 2 * i] = colsum(dz1_c)
                du = 0.5 * du + _mmT_nt(dz1_c, w1).astype(jnp.float32)
        else:
            for i in range(l - 1, -1, -1):
                dz_c = lift(du * d32(1 + i))
                dws[1 + i] = _mmT_tn(lift(ins[1 + i]), dz_c)
                dbs[1 + i] = colsum(dz_c)
                du = _mmT_nt(dz_c, ws[1 + i]).astype(jnp.float32)
    else:
        for i in range(l - 1, -1, -1):
            dz_c = lift(du * d32(1 + i))
            dws[1 + i] = _mmT_tn(lift(ins[1 + i]), dz_c)
            dbs[1 + i] = colsum(dz_c)
            # shortcut: u_i = act(z) + u_{i-1} -> grad adds straight through
            du = du + _mmT_nt(dz_c, ws[1 + i]).astype(jnp.float32)

    dz0_c = lift(du * d32(0))
    dws[0] = _mmT_tn(ins[0], dz0_c)
    dbs[0] = colsum(dz0_c)
    dx = _mmT_nt(dz0_c, ws[0]) if need_dx else None

    return dws, dbs, dx


def _write_grad_accum(dw_refs, db_refs, dws, dbs):
    """Initialize or accumulate weight-grad outputs across P-tile steps."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        for r, v in zip(dw_refs, dws):
            r[0] = v.astype(r.dtype)
        for r, v in zip(db_refs, dbs):
            r[0] = v[None, :].astype(r.dtype)

    @pl.when(p != 0)
    def _accum():
        for r, v in zip(dw_refs, dws):
            r[0] = r[0] + v.astype(r.dtype)
        for r, v in zip(db_refs, dbs):
            r[0] = r[0] + v[None, :].astype(r.dtype)


def _bwd_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, *refs):
    # in refs:  w_0.., b_0.., x, g_out
    # out refs: dw_0.., db_0.., dx
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    g_ref = refs[2 * n_w + 1]
    dw_refs = refs[2 * n_w + 2 : 3 * n_w + 2]
    db_refs = refs[3 * n_w + 2 : 4 * n_w + 2]
    dx_ref = refs[4 * n_w + 2]

    x = x_ref[0]
    go = g_ref[0].astype(jnp.float32)

    # Recompute forward in VMEM (cheap; avoids writing activations to HBM
    # in the forward pass), saving layer inputs AND pre-activations so no
    # matmul runs twice.
    _, ins, zs = _forward_layers(x, ws, bs, cfg, variant, save=True)
    dws, dbs, dx = _backward_chain(go, ws, ins, zs, cfg, variant, x.dtype)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    _write_grad_accum(dw_refs, db_refs, dws, dbs)


def _bwd_pallas(ws, bs, x, g_out, cfg, variant, interpret):
    G, P, si = x.shape
    so = cfg.output_dim
    TP = _pick_tile(P, cfg, itemsize=x.dtype.itemsize)
    n_w = len(ws)
    grid = (G, P // TP)

    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda g, p: (g, 0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ]
    bs = [b[:, None, :] for b in bs]  # [G, 1, n] — TPU block alignment
    b_specs = [
        pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for b in bs
    ]
    x_spec = pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, TP, so), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)

    dw_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda g, p: (g, 0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ]
    db_specs = [
        pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for b in bs
    ]
    dx_spec = pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]  # [G,1,n]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    )

    kernel = functools.partial(_bwd_kernel, cfg, variant, n_w)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*w_specs, *b_specs, x_spec, g_spec],
        out_specs=[*dw_specs, *db_specs, dx_spec],
        out_shape=out_shapes,
        interpret=interpret,
    )(*ws, *bs, x, g_out)
    dws = outs[:n_w]
    dbs = outs[n_w : 2 * n_w]
    dx = outs[2 * n_w]
    return dws, dbs, dx


# --------------------------------------------------------------------------
# Fused training kernel: forward + weighted MSE + backward in ONE pass.
#
# A standard jax.value_and_grad over the fused forward runs the forward
# kernel, materializes predictions in HBM, computes the loss in XLA, then
# launches the backward kernel which RE-computes the forward. Fusing the
# MSE loss into a single kernel does the chain exactly once and never
# writes predictions out: measured ~25-30% off the ShapeNet train cost.
# --------------------------------------------------------------------------
def _train_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, has_w: bool, *refs):
    # in refs:  w_0.., b_0.., x, target, (weight)
    # out refs: loss_acc [1,1], dw_0.., db_0..
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    t_ref = refs[2 * n_w + 1]
    ofs = 2 * n_w + 2
    w_ref = refs[ofs] if has_w else None
    ofs += 1 if has_w else 0
    loss_ref = refs[ofs]
    dw_refs = refs[ofs + 1 : ofs + 1 + n_w]
    db_refs = refs[ofs + 1 + n_w : ofs + 1 + 2 * n_w]

    x = x_ref[0]
    out, ins, zs = _forward_layers(x, ws, bs, cfg, variant, save=True)
    err = out - t_ref[0].astype(jnp.float32)  # [TP, so]
    if has_w:
        wgt = w_ref[0].astype(jnp.float32)  # [TP, 1] (weights fed as [G,P,1])
        loss_part = jnp.sum(jnp.square(err) * wgt)
        go = 2.0 * err * wgt  # caller divides by N
    else:
        loss_part = jnp.sum(jnp.square(err))
        go = 2.0 * err

    dws, dbs, _ = _backward_chain(go, ws, ins, zs, cfg, variant, x.dtype,
                                  need_dx=False)

    g = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(jnp.logical_and(g == 0, p == 0))
    def _init_loss():
        loss_ref[0, 0] = loss_part

    @pl.when(jnp.logical_not(jnp.logical_and(g == 0, p == 0)))
    def _acc_loss():
        loss_ref[0, 0] = loss_ref[0, 0] + loss_part

    _write_grad_accum(dw_refs, db_refs, dws, dbs)


def shapenet_mse_grads(
    wb: jnp.ndarray,
    x: jnp.ndarray,
    target: jnp.ndarray,
    cfg: ShapeNetConfig,
    variant: str = "siren",
    weight: jnp.ndarray = None,
    interpret: bool = None,
):
    """Fused train step core: returns ``(loss, d_wb)`` for the weighted MSE
    ``mean(weight * (shapenet(wb, x) - target)^2)`` over the grouped layout.

    ``wb [G, po]``, ``x [G, P, si]``, ``target [G, P, so]``,
    ``weight [G, P]`` optional. Falls back to jax.value_and_grad over the
    XLA path when unsupported. Not differentiable itself — use inside a
    hand-assembled train step (see GroupedTrainer fused mode).
    """
    G, P, si = x.shape
    so = cfg.output_dim
    if not fused_supported(cfg, variant, P):
        def loss_fn(wb):
            pred = shapenet_grouped(wb, x, cfg, variant)
            err = jnp.square(pred - target.astype(pred.dtype))
            if weight is not None:
                err = err * weight[..., None].astype(pred.dtype)
            return jnp.mean(err)

        return jax.value_and_grad(loss_fn)(wb)

    interpret = _resolve_interpret(interpret)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    ws = _prescale(ws, cfg, variant)
    bs3 = [b[:, None, :] for b in bs]
    TP = _pick_tile(P, cfg, itemsize=x.dtype.itemsize)
    n_w = len(ws)
    grid = (G, P // TP)
    has_w = weight is not None

    wspec = lambda shp: pl.BlockSpec((1,) + shp, lambda g, p: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    bspec = lambda b: pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = (
        [wspec(w.shape[1:]) for w in ws]
        + [bspec(b) for b in bs3]
        + [pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((1, TP, so), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)]
    )
    args = [*ws, *bs3, x, target.astype(x.dtype)]
    if has_w:
        # [G, P, 1]: a (1, TP) block of a [G, P] array violates Mosaic's
        # block-shape rule (2nd-minor must divide 8 or equal the dim).
        in_specs.append(
            pl.BlockSpec((1, TP, 1), lambda g, p: (g, p, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(weight.astype(x.dtype)[..., None])

    out_specs = (
        [pl.BlockSpec((1, 1), lambda g, p: (0, 0), memory_space=pltpu.SMEM)]
        + [wspec(w.shape[1:]) for w in ws]
        + [bspec(b) for b in bs3]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs3]
    )

    kernel = functools.partial(_train_kernel, cfg, variant, n_w, has_w)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    n_elem = G * P * so
    loss = outs[0][0, 0] / n_elem
    dws = _unscale_grads(list(outs[1 : 1 + n_w]), cfg, variant)
    dbs = outs[1 + n_w :]
    flat = [d.reshape(G, -1) for d in dws] + [d.reshape(G, -1) for d in dbs]
    d_wb = (jnp.concatenate(flat, axis=-1) / n_elem).astype(wb.dtype)
    return loss, d_wb


# --------------------------------------------------------------------------
# Public entry with custom VJP
# --------------------------------------------------------------------------
def _resolve_interpret(interpret):
    if interpret is None:
        # Pallas TPU kernels only compile on TPU; interpret elsewhere so the
        # same user code runs on CPU (tests, debugging).
        return jax.default_backend() == "cpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def shapenet_grouped_fused(
    wb: jnp.ndarray,
    x: jnp.ndarray,
    cfg: ShapeNetConfig,
    variant: str = "siren",
    interpret: bool = None,
):
    """Drop-in fused replacement for :func:`shapenet_grouped`.

    Args match the XLA path: ``wb [G, po]``, ``x [G, P, si]`` ->
    ``[G, P, so]``. Falls back to the XLA path when the config is
    unsupported (see :func:`fused_supported`).
    """
    if not fused_supported(cfg, variant, x.shape[1]):
        return shapenet_grouped(wb, x, cfg, variant)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    return _fwd_pallas(
        _prescale(ws, cfg, variant), bs, x, cfg, variant,
        _resolve_interpret(interpret),
    )


def _fused_fwd(wb, x, cfg, variant, interpret):
    out = shapenet_grouped_fused(wb, x, cfg, variant, interpret)
    return out, (wb, x)


def _fused_bwd(cfg, variant, interpret, resid, g_out):
    wb, x = resid
    if not fused_supported(cfg, variant, x.shape[1]):
        # Differentiate the XLA path directly.
        _, vjp = jax.vjp(lambda wb, x: shapenet_grouped(wb, x, cfg, variant), wb, x)
        return vjp(g_out)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    dws, dbs, dx = _bwd_pallas(
        _prescale(ws, cfg, variant), bs, x, g_out, cfg, variant,
        _resolve_interpret(interpret),
    )
    dws = _unscale_grads(dws, cfg, variant)
    # Re-flatten the segment grads into the wb layout:
    # [W_first | W_hidden... | W_last | b_first | b_hidden... | b_last].
    G = wb.shape[0]
    flat = [d.reshape(G, -1) for d in dws] + [d.reshape(G, -1) for d in dbs]
    d_wb = jnp.concatenate(flat, axis=-1).astype(wb.dtype)
    return d_wb, dx.astype(x.dtype)


shapenet_grouped_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# Fused training kernel for NIF-linear: u = phi(x) . a(t) + bias.
#
# The phi trunk is a SHARED-weight SIREN chain (trainable params, identical
# for every group) ending in a linear bottleneck of width so*K; the
# contraction with the per-group latent a(t) and the output bias are the
# only per-group/per-model pieces (reference nif/model.py:1240-1269). This
# kernel runs trunk forward + contraction + weighted MSE + full backward in
# one pallas_call: phi (the largest intermediate, [P, so*K]) never touches
# HBM, and the trunk matmuls run exactly once. Grid is (G, P-tiles); trunk
# weight/grad blocks map to (0, .) so grads accumulate across ALL grid
# steps, while d_a accumulates per group over its P-tiles.
# --------------------------------------------------------------------------
def _pick_tile_linear(P: int, trunk_cfg: ShapeNetConfig, itemsize: int = 2):
    """Point-tile for the linear train kernel: residuals are the sine-chain
    ins/zs PLUS phi and d_phi ([TP, so*K] each), backward du/dz
    temporaries, and the double-buffered x/target tiles (whose narrow lane
    dims Mosaic pads to 128) — all held at the COMPUTE dtype. Measured on
    v5e: the width-128 depth-2 bf16 trunk runs 30% faster at TP=2048
    (258.8 vs 199.3 Mpts/s) and compiles (the old always-f32 accounting
    capped it at 1024); latent-256 bf16 @2048 validated too. f32 keeps the
    conservative picks."""
    n_sine = 1 + (2 if trunk_cfg.use_resblock else 1) * trunk_cfg.nlayers
    bytes_per_row = (
        2 * n_sine * trunk_cfg.units  # ins + zs
        + 2 * trunk_cfg.output_dim    # phi + d_phi
        + 2 * trunk_cfg.units         # du / dz live pair
        + 4 * 128                     # padded x/target double buffers
    ) * max(itemsize, 2)
    hard_cap = 2048 if itemsize <= 2 else 1024
    cap = max(min(hard_cap, _VMEM_RESIDUAL_BUDGET // max(bytes_per_row, 1)), 8)
    for tp in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if tp <= cap and P % tp == 0:
            return tp
    return None


def linear_fused_unsupported_reason(trunk_cfg: ShapeNetConfig, so: int,
                                    P: int) -> Optional[str]:
    """Why the fused NIF-linear train kernel can NOT handle this config
    (None = it can); see :func:`fused_unsupported_reason`."""
    if so > 8:
        return f"output_dim={so} > 8 (per-output contraction loop is static)"
    if trunk_cfg.output_dim % so != 0:
        return "trunk output width is not a multiple of output_dim"
    if trunk_cfg.units < 8:
        return f"units={trunk_cfg.units} < 8 (tiny widths gain nothing from the kernel)"
    if _pick_tile_linear(P, trunk_cfg) is None:
        return (f"points-per-group P={P} is not divisible by any supported "
                f"point tile — pad P to a multiple of 256")
    if trunk_cfg.connectivity != "full":
        return f"trunk connectivity={trunk_cfg.connectivity!r}"
    return None


def linear_fused_supported(trunk_cfg: ShapeNetConfig, so: int, P: int) -> bool:
    """Whether the fused NIF-linear train kernel handles this config.

    ``trunk_cfg`` is the phi trunk viewed as a full-connectivity chain
    (output_dim = so * latent_dim); ``so`` stays small (it's the field's
    component count), so the per-output contraction loop is static."""
    return linear_fused_unsupported_reason(trunk_cfg, so, P) is None


def _linear_train_kernel(cfg: ShapeNetConfig, n_w: int, so: int, K: int,
                         has_w: bool, *refs):
    # in refs:  w_0.. (trunk, shared), b_0.., a [1,1,K], bias [1,1,so],
    #           x, target, (weight)
    # out refs: loss [1,1], dw_0.., db_0.., d_a [1,1,K], d_bias [1,1,so]
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    a_ref = refs[2 * n_w]
    bias_ref = refs[2 * n_w + 1]
    x_ref = refs[2 * n_w + 2]
    t_ref = refs[2 * n_w + 3]
    ofs = 2 * n_w + 4
    w_ref = refs[ofs] if has_w else None
    ofs += 1 if has_w else 0
    loss_ref = refs[ofs]
    dw_refs = refs[ofs + 1 : ofs + 1 + n_w]
    db_refs = refs[ofs + 1 + n_w : ofs + 1 + 2 * n_w]
    da_ref = refs[ofs + 1 + 2 * n_w]
    dbias_ref = refs[ofs + 2 + 2 * n_w]

    x = x_ref[0]
    phi, ins, dacts = _forward_layers(x, ws, bs, cfg, "siren", save=True)
    a_row = a_ref[0].astype(jnp.float32)  # [1, K]
    bias_row = bias_ref[0].astype(jnp.float32)  # [1, so]

    # Contraction u[p, o] = phi[p, o*K:(o+1)*K] . a + bias[o] — so is tiny,
    # so each output component is a VPU multiply + lane reduction (the MXU
    # would pad the K contraction to a full pass per component).
    blocks = [phi[:, o * K : (o + 1) * K] for o in range(so)]
    cols = [
        jnp.sum(blk * a_row, axis=1, keepdims=True) for blk in blocks
    ]
    u = (jnp.concatenate(cols, axis=1) if so > 1 else cols[0]) + bias_row
    err = u - t_ref[0].astype(jnp.float32)  # [TP, so]
    if has_w:
        wgt = w_ref[0].astype(jnp.float32)  # [TP, 1] (weights fed as [G,P,1])
        loss_part = jnp.sum(jnp.square(err) * wgt)
        go = 2.0 * err * wgt  # caller divides by N
    else:
        loss_part = jnp.sum(jnp.square(err))
        go = 2.0 * err

    d_bias = jnp.sum(go, axis=0, keepdims=True)  # [1, so]
    d_a = None
    d_phi_cols = []
    for o, blk in enumerate(blocks):
        go_o = go[:, o : o + 1]  # [TP, 1]
        contrib = jnp.sum(blk * go_o, axis=0, keepdims=True)  # [1, K]
        d_a = contrib if d_a is None else d_a + contrib
        d_phi_cols.append(go_o * a_row)  # outer product, [TP, K]
    d_phi = (
        jnp.concatenate(d_phi_cols, axis=1) if so > 1 else d_phi_cols[0]
    )
    dws, dbs, _ = _backward_chain(d_phi, ws, ins, dacts, cfg, "siren",
                                  x.dtype, need_dx=False)

    g = pl.program_id(0)
    p = pl.program_id(1)
    first = jnp.logical_and(g == 0, p == 0)

    @pl.when(first)
    def _init():
        loss_ref[0, 0] = loss_part
        for r, v in zip(dw_refs, dws):
            r[0] = v.astype(r.dtype)
        for r, v in zip(db_refs, dbs):
            r[0] = v[None, :].astype(r.dtype)
        dbias_ref[0] = d_bias.astype(dbias_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _accum():
        loss_ref[0, 0] = loss_ref[0, 0] + loss_part
        for r, v in zip(dw_refs, dws):
            r[0] = r[0] + v.astype(r.dtype)
        for r, v in zip(db_refs, dbs):
            r[0] = r[0] + v[None, :].astype(r.dtype)
        dbias_ref[0] = dbias_ref[0] + d_bias.astype(dbias_ref.dtype)

    @pl.when(p == 0)
    def _init_da():
        da_ref[0] = d_a.astype(da_ref.dtype)

    @pl.when(p != 0)
    def _accum_da():
        da_ref[0] = da_ref[0] + d_a.astype(da_ref.dtype)


def niflinear_mse_grads(
    ws,
    bs,
    a: jnp.ndarray,
    bias: jnp.ndarray,
    x: jnp.ndarray,
    target: jnp.ndarray,
    trunk_cfg: ShapeNetConfig,
    so: int,
    weight: jnp.ndarray = None,
    interpret: bool = None,
):
    """Fused NIF-linear train core (reference semantics nif/model.py:1240-1269
    under weighted MSE): returns ``(loss, d_ws, d_bs, d_a, d_bias)``.

    ``ws``/``bs``: trunk layer weights/biases in chain order (shared across
    groups; the bottleneck of width so*K is the last entry). ``a [G, K]``
    per-group latents, ``bias [so]``, ``x [G, P, si]``, ``target [G, P, so]``,
    ``weight [G, P]`` optional. All grads are f32 sums divided by N = G*P*so
    (matching ``mean``). Not differentiable — use in a hand-assembled step.
    """
    G, P, si = x.shape
    K = a.shape[-1]
    assert trunk_cfg.output_dim == so * K
    interpret = _resolve_interpret(interpret)
    TP = _pick_tile_linear(P, trunk_cfg, itemsize=x.dtype.itemsize)
    if TP is None:
        raise ValueError(
            f"niflinear_mse_grads: no point tile divides P={P} "
            f"(P must be a multiple of 8; check linear_fused_supported first)"
        )
    n_w = len(ws)
    grid = (G, P // TP)

    ws = _prescale(list(ws), trunk_cfg, "siren")
    ws3 = [w[None] for w in ws]  # [1, n_in, n_out]
    bs3 = [b[None, None, :] for b in bs]  # [1, 1, n]
    a3 = a[:, None, :]  # [G, 1, K]
    bias3 = bias[None, None, :]  # [1, 1, so]

    shared = lambda shp: pl.BlockSpec(
        (1,) + shp, lambda g, p: (0,) * (len(shp) + 1), memory_space=pltpu.VMEM
    )
    in_specs = (
        [shared(w.shape[1:]) for w in ws3]
        + [shared(b.shape[1:]) for b in bs3]
        + [pl.BlockSpec((1, 1, K), lambda g, p: (g, 0, 0), memory_space=pltpu.VMEM),
           shared((1, so)),
           pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((1, TP, so), lambda g, p: (g, p, 0), memory_space=pltpu.VMEM)]
    )
    args = [*ws3, *bs3, a3, bias3, x, target.astype(x.dtype)]
    has_w = weight is not None
    if has_w:
        # [G, P, 1] — see shapenet_mse_grads: Mosaic block-shape rule.
        in_specs.append(
            pl.BlockSpec((1, TP, 1), lambda g, p: (g, p, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(weight.astype(x.dtype)[..., None])

    out_specs = (
        [pl.BlockSpec((1, 1), lambda g, p: (0, 0), memory_space=pltpu.SMEM)]
        + [shared(w.shape[1:]) for w in ws3]
        + [shared(b.shape[1:]) for b in bs3]
        + [pl.BlockSpec((1, 1, K), lambda g, p: (g, 0, 0), memory_space=pltpu.VMEM),
           shared((1, so))]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws3]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs3]
        + [jax.ShapeDtypeStruct((G, 1, K), jnp.float32),
           jax.ShapeDtypeStruct((1, 1, so), jnp.float32)]
    )

    kernel = functools.partial(_linear_train_kernel, trunk_cfg, n_w, so, K, has_w)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    n_elem = G * P * so
    loss = outs[0][0, 0] / n_elem
    d_ws = [
        d[0] / n_elem
        for d in _unscale_grads(list(outs[1 : 1 + n_w]), trunk_cfg, "siren")
    ]
    d_bs = [d[0, 0] / n_elem for d in outs[1 + n_w : 1 + 2 * n_w]]
    d_a = outs[1 + 2 * n_w][:, 0, :] / n_elem
    d_bias = outs[2 + 2 * n_w][0, 0] / n_elem
    return loss, d_ws, d_bs, d_a, d_bias


# --------------------------------------------------------------------------
# Fused forward + Jacobian kernel: y and du/dx in ONE pass.
#
# The grouped derivative path (ops.derivatives.output_and_jacobian_grouped,
# reference JacobianLayer semantics nif/layers/gradient.py:207-231)
# differentiates a chain with tiny input (si = 1-3 coordinates) and tiny
# output (so = 1-3 fields). Under XLA the sine AND cosine epilogues break
# fusion exactly like the forward's (every derivative intermediate
# round-trips HBM); here the whole thing stays VMEM-resident, and the
# cheaper differentiation MODE is chosen per config: so < si runs so
# reverse cotangent sweeps over the saved chain (_jac_rev_layers), else si
# forward tangent streams ride the chain (_fwd_jac_layers). The cosine
# reuses the TRUE derivative of the forward polynomial in bf16, so the
# Jacobian is exact for the function computed.
# --------------------------------------------------------------------------
def _pick_tile_jac(P: int, cfg: ShapeNetConfig, si: int, itemsize: int):
    """Point tile for the fwd+jac kernel: holds ~3 live activations PLUS
    si tangent streams per layer boundary (compute dtype). The f32 pad
    surcharge counts the double-buffered narrow in/out tiles (x, out, and
    one jac block per stream, each lane-padded to 128): w64 so=2/si=1
    measured 17.15M scoped at TP=2048 under the old 4-buffer charge."""
    pad_extra = 2 * (2 + 2 * (1 + si)) * 128 * itemsize if itemsize > 2 else 0
    bytes_per_row = 3 * (1 + si) * cfg.units * 4 + pad_extra
    budget = (_VMEM_BF16_BACKWARD_BUDGET if itemsize <= 2
              else _VMEM_RESIDUAL_BUDGET)
    cap = max(min(4096, budget // max(bytes_per_row, 1)), 8)
    for tp in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if tp <= cap and P % tp == 0:
            return tp
    return None


def fwd_jac_unsupported_reason(cfg: ShapeNetConfig, variant: str, P: int,
                               si: int) -> Optional[str]:
    base = fused_unsupported_reason(cfg, variant, P)
    if base is not None:
        return base
    rev = cfg.output_dim < si
    tile = (_pick_tile(P, cfg, backward=True, itemsize=2) if rev
            else _pick_tile_jac(P, cfg, si, 2))
    if tile is None:
        return (f"P={P} not divisible by any fwd+jac point tile — pad P "
                f"to a multiple of 256")
    return None


def fwd_jac_supported(cfg: ShapeNetConfig, variant: str, P: int,
                      si: int) -> bool:
    return fwd_jac_unsupported_reason(cfg, variant, P, si) is None


def _fwd_jac_layers(x, ws, bs, cfg: ShapeNetConfig, variant: str,
                    save: bool = False):
    """Forward chain + si tangent streams. Returns (out [TP, so],
    jac_flat [TP, si*so], saved) with jac_flat[:, k*so + j] = d out_j / d x_k.

    The value row-block and the si tangent row-blocks are STACKED into one
    ``[(1+si)*TP, n]`` operand so each layer runs ONE large MXU matmul
    instead of (1+si) small ones (measured: the stacked form and the
    per-tangent form are within a few % at w128 — the chain is bound by
    the tangent epilogue traffic, not matmul count — but the stacked form
    is the one whose backward also runs as single large matmuls, see
    :func:`_sobolev_backward_chain`).

    With ``save=True`` also returns the residuals the Sobolev backward
    needs: ``saved = (z0, S_list, Z_list)`` where ``S_list`` holds the
    stacked input of every hidden matmul app plus the final stacked
    activations (input to the last matmul), and ``Z_list`` the raw stacked
    matmul results per app — nothing is recomputed in the backward.
    """
    l = cfg.nlayers
    si = x.shape[-1]
    TP = x.shape[0]
    cdt = x.dtype
    sin_fn, dsin_fn = _trig_for(cdt)

    def lift(u):
        return u.astype(cdt)

    if variant == "siren":
        act_fn, dact_fn = sin_fn, dsin_fn
    else:
        act_fn, dact_fn = _act_pair(cfg.activation)

    def blocks(S):
        # value block + si tangent blocks of the stacked matrix
        return [S[k * TP:(k + 1) * TP] for k in range(1 + si)]

    def stack(parts):
        return jnp.concatenate(parts, axis=0)

    S_list: List[Any] = []
    Z_list: List[Any] = []

    # first layer (weights pre-scaled by omega for siren): seed tangents
    # d u / d x_k = act'(z0) * W0[k, :]
    z0 = _first_matmul(x, ws[0]) + bs[0].astype(jnp.float32)
    u = act_fn(z0)
    g0 = dact_fn(z0)
    S = stack([u] + [g0 * ws[0][k, :].astype(jnp.float32)[None, :]
                     for k in range(si)])

    def app(S, w, b):
        """One stacked matmul app; saves (S_in, Z) for the backward."""
        Z = _matmul(lift(S), w)
        if save:
            S_list.append(S)
            Z_list.append(Z)
        z = Z[:TP] + b.astype(jnp.float32)
        return Z, z

    if variant == "siren" and cfg.use_resblock:
        for i in range(l):
            u_blk, *tans = blocks(S)
            Z1, z1 = app(S, ws[1 + 2 * i], bs[1 + 2 * i])
            g1 = dact_fn(z1)
            Sh = stack([act_fn(z1)] + [g1 * zk for zk in blocks(Z1)[1:]])
            Z2, z2 = app(Sh, ws[2 + 2 * i], bs[2 + 2 * i])
            g2 = dact_fn(z2)
            S = stack(
                [0.5 * (u_blk + act_fn(z2))]
                + [0.5 * (t + g2 * zk)
                   for t, zk in zip(tans, blocks(Z2)[1:])]
            )
    elif variant == "siren":
        for i in range(l):
            Z, z = app(S, ws[1 + i], bs[1 + i])
            g = dact_fn(z)
            S = stack([act_fn(z)] + [g * zk for zk in blocks(Z)[1:]])
    else:
        for i in range(l):
            u_blk, *tans = blocks(S)
            Z, z = app(S, ws[1 + i], bs[1 + i])
            g = dact_fn(z)
            # simple shortcut (ops.shapenet vanilla): u' = act(z) + u
            S = stack([act_fn(z) + u_blk]
                      + [g * zk + t for t, zk in zip(tans, blocks(Z)[1:])])

    if save:
        S_list.append(S)
    O = _last_matmul(lift(S), ws[-1])  # [(1+si)*TP, so] in one pass
    out = O[:TP] + bs[-1].astype(jnp.float32)
    jac_cols = blocks(O)[1:]  # each [TP, so]; col k holds d out / d x_k
    saved = (z0, S_list, Z_list) if save else None
    return out, jac_cols, saved


def _fwd_jac_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, si: int,
                    *refs):
    # outputs: out [TP, so] + si per-input-column jac blocks [TP, so]
    # (separate refs — Mosaic's tpu.concatenate cannot merge lane-sliced
    # narrow vectors with mismatched lane offsets; per-stream refs avoid
    # narrow lane shuffles entirely, found at real-compile time)
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    out_ref = refs[2 * n_w + 1]
    jac_refs = refs[2 * n_w + 2: 2 * n_w + 2 + si]
    out, jac_cols, _ = _fwd_jac_layers(x_ref[0], ws, bs, cfg, variant)
    out_ref[0] = out.astype(out_ref.dtype)
    for r, c in zip(jac_refs, jac_cols):
        r[0] = c.astype(r.dtype)


def _jac_rev_layers(x, ws, bs, cfg: ShapeNetConfig, variant: str):
    """(out, [jac_j [TP, si] per output j]) via REVERSE-mode: forward
    chain with saved pre-activations, then one dx-only cotangent sweep
    per output column.

    For so < si this does strictly less work than the tangent form
    (:func:`_fwd_jac_layers`): so cotangent streams instead of si tangent
    streams, one multiply per layer per stream, and no stacking shuffles —
    the flagship so=1 case runs a single ``[TP, n]`` stream whose cost is
    one extra matmul chain (measured 310M pts/s bf16 at w128 si=3 — 7.3x
    the XLA jacfwd path). No weight/bias gradients are formed; this is
    the JacobianLayer evaluation path only."""
    l = cfg.nlayers
    TP, si = x.shape
    cdt = x.dtype
    so = ws[-1].shape[-1]

    def lift(u):
        return u.astype(cdt)

    out, _ins, dacts = _forward_layers(x, ws, bs, cfg, variant, save=True)
    # One f32 lift per layer, shared by every output column's sweep (the
    # round-3 form re-ran the derivative polynomial per column).
    d1s = [d.astype(jnp.float32) for d in dacts]
    cols = []
    for j in range(so):
        # cotangent of out_j at u_last is the j-th last-layer weight
        # column, materialized [1, n] via a one-hot matmul — slicing the
        # [n, so] lane dim and transposing poisons downstream layouts
        # (measured: the whole sweep spills ~5x the expected scoped vmem)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, so), 1) == j
                  ).astype(jnp.float32)
        du = _mmT_nt(onehot, ws[-1].astype(jnp.float32))
        if variant == "siren" and cfg.use_resblock:
            for i in range(l - 1, -1, -1):
                dz2 = 0.5 * du * d1s[2 + 2 * i]
                dh = _mmT_nt(lift(dz2), ws[2 + 2 * i]).astype(jnp.float32)
                dz1 = dh * d1s[1 + 2 * i]
                du = 0.5 * du + _mmT_nt(lift(dz1), ws[1 + 2 * i]).astype(
                    jnp.float32)
        elif variant == "siren":
            for i in range(l - 1, -1, -1):
                dz = du * d1s[1 + i]
                du = _mmT_nt(lift(dz), ws[1 + i]).astype(jnp.float32)
        else:
            for i in range(l - 1, -1, -1):
                dz = du * d1s[1 + i]
                du = du + _mmT_nt(lift(dz), ws[1 + i]).astype(jnp.float32)
        dz0 = du * d1s[0]
        cols.append(_mmT_nt(lift(dz0), ws[0]))  # [TP, si]
    return out, cols


def _fwd_jac_rev_kernel(cfg: ShapeNetConfig, variant: str, n_w: int,
                        so: int, *refs):
    # outputs: out [TP, so] + so per-output-row jac blocks [TP, si]
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    out_ref = refs[2 * n_w + 1]
    jac_refs = refs[2 * n_w + 2: 2 * n_w + 2 + so]
    out, cols = _jac_rev_layers(x_ref[0], ws, bs, cfg, variant)
    out_ref[0] = out.astype(out_ref.dtype)
    for r, c in zip(jac_refs, cols):
        r[0] = c.astype(r.dtype)


def shapenet_fwd_jac(
    wb: jnp.ndarray,
    x: jnp.ndarray,
    cfg: ShapeNetConfig,
    variant: str = "siren",
    interpret: bool = None,
):
    """Fused (y, dy/dx) for the grouped ShapeNet chain.

    ``wb [G, po]``, ``x [G, P, si]`` -> ``y [G, P, so]``,
    ``jac [G, P, so, si]``. Jacobian semantics match
    ``output_and_jacobian_grouped``'s forward-mode path (reference
    nif/layers/gradient.py:207-231); falls back to it implicitly when the
    config is unsupported — callers should check :func:`fwd_jac_supported`.

    Differentiation mode is picked by stream count: so < si runs
    reverse-mode (so cotangent sweeps over the saved chain,
    :func:`_jac_rev_layers`), otherwise forward-mode tangents ride the
    chain (:func:`_fwd_jac_layers`).
    """
    G, P, si = x.shape
    so = cfg.output_dim
    interpret = _resolve_interpret(interpret)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    ws = _prescale(ws, cfg, variant)
    rev = so < si
    TP = (_pick_tile(P, cfg, backward=True, itemsize=x.dtype.itemsize)
          if rev else _pick_tile_jac(P, cfg, si, x.dtype.itemsize))
    n_w = len(ws)
    grid = (G, P // TP)

    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]
    bs = [b[:, None, :] for b in bs]
    b_specs = [
        pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for b in bs
    ]
    x_spec = pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0),
                          memory_space=pltpu.VMEM)
    n_streams = so if rev else si
    blk_w = si if rev else so
    out_specs = [
        pl.BlockSpec((1, TP, so), lambda g, p: (g, p, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, TP, blk_w), lambda g, p: (g, p, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_streams)
    ]
    out_shapes = [jax.ShapeDtypeStruct((G, P, so), x.dtype)] + [
        jax.ShapeDtypeStruct((G, P, blk_w), x.dtype)
        for _ in range(n_streams)
    ]
    n = cfg.units
    l_mats = n_w - 2
    flops = 2 * G * P * (1 + n_streams) * (si * n + l_mats * n * n + n * so)
    kernel = functools.partial(
        _fwd_jac_rev_kernel if rev else _fwd_jac_kernel, cfg, variant, n_w,
        n_streams)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*w_specs, *b_specs, x_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * (2 + si * so),
            transcendentals=2 * G * P * n * (n_w - 1),
        ),
        interpret=interpret,
    )(*ws, *bs, x)
    out = outs[0]
    if rev:
        # stream j is jac row j: [G, P, si] each -> [G, P, so, si]
        jac = jnp.stack(outs[1:], axis=2)
    else:
        # stream k is jac column k: [G, P, so] each -> [G, P, so, si]
        jac = jnp.stack(outs[1:], axis=3)
    return out, jac


# --------------------------------------------------------------------------
# Fused Sobolev training kernel: fwd + jac + value/jacobian MSE + backward
# in ONE pass (tutorial-8 training at scale; reference loss semantics
# nif/layers/gradient.py:207-231 + examples_sobolev notebook).
#
# Reverse-mode through the forward-mode tangent chain: each stacked app
# S' = [act(z); act'(z)*Z_k] reverses as
#   dz  = du' * act'(z) + sum_k dt'_k * Z_k * act''(z)   (curvature term)
#   dZk = dt'_k * act'(z)
#   dW  = S_inT @ [dz; dZ_k...]     (ONE stacked MXU matmul)
#   dS  = [dz; dZ_k...] @ W^T       (ONE stacked MXU matmul)
# so the backward has the same large-matmul structure as the forward. The
# Jacobian cotangent is exact for the function the kernel computes (bf16
# path: polynomial sine and its true first/second derivatives).
# --------------------------------------------------------------------------
def _sobolev_backward_chain(D_out, ws, bs, x, z0, S_list, Z_list,
                            cfg: ShapeNetConfig, variant: str, cdt):
    """Reverse the stacked fwd+tangent chain. ``D_out [(1+si)*TP, so]`` is
    the stacked cotangent of the last matmul's output (value rows = dL/dy,
    tangent rows k = dL/djac column-block k). Returns (dws, dbs) in f32."""
    l = cfg.nlayers
    n_w = len(ws)
    si = x.shape[-1]
    TP = x.shape[0]
    if variant == "siren":
        _, d1, d2 = _trig2_for(cdt)
    else:
        _, d1, d2 = _act_triple(cfg.activation)

    def lift(u):
        return u.astype(cdt)

    def blocks(S):
        return [S[k * TP:(k + 1) * TP] for k in range(1 + si)]

    def stack(parts):
        return jnp.concatenate(parts, axis=0)

    dws: List[Any] = [None] * n_w
    dbs: List[Any] = [None] * n_w

    # last (linear) layer: O = S_last @ W_l (+ b_l on the value rows)
    S_last = S_list[-1]
    dws[-1] = _mmT_tn(lift(S_last), lift(D_out))
    dbs[-1] = jnp.sum(D_out[:TP], axis=0)
    dS = _mmT_nt(lift(D_out), ws[-1]).astype(jnp.float32)

    def app_bwd(dz_val, dts, S_in, Z, w, g):
        """Common tail of one app's reverse: weight/bias grads + dS."""
        D = stack([dz_val] + [dt_k * g for dt_k in dts])
        dw = _mmT_tn(lift(S_in), lift(D))
        db = jnp.sum(dz_val, axis=0)
        return dw, db, _mmT_nt(lift(D), w).astype(jnp.float32)

    if variant == "siren" and cfg.use_resblock:
        for i in range(l - 1, -1, -1):
            S_in, Z1 = S_list[2 * i], Z_list[2 * i]
            Sh, Z2 = S_list[2 * i + 1], Z_list[2 * i + 1]
            w1, b1 = ws[1 + 2 * i], bs[1 + 2 * i]
            w2, b2 = ws[2 + 2 * i], bs[2 + 2 * i]
            du_, *dts = blocks(dS)
            z2 = Z2[:TP] + b2.astype(jnp.float32)
            g2, h2 = d1(z2), d2(z2)
            dz2 = 0.5 * du_ * g2
            for dt_k, zk in zip(dts, blocks(Z2)[1:]):
                dz2 = dz2 + 0.5 * dt_k * zk * h2
            dws[2 + 2 * i], dbs[2 + 2 * i], dSh = app_bwd(
                dz2, [0.5 * dt_k for dt_k in dts], Sh, Z2, w2, g2)
            z1 = Z1[:TP] + b1.astype(jnp.float32)
            g1, h1 = d1(z1), d2(z1)
            dh, *dhts = blocks(dSh)
            dz1 = dh * g1
            for dt_k, zk in zip(dhts, blocks(Z1)[1:]):
                dz1 = dz1 + dt_k * zk * h1
            dws[1 + 2 * i], dbs[1 + 2 * i], dS_new = app_bwd(
                dz1, dhts, S_in, Z1, w1, g1)
            dS = dS_new + 0.5 * dS  # skip path
    elif variant == "siren":
        for i in range(l - 1, -1, -1):
            S_in, Z = S_list[i], Z_list[i]
            w, b = ws[1 + i], bs[1 + i]
            z = Z[:TP] + b.astype(jnp.float32)
            g, h = d1(z), d2(z)
            du_, *dts = blocks(dS)
            dz = du_ * g
            for dt_k, zk in zip(dts, blocks(Z)[1:]):
                dz = dz + dt_k * zk * h
            dws[1 + i], dbs[1 + i], dS = app_bwd(dz, dts, S_in, Z, w, g)
    else:
        for i in range(l - 1, -1, -1):
            S_in, Z = S_list[i], Z_list[i]
            w, b = ws[1 + i], bs[1 + i]
            z = Z[:TP] + b.astype(jnp.float32)
            g, h = d1(z), d2(z)
            du_, *dts = blocks(dS)
            dz = du_ * g
            for dt_k, zk in zip(dts, blocks(Z)[1:]):
                dz = dz + dt_k * zk * h
            dws[1 + i], dbs[1 + i], dS_new = app_bwd(dz, dts, S_in, Z, w, g)
            dS = dS_new + dS  # simple shortcut passes grads straight through
    # first layer: z0 = x @ W0 + b0; tangent seeds t_k = act'(z0)*W0[k,:]
    g0, h0 = d1(z0), d2(z0)
    du_, *dts = blocks(dS)
    dz0 = du_ * g0
    for k, dt_k in enumerate(dts):
        row = ws[0][k, :].astype(jnp.float32)[None, :]
        dz0 = dz0 + dt_k * row * h0
    dw0 = _mmT_tn(lift(x), lift(dz0))  # [si, n] value-stream term
    seed_rows = jnp.concatenate(
        [jnp.sum(dt_k * g0, axis=0, keepdims=True) for dt_k in dts], axis=0
    )  # d(t_k seed)/dW0[k,:]
    dws[0] = dw0 + seed_rows
    dbs[0] = jnp.sum(dz0, axis=0)
    return dws, dbs


def _pick_tile_sobolev(P: int, cfg: ShapeNetConfig, si: int, itemsize: int):
    """Point tile for the Sobolev train kernel: per point it holds the
    stacked residuals of every app (S_in + Z, each (1+si)*units), the final
    stacked activations, z0, two live stacked temporaries, and the padded
    x/target/jac-target input tiles — charged at f32 like the other train
    kernels."""
    n_apps = (2 if cfg.use_resblock else 1) * cfg.nlayers
    stacked = 2 * n_apps + 1 + 2  # S_list + Z_list + final S + live D/dS
    bytes_per_row = ((1 + si) * stacked * cfg.units + cfg.units) * 4 \
        + 8 * 128 * max(itemsize, 2)
    budget = (_VMEM_BF16_BACKWARD_BUDGET if itemsize <= 2
              else _VMEM_RESIDUAL_BUDGET)
    cap = max(min(2048, budget // max(bytes_per_row, 1)), 8)
    for tp in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if tp <= cap and P % tp == 0:
            return tp
    return None


def sobolev_fused_unsupported_reason(cfg: ShapeNetConfig, variant: str,
                                     P: int, si: int) -> Optional[str]:
    base = fused_unsupported_reason(cfg, variant, P)
    if base is not None:
        return base
    if _pick_tile_sobolev(P, cfg, si, 2) is None:
        return (f"P={P} not divisible by any Sobolev train tile — pad P "
                f"to a multiple of 256")
    return None


def sobolev_fused_supported(cfg: ShapeNetConfig, variant: str, P: int,
                            si: int) -> bool:
    return sobolev_fused_unsupported_reason(cfg, variant, P, si) is None


def _sobolev_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, si: int,
                    ky: float, kj: float, has_my: bool, has_mj: bool,
                    has_w: bool, *refs):
    # in refs:  w_0.., b_0.., x, target, jt_0..jt_{si-1}, (y_mask),
    #           (jac_mask_0..jac_mask_{si-1}), (weight)
    # out refs: loss_val [1,1], loss_jac [1,1], dw_0.., db_0..
    # Per-stream jac targets/masks — a single [TP, si*so] operand would
    # need narrow lane slices whose offsets Mosaic's concatenate cannot
    # reconcile (found at real-compile time).
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x = refs[2 * n_w][0]
    t_ref = refs[2 * n_w + 1]
    ofs = 2 * n_w + 2
    jt_refs = refs[ofs: ofs + si]
    ofs += si
    my_ref = refs[ofs] if has_my else None
    ofs += 1 if has_my else 0
    mj_refs = refs[ofs: ofs + si] if has_mj else None
    ofs += si if has_mj else 0
    w_ref = refs[ofs] if has_w else None
    ofs += 1 if has_w else 0
    lv_ref = refs[ofs]
    lj_ref = refs[ofs + 1]
    dw_refs = refs[ofs + 2: ofs + 2 + n_w]
    db_refs = refs[ofs + 2 + n_w: ofs + 2 + 2 * n_w]

    out, jac_cols, saved = _fwd_jac_layers(x, ws, bs, cfg, variant,
                                           save=True)
    err_y = out - t_ref[0].astype(jnp.float32)
    if has_my:
        err_y = err_y * my_ref[0][0].astype(jnp.float32)
    err_cols = []
    for k in range(si):
        e = jac_cols[k] - jt_refs[k][0].astype(jnp.float32)
        if has_mj:
            e = e * mj_refs[k][0][0].astype(jnp.float32)
        err_cols.append(e)
    if has_w:
        # per-point weight [TP, 1]: loss terms take w*err^2, cotangents
        # k*w*err — the masks above are 0/1 so folding them INTO err is
        # fine, but a general weight must stay outside the square.
        wgt = w_ref[0].astype(jnp.float32)
        lv = jnp.sum(jnp.square(err_y) * wgt)
        lj = sum(jnp.sum(jnp.square(e) * wgt) for e in err_cols)
        dout = ky * err_y * wgt
        D_out = jnp.concatenate(
            [dout] + [kj * e * wgt for e in err_cols], axis=0)
    else:
        lv = jnp.sum(jnp.square(err_y))
        lj = sum(jnp.sum(jnp.square(e)) for e in err_cols)
        dout = ky * err_y
        D_out = jnp.concatenate([dout] + [kj * e for e in err_cols], axis=0)
    z0, S_list, Z_list = saved
    dws, dbs = _sobolev_backward_chain(
        D_out, ws, bs, x, z0, S_list, Z_list, cfg, variant, x.dtype)

    g = pl.program_id(0)
    p = pl.program_id(1)
    first = jnp.logical_and(g == 0, p == 0)

    @pl.when(first)
    def _init_loss():
        lv_ref[0, 0] = lv
        lj_ref[0, 0] = lj

    @pl.when(jnp.logical_not(first))
    def _acc_loss():
        lv_ref[0, 0] = lv_ref[0, 0] + lv
        lj_ref[0, 0] = lj_ref[0, 0] + lj

    _write_grad_accum(dw_refs, db_refs, dws, dbs)


def shapenet_sobolev_grads(
    wb: jnp.ndarray,
    x: jnp.ndarray,
    target: jnp.ndarray,
    jac_target: jnp.ndarray,
    cfg: ShapeNetConfig,
    variant: str = "siren",
    w_value: float = 1.0,
    w_jac: float = 1.0,
    y_mask=None,
    jac_mask=None,
    weight: jnp.ndarray = None,
    interpret: bool = None,
):
    """Fused Sobolev train step core: ONE pallas_call computing forward +
    Jacobian + both MSE terms + the full backward.

    Loss = ``w_value * mean_sel(weight * (y - target)^2)
           + w_jac * mean_sel(weight * (jac - jac_target)^2)`` with means
    taken over the mask-selected entries (reference y_index/x_index
    subsetting).

    Args:
      wb ``[G, po]``; x ``[G, P, si]``; target ``[G, P, so]`` (zero-filled
      outside ``y_mask``); jac_target ``[G, P, si*so]`` in the kernel's
      flat layout (column ``k*so + j`` = d y_j / d x_k, zero-filled outside
      ``jac_mask``). ``y_mask [so]`` / ``jac_mask [si*so]`` are static 0/1
      numpy arrays (None = all entries). ``weight [G, P]`` (optional)
      multiplies both squared-error terms per point under a plain mean —
      the trainers' zero-weight padding convention stays exact.

    Returns ``(value_mse, jac_mse, d_wb)`` — the caller combines the total
    as ``w_value*value_mse + w_jac*jac_mse``; ``d_wb`` already includes
    both weights. Not differentiable — use inside a hand-assembled train
    step (see ``NIF.sobolev_value_and_grad``).
    """
    G, P, si = x.shape
    so = cfg.output_dim
    interpret = _resolve_interpret(interpret)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    ws = _prescale(ws, cfg, variant)
    bs3 = [b[:, None, :] for b in bs]
    TP = _pick_tile_sobolev(P, cfg, si, x.dtype.itemsize)
    n_w = len(ws)
    grid = (G, P // TP)

    n_y = G * P * (int(np.sum(y_mask)) if y_mask is not None else so)
    n_j = G * P * (int(np.sum(jac_mask)) if jac_mask is not None
                   else si * so)
    ky = 2.0 * float(w_value) / n_y
    kj = 2.0 * float(w_jac) / n_j

    wspec = lambda shp: pl.BlockSpec((1,) + shp, lambda g, p: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    bspec = lambda b: pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                                   memory_space=pltpu.VMEM)
    tspec = lambda w: pl.BlockSpec((1, TP, w), lambda g, p: (g, p, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = (
        [wspec(w.shape[1:]) for w in ws]
        + [bspec(b) for b in bs3]
        + [pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0),
                        memory_space=pltpu.VMEM),
           tspec(so)]
        + [tspec(so) for _ in range(si)]  # per-stream jac targets
    )
    # split the flat jac target into per-input-column [G, P, so] operands
    jt_cols = [jac_target[..., k * so:(k + 1) * so].astype(x.dtype)
               for k in range(si)]
    mask_args = []
    if y_mask is not None:
        m3 = jnp.asarray(y_mask, jnp.float32)[None, None, :]
        in_specs.append(
            pl.BlockSpec((1, 1, so), lambda g, p: (0, 0, 0),
                         memory_space=pltpu.VMEM))
        mask_args.append(m3)
    if jac_mask is not None:
        jm = np.asarray(jac_mask, np.float32)
        for k in range(si):
            m3 = jnp.asarray(jm[k * so:(k + 1) * so])[None, None, :]
            in_specs.append(
                pl.BlockSpec((1, 1, so), lambda g, p: (0, 0, 0),
                             memory_space=pltpu.VMEM))
            mask_args.append(m3)
    if weight is not None:
        # [G, P, 1]: a (1, TP) block of a [G, P] array violates Mosaic's
        # block-shape rule (2nd-minor must divide 8 or equal the dim).
        in_specs.append(
            pl.BlockSpec((1, TP, 1), lambda g, p: (g, p, 0),
                         memory_space=pltpu.VMEM))
        mask_args.append(weight.astype(x.dtype)[..., None])
    out_specs = (
        [pl.BlockSpec((1, 1), lambda g, p: (0, 0), memory_space=pltpu.SMEM),
         pl.BlockSpec((1, 1), lambda g, p: (0, 0), memory_space=pltpu.SMEM)]
        + [wspec(w.shape[1:]) for w in ws]
        + [bspec(b) for b in bs3]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32),
         jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs3]
    )

    n = cfg.units
    l_mats = n_w - 2
    chain_flops = 2 * G * P * (1 + si) * (
        si * n + l_mats * n * n + n * so)
    kernel = functools.partial(_sobolev_kernel, cfg, variant, n_w, si,
                               ky, kj,
                               y_mask is not None, jac_mask is not None,
                               weight is not None)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * chain_flops,
            bytes_accessed=x.size * x.dtype.itemsize * (2 + si * so),
            transcendentals=4 * G * P * n * (n_w - 1),
        ),
        interpret=interpret,
    )(*ws, *bs3, x, target.astype(x.dtype), *jt_cols, *mask_args)
    value_mse = outs[0][0, 0] / n_y
    jac_mse = outs[1][0, 0] / n_j
    dws = _unscale_grads(list(outs[2: 2 + n_w]), cfg, variant)
    dbs = outs[2 + n_w:]
    flat = [d.reshape(G, -1) for d in dws] + [d.reshape(G, -1) for d in dbs]
    d_wb = jnp.concatenate(flat, axis=-1).astype(wb.dtype)
    return value_mse, jac_mse, d_wb


# --------------------------------------------------------------------------
# Fused SECOND-ORDER Sobolev training kernel: fwd + jac + hessian + all
# three MSE terms + the full backward in ONE pass (VERDICT r4 item 1 —
# hessian-target training ran nested-jacfwd XLA at 5.0M pts/s, 12.6x slower
# than the first-order fused step on ~3x the FLOPs; reference semantics:
# HessianLayer, nif/layers/gradient.py:234-261).
#
# Forward-over-forward: alongside the value row-block and the si
# first-order tangent blocks, si*(si+1)/2 SECOND-order tangent blocks ride
# the same stacked matmuls (x enters linearly, so the unique symmetric
# pairs are the complete second-order state). Per app S' blocks:
#   value:  u' = f(z)
#   t'_k  = f'(z) * Zt_k
#   h'_jk = f'(z) * Zh_jk + f''(z) * Zt_j * Zt_k
# The backward reverses the whole stacked chain (reverse over forward over
# forward), which touches f''':
#   dz    = du*f' + sum_k dt_k*Zt_k*f'' + sum_a dh_a*(Zh_a*f'' + Zt_j*Zt_k*f''')
#   dZt_k = dt_k*f' + sum_{a∋k} dh_a*f''*Zt_partner   (2x on the diagonal)
#   dZh_a = dh_a*f'
# and keeps the one-large-matmul structure: dW = S_inT @ [dz; dZt; dZh],
# dS = [dz; dZt; dZh] @ W^T. bf16 compute uses the polynomial sine and its
# TRUE first/second/third derivatives, so every gradient is exact for the
# function the kernel computes. Sine chains only (f''' of the vanilla
# activations buys nothing the XLA path doesn't already cover).
#
# Hessian-MSE convention: the XLA reference path compares the FULL
# [so, si, si] hessian; the kernel carries unique pairs with multiplicity
# (2 off-diagonal, 1 diagonal), which matches the full mean exactly for
# symmetric targets. Asymmetric targets differ by a params-independent
# constant sum((t_jk - t_kj)^2)/2 per pair — the wrapper adds it outside
# the kernel, so losses agree bit-for-bit in expectation either way.
# --------------------------------------------------------------------------
def _hess_pairs(si: int):
    """Unique symmetric second-order index pairs, (j <= k) row-major."""
    return [(j, k) for j in range(si) for k in range(j, si)]


def _hess_fwd_layers(x, ws, bs, cfg: ShapeNetConfig, variant: str,
                     save: bool = False):
    """Forward chain + si first-order + n_pairs second-order tangent
    streams, all stacked into ONE ``[(1+si+np)*TP, n]`` operand per
    matmul. Returns (out [TP, so], jac_cols (si x [TP, so]), hess_cols
    (np x [TP, so]), saved) with saved = (z0, S_list, Z_list) exactly like
    :func:`_fwd_jac_layers` — the backward recomputes nothing."""
    l = cfg.nlayers
    si = x.shape[-1]
    TP = x.shape[0]
    cdt = x.dtype
    pairs = _hess_pairs(si)
    np_ = len(pairs)
    nst = 1 + si + np_
    f, d1, d2, _ = _trig3_for(cdt)

    def lift(u):
        return u.astype(cdt)

    def blocks(S):
        return [S[k * TP:(k + 1) * TP] for k in range(nst)]

    def stack(parts):
        return jnp.concatenate(parts, axis=0)

    S_list: List[Any] = []
    Z_list: List[Any] = []

    # first layer: z0 = x @ W0 + b0 is LINEAR in x, so the tangent seeds
    # are rows of W0 and the second-order seeds are f''(z0)-scaled row
    # products — no second-order term from the matmul itself.
    z0 = _first_matmul(x, ws[0]) + bs[0].astype(jnp.float32)
    g0, h0 = d1(z0), d2(z0)
    w0rows = [ws[0][k, :].astype(jnp.float32)[None, :] for k in range(si)]
    S = stack(
        [f(z0)]
        + [g0 * w0rows[k] for k in range(si)]
        + [h0 * (w0rows[j] * w0rows[k]) for (j, k) in pairs]
    )

    def app(S, w, b):
        Z = _matmul(lift(S), w)
        if save:
            S_list.append(S)
            Z_list.append(Z)
        z = Z[:TP] + b.astype(jnp.float32)
        return Z, z

    def epilogue(Z, z):
        """Apply the stream epilogues after one matmul app."""
        zb = blocks(Z)
        g, h = d1(z), d2(z)
        t_new = [g * zb[1 + k] for k in range(si)]
        h_new = [
            g * zb[1 + si + a] + h * zb[1 + j] * zb[1 + k]
            for a, (j, k) in enumerate(pairs)
        ]
        return [f(z)] + t_new + h_new

    if variant == "siren" and cfg.use_resblock:
        for i in range(l):
            in_blocks = blocks(S)
            Z1, z1 = app(S, ws[1 + 2 * i], bs[1 + 2 * i])
            Sh = stack(epilogue(Z1, z1))
            Z2, z2 = app(Sh, ws[2 + 2 * i], bs[2 + 2 * i])
            out_blocks = epilogue(Z2, z2)
            S = stack([0.5 * (a + b_)
                       for a, b_ in zip(in_blocks, out_blocks)])
    elif variant == "siren":
        for i in range(l):
            Z, z = app(S, ws[1 + i], bs[1 + i])
            S = stack(epilogue(Z, z))
    else:
        raise ValueError(
            "hessian kernel supports sine chains only — see "
            "hessian_fused_unsupported_reason"
        )

    if save:
        S_list.append(S)
    O = _last_matmul(lift(S), ws[-1])
    out = O[:TP] + bs[-1].astype(jnp.float32)
    ob = [O[k * TP:(k + 1) * TP] for k in range(nst)]
    jac_cols = ob[1:1 + si]
    hess_cols = ob[1 + si:]
    saved = (z0, S_list, Z_list) if save else None
    return out, jac_cols, hess_cols, saved


def _hessian_backward_chain(D_out, ws, bs, x, z0, S_list, Z_list,
                            cfg: ShapeNetConfig, variant: str, cdt):
    """Reverse the stacked value+tangent+second-order chain.

    ``D_out [(1+si+np)*TP, so]``: value rows = dL/dy, tangent rows k =
    dL/djac col k, second-order rows a = dL/dhess pair a (multiplicity
    already folded in by the kernel). Returns (dws, dbs) in f32."""
    l = cfg.nlayers
    n_w = len(ws)
    si = x.shape[-1]
    TP = x.shape[0]
    pairs = _hess_pairs(si)
    np_ = len(pairs)
    nst = 1 + si + np_
    _, d1, d2, d3 = _trig3_for(cdt)

    def lift(u):
        return u.astype(cdt)

    def blocks(S):
        return [S[k * TP:(k + 1) * TP] for k in range(nst)]

    def stack(parts):
        return jnp.concatenate(parts, axis=0)

    dws: List[Any] = [None] * n_w
    dbs: List[Any] = [None] * n_w

    S_last = S_list[-1]
    dws[-1] = _mmT_tn(lift(S_last), lift(D_out))
    dbs[-1] = jnp.sum(D_out[:TP], axis=0)
    dS = _mmT_nt(lift(D_out), ws[-1]).astype(jnp.float32)

    def app_bwd(dS_in, S_in, Z, w, b):
        """Reverse one (matmul + stream epilogues) app given the cotangent
        of ITS OUTPUT blocks. Returns (dw, db, dS of its input)."""
        z = Z[:TP] + b.astype(jnp.float32)
        g, h, q = d1(z), d2(z), d3(z)
        zb = blocks(Z)
        du, dts, dhs = dS_in[0], dS_in[1:1 + si], dS_in[1 + si:]
        # dz collects every epilogue's z-sensitivity
        dz = du * g
        for k in range(si):
            dz = dz + dts[k] * zb[1 + k] * h
        dZt = [dts[k] * g for k in range(si)]
        dZh = []
        for a, (j, k) in enumerate(pairs):
            dh_a = dhs[a]
            zh = zb[1 + si + a]
            dz = dz + dh_a * (zh * h + zb[1 + j] * zb[1 + k] * q)
            dZh.append(dh_a * g)
            # product-rule back into the first-order streams
            if j == k:
                dZt[j] = dZt[j] + 2.0 * dh_a * h * zb[1 + j]
            else:
                dZt[j] = dZt[j] + dh_a * h * zb[1 + k]
                dZt[k] = dZt[k] + dh_a * h * zb[1 + j]
        D = stack([dz] + dZt + dZh)
        dw = _mmT_tn(lift(S_in), lift(D))
        db = jnp.sum(dz, axis=0)
        return dw, db, _mmT_nt(lift(D), w).astype(jnp.float32)

    if variant == "siren" and cfg.use_resblock:
        for i in range(l - 1, -1, -1):
            S_in, Z1 = S_list[2 * i], Z_list[2 * i]
            Sh, Z2 = S_list[2 * i + 1], Z_list[2 * i + 1]
            dS_b = blocks(dS)
            half = [0.5 * d for d in dS_b]
            dws[2 + 2 * i], dbs[2 + 2 * i], dSh = app_bwd(
                half, Sh, Z2, ws[2 + 2 * i], bs[2 + 2 * i])
            dws[1 + 2 * i], dbs[1 + 2 * i], dS_new = app_bwd(
                blocks(dSh), S_in, Z1, ws[1 + 2 * i], bs[1 + 2 * i])
            dS = dS_new + 0.5 * dS  # skip path on every stream
    else:
        for i in range(l - 1, -1, -1):
            S_in, Z = S_list[i], Z_list[i]
            dws[1 + i], dbs[1 + i], dS = app_bwd(
                blocks(dS), S_in, Z, ws[1 + i], bs[1 + i])

    # first layer: u = f(z0), t_k = f'(z0)*W0[k], h_jk = f''(z0)*W0[j]*W0[k]
    g0, h0, q0 = d1(z0), d2(z0), d3(z0)
    w0rows = [ws[0][k, :].astype(jnp.float32)[None, :] for k in range(si)]
    du, dts, dhs = blocks(dS)[0], blocks(dS)[1:1 + si], blocks(dS)[1 + si:]
    dz0 = du * g0
    for k in range(si):
        dz0 = dz0 + dts[k] * w0rows[k] * h0
    for a, (j, k) in enumerate(pairs):
        dz0 = dz0 + dhs[a] * (w0rows[j] * w0rows[k]) * q0
    # seed sensitivities w.r.t. the W0 rows themselves
    seed_rows = [jnp.sum(dts[k] * g0, axis=0, keepdims=True)
                 for k in range(si)]
    for a, (j, k) in enumerate(pairs):
        dh_a = dhs[a]
        if j == k:
            seed_rows[j] = seed_rows[j] + 2.0 * jnp.sum(
                dh_a * h0 * w0rows[j], axis=0, keepdims=True)
        else:
            seed_rows[j] = seed_rows[j] + jnp.sum(
                dh_a * h0 * w0rows[k], axis=0, keepdims=True)
            seed_rows[k] = seed_rows[k] + jnp.sum(
                dh_a * h0 * w0rows[j], axis=0, keepdims=True)
    dws[0] = _mmT_tn(lift(x), lift(dz0)) + jnp.concatenate(seed_rows, axis=0)
    dbs[0] = jnp.sum(dz0, axis=0)
    return dws, dbs


def _pick_tile_hessian(P: int, cfg: ShapeNetConfig, si: int, itemsize: int):
    """Point tile for the hessian train kernel: the Sobolev accounting with
    (1 + si + si(si+1)/2) streams instead of (1 + si), plus the extra
    per-pair target input tiles."""
    pairs = si * (si + 1) // 2
    nst = 1 + si + pairs
    n_apps = (2 if cfg.use_resblock else 1) * cfg.nlayers
    stacked = 2 * n_apps + 1 + 2  # S_list + Z_list + final S + live D/dS
    bytes_per_row = (nst * stacked * cfg.units + cfg.units) * 4 \
        + 2 * (2 + si + pairs) * 128 * max(itemsize, 2)
    budget = (_VMEM_BF16_BACKWARD_BUDGET if itemsize <= 2
              else _VMEM_RESIDUAL_BUDGET)
    cap = max(min(2048, budget // max(bytes_per_row, 1)), 8)
    for tp in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if tp <= cap and P % tp == 0:
            return tp
    return None


def hessian_fused_unsupported_reason(cfg: ShapeNetConfig, variant: str,
                                     P: int, si: int) -> Optional[str]:
    if variant != "siren":
        return (f"variant {variant!r}: the hessian kernel runs sine "
                f"chains only (f''' of the vanilla activations stays on "
                f"the XLA path)")
    base = fused_unsupported_reason(cfg, variant, P)
    if base is not None:
        return base
    if si > 4:
        return (f"si={si}: {si * (si + 1) // 2} second-order streams "
                f"exceed the practical VMEM budget — XLA path")
    if _pick_tile_hessian(P, cfg, si, 2) is None:
        return (f"P={P} not divisible by any hessian train tile — pad P "
                f"to a multiple of 256")
    return None


def hessian_fused_supported(cfg: ShapeNetConfig, variant: str, P: int,
                            si: int) -> bool:
    return hessian_fused_unsupported_reason(cfg, variant, P, si) is None


def _pick_tile_hess_eval(P: int, cfg: ShapeNetConfig, si: int,
                         itemsize: int):
    """Point tile for the fwd+jac+hess EVAL kernel (no backward): ~3 live
    stacked ``(1 + si + np)``-stream activations per layer boundary at
    f32, plus the double-buffered narrow in/out pad charge (x and one
    ``[TP, so]`` block per value/jac/hess stream, each lane-padded to
    128 at the compute itemsize)."""
    pairs = si * (si + 1) // 2
    nst = 1 + si + pairs
    pad_extra = 2 * (1 + nst) * 128 * max(itemsize, 2)
    bytes_per_row = 3 * nst * cfg.units * 4 + pad_extra
    budget = (_VMEM_BF16_BACKWARD_BUDGET if itemsize <= 2
              else _VMEM_RESIDUAL_BUDGET)
    cap = max(min(4096, budget // max(bytes_per_row, 1)), 8)
    for tp in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if tp <= cap and P % tp == 0:
            return tp
    return None


def fwd_hess_unsupported_reason(cfg: ShapeNetConfig, variant: str,
                                P: int, si: int) -> Optional[str]:
    if variant != "siren":
        return (f"variant {variant!r}: the fused hessian evaluation runs "
                f"sine chains only (vanilla f'' stays on the XLA path)")
    base = fused_unsupported_reason(cfg, variant, P)
    if base is not None:
        return base
    if si > 4:
        return (f"si={si}: {si * (si + 1) // 2} second-order streams "
                f"exceed the practical VMEM budget — XLA path")
    if _pick_tile_hess_eval(P, cfg, si, 2) is None:
        return (f"P={P} not divisible by any hess-eval tile — pad P to a "
                f"multiple of 256")
    return None


def fwd_hess_supported(cfg: ShapeNetConfig, variant: str, P: int,
                       si: int) -> bool:
    return fwd_hess_unsupported_reason(cfg, variant, P, si) is None


def _fwd_hess_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, si: int,
                     *refs):
    # outputs: out [TP, so] + si jac column blocks + np unique-pair hess
    # blocks, all [TP, so] (separate refs — see _fwd_jac_kernel's note on
    # tpu.concatenate and narrow lane offsets)
    np_ = si * (si + 1) // 2
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    out_ref = refs[2 * n_w + 1]
    jac_refs = refs[2 * n_w + 2: 2 * n_w + 2 + si]
    hess_refs = refs[2 * n_w + 2 + si: 2 * n_w + 2 + si + np_]
    out, jac_cols, hess_cols, _ = _hess_fwd_layers(
        x_ref[0], ws, bs, cfg, variant)
    out_ref[0] = out.astype(out_ref.dtype)
    for r, c in zip(jac_refs, jac_cols):
        r[0] = c.astype(r.dtype)
    for r, c in zip(hess_refs, hess_cols):
        r[0] = c.astype(r.dtype)


def shapenet_fwd_hess(
    wb: jnp.ndarray,
    x: jnp.ndarray,
    cfg: ShapeNetConfig,
    variant: str = "siren",
    interpret: bool = None,
):
    """Fused (y, dy/dx, d2y/dx2) evaluation for the grouped ShapeNet
    chain — the ``HessianLayer`` equivalent (reference semantics:
    nif/layers/gradient.py:234-261) in ONE pallas_call.

    ``wb [G, po]``, ``x [G, P, si]`` -> ``y [G, P, so]``,
    ``jac [G, P, so, si]``, ``hess [G, P, so, si, si]`` (exactly
    symmetric — the kernel carries the ``si*(si+1)/2`` unique
    second-order tangent streams of :func:`_hess_fwd_layers` and the
    wrapper mirrors them across the diagonal). Forward-over-forward only:
    no backward, no loss — post-training curvature/Laplacian evaluation
    at kernel speed where the XLA path nests two ``jacfwd`` passes over
    the whole chain. Callers must check :func:`fwd_hess_supported`
    (sine chains, si <= 4).
    """
    G, P, si = x.shape
    so = cfg.output_dim
    pairs = _hess_pairs(si)
    np_ = len(pairs)
    nst = 1 + si + np_
    interpret = _resolve_interpret(interpret)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    ws = _prescale(ws, cfg, variant)
    bs = [b[:, None, :] for b in bs]
    TP = _pick_tile_hess_eval(P, cfg, si, x.dtype.itemsize)
    n_w = len(ws)
    grid = (G, P // TP)

    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]
    b_specs = [
        pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                     memory_space=pltpu.VMEM)
        for b in bs
    ]
    x_spec = pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, TP, so), lambda g, p: (g, p, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(nst)
    ]
    out_shapes = [jax.ShapeDtypeStruct((G, P, so), x.dtype)
                  for _ in range(nst)]
    n = cfg.units
    l_mats = n_w - 2
    flops = 2 * G * P * nst * (si * n + l_mats * n * n + n * so)
    kernel = functools.partial(_fwd_hess_kernel, cfg, variant, n_w, si)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*w_specs, *b_specs, x_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * (2 + nst * so),
            transcendentals=3 * G * P * n * (n_w - 1),
        ),
        interpret=interpret,
    )(*ws, *bs, x)
    y = outs[0]
    jac = jnp.stack(outs[1:1 + si], axis=3)  # stream k = jac column k
    col = {pq: outs[1 + si + a] for a, pq in enumerate(pairs)}
    hess = jnp.stack([
        jnp.stack([col[(min(j, k), max(j, k))] for k in range(si)],
                  axis=-1)
        for j in range(si)
    ], axis=-2)
    return y, jac, hess


def _hessian_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, si: int,
                    ky: float, kj: float, kh: float, has_my: bool,
                    has_mj: bool, has_mh: bool, has_w: bool, *refs):
    # in refs:  w_0.., b_0.., x, target, jt_0..jt_{si-1}, ht_0..ht_{np-1},
    #           (y_mask), (jac_mask_0..), (hess_mask_0..), (weight)
    # out refs: loss_val, loss_jac, loss_hess [1,1] each, dw_0.., db_0..
    pairs = _hess_pairs(si)
    np_ = len(pairs)
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x = refs[2 * n_w][0]
    t_ref = refs[2 * n_w + 1]
    ofs = 2 * n_w + 2
    jt_refs = refs[ofs: ofs + si]
    ofs += si
    ht_refs = refs[ofs: ofs + np_]
    ofs += np_
    my_ref = refs[ofs] if has_my else None
    ofs += 1 if has_my else 0
    mj_refs = refs[ofs: ofs + si] if has_mj else None
    ofs += si if has_mj else 0
    mh_refs = refs[ofs: ofs + np_] if has_mh else None
    ofs += np_ if has_mh else 0
    w_ref = refs[ofs] if has_w else None
    ofs += 1 if has_w else 0
    lv_ref, lj_ref, lh_ref = refs[ofs], refs[ofs + 1], refs[ofs + 2]
    dw_refs = refs[ofs + 3: ofs + 3 + n_w]
    db_refs = refs[ofs + 3 + n_w: ofs + 3 + 2 * n_w]

    out, jac_cols, hess_cols, saved = _hess_fwd_layers(
        x, ws, bs, cfg, variant, save=True)
    err_y = out - t_ref[0].astype(jnp.float32)
    if has_my:
        err_y = err_y * my_ref[0][0].astype(jnp.float32)
    err_j = []
    for k in range(si):
        e = jac_cols[k] - jt_refs[k][0].astype(jnp.float32)
        if has_mj:
            e = e * mj_refs[k][0][0].astype(jnp.float32)
        err_j.append(e)
    err_h = []
    for a in range(np_):
        e = hess_cols[a] - ht_refs[a][0].astype(jnp.float32)
        if has_mh:
            e = e * mh_refs[a][0][0].astype(jnp.float32)
        err_h.append(e)
    mult = [1.0 if j == k else 2.0 for (j, k) in pairs]
    if has_w:
        wgt = w_ref[0].astype(jnp.float32)
        lv = jnp.sum(jnp.square(err_y) * wgt)
        lj = sum(jnp.sum(jnp.square(e) * wgt) for e in err_j)
        lh = sum(m * jnp.sum(jnp.square(e) * wgt)
                 for m, e in zip(mult, err_h))
        D_out = jnp.concatenate(
            [ky * err_y * wgt]
            + [kj * e * wgt for e in err_j]
            + [kh * m * e * wgt for m, e in zip(mult, err_h)], axis=0)
    else:
        lv = jnp.sum(jnp.square(err_y))
        lj = sum(jnp.sum(jnp.square(e)) for e in err_j)
        lh = sum(m * jnp.sum(jnp.square(e)) for m, e in zip(mult, err_h))
        D_out = jnp.concatenate(
            [ky * err_y]
            + [kj * e for e in err_j]
            + [kh * m * e for m, e in zip(mult, err_h)], axis=0)
    z0, S_list, Z_list = saved
    dws, dbs = _hessian_backward_chain(
        D_out, ws, bs, x, z0, S_list, Z_list, cfg, variant, x.dtype)

    g = pl.program_id(0)
    p = pl.program_id(1)
    first = jnp.logical_and(g == 0, p == 0)

    @pl.when(first)
    def _init_loss():
        lv_ref[0, 0] = lv
        lj_ref[0, 0] = lj
        lh_ref[0, 0] = lh

    @pl.when(jnp.logical_not(first))
    def _acc_loss():
        lv_ref[0, 0] = lv_ref[0, 0] + lv
        lj_ref[0, 0] = lj_ref[0, 0] + lj
        lh_ref[0, 0] = lh_ref[0, 0] + lh

    _write_grad_accum(dw_refs, db_refs, dws, dbs)


def shapenet_hessian_grads(
    wb: jnp.ndarray,
    x: jnp.ndarray,
    target: jnp.ndarray,
    jac_target: jnp.ndarray,
    hess_target: jnp.ndarray,
    cfg: ShapeNetConfig,
    variant: str = "siren",
    w_value: float = 1.0,
    w_jac: float = 1.0,
    w_hess: float = 1.0,
    y_mask=None,
    jac_mask=None,
    hess_mask=None,
    weight: jnp.ndarray = None,
    interpret: bool = None,
):
    """Fused second-order Sobolev train step core: ONE pallas_call for
    forward + jacobian + hessian + all three MSE terms + full backward.

    Loss = ``w_value*mean_sel(w*(y-t)^2) + w_jac*mean_sel(w*(jac-jt)^2)
    + w_hess*mean_sel(w*(hess-ht)^2)`` over the FULL symmetric hessian
    (unique pairs carry multiplicity 2 off-diagonal in-kernel; callers add
    the params-independent asymmetry constant for non-symmetric targets —
    see ``NIF.sobolev_value_and_grad``).

    Args:
      wb ``[G, po]``; x ``[G, P, si]``; target ``[G, P, so]``; jac_target
      ``[G, P, si*so]`` flat (col ``k*so+j`` = d y_j / d x_k); hess_target
      ``[G, P, np*so]`` flat over unique pairs in ``_hess_pairs`` order
      (col ``a*so+j`` = d2 y_j / d x_{pair a}), SYMMETRIZED off-diagonal.
      ``y_mask [so]``, ``jac_mask [si*so]``, ``hess_mask [np*so]`` static
      0/1 arrays (None = all). ``weight [G, P]`` optional.

    Returns ``(value_mse, jac_mse, hess_mse, d_wb)`` — hess_mse normalized
    over the FULL si*si grid like the XLA path. Not differentiable — use
    inside a hand-assembled train step.
    """
    G, P, si = x.shape
    so = cfg.output_dim
    pairs = _hess_pairs(si)
    np_ = len(pairs)
    interpret = _resolve_interpret(interpret)
    parts = unpack_shapenet_weights(wb, cfg)
    ws, bs = _split_chain(parts)
    ws = _prescale(ws, cfg, variant)
    bs3 = [b[:, None, :] for b in bs]
    TP = _pick_tile_hessian(P, cfg, si, x.dtype.itemsize)
    n_w = len(ws)
    grid = (G, P // TP)

    n_y = G * P * (int(np.sum(y_mask)) if y_mask is not None else so)
    n_j = G * P * (int(np.sum(jac_mask)) if jac_mask is not None
                   else si * so)
    if hess_mask is not None:
        # full-grid count: each selected off-diagonal pair covers 2 cells
        hm = np.asarray(hess_mask, np.float32).reshape(np_, so)
        mult = np.array([1.0 if j == k else 2.0 for (j, k) in pairs],
                        np.float32)
        n_h = G * P * int(np.sum(hm * mult[:, None]))
    else:
        n_h = G * P * si * si * so
    ky = 2.0 * float(w_value) / n_y
    kj = 2.0 * float(w_jac) / n_j
    kh = 2.0 * float(w_hess) / n_h

    wspec = lambda shp: pl.BlockSpec((1,) + shp, lambda g, p: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    bspec = lambda b: pl.BlockSpec((1, 1, b.shape[2]), lambda g, p: (g, 0, 0),
                                   memory_space=pltpu.VMEM)
    tspec = lambda w: pl.BlockSpec((1, TP, w), lambda g, p: (g, p, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = (
        [wspec(w.shape[1:]) for w in ws]
        + [bspec(b) for b in bs3]
        + [pl.BlockSpec((1, TP, si), lambda g, p: (g, p, 0),
                        memory_space=pltpu.VMEM),
           tspec(so)]
        + [tspec(so) for _ in range(si + np_)]  # jac + hess target streams
    )
    jt_cols = [jac_target[..., k * so:(k + 1) * so].astype(x.dtype)
               for k in range(si)]
    ht_cols = [hess_target[..., a * so:(a + 1) * so].astype(x.dtype)
               for a in range(np_)]
    mask_args = []
    if y_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, so), lambda g, p: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        mask_args.append(jnp.asarray(y_mask, jnp.float32)[None, None, :])
    if jac_mask is not None:
        jm = np.asarray(jac_mask, np.float32)
        for k in range(si):
            in_specs.append(pl.BlockSpec((1, 1, so), lambda g, p: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
            mask_args.append(
                jnp.asarray(jm[k * so:(k + 1) * so])[None, None, :])
    if hess_mask is not None:
        hm_flat = np.asarray(hess_mask, np.float32)
        for a in range(np_):
            in_specs.append(pl.BlockSpec((1, 1, so), lambda g, p: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
            mask_args.append(
                jnp.asarray(hm_flat[a * so:(a + 1) * so])[None, None, :])
    if weight is not None:
        in_specs.append(pl.BlockSpec((1, TP, 1), lambda g, p: (g, p, 0),
                                     memory_space=pltpu.VMEM))
        mask_args.append(weight.astype(x.dtype)[..., None])
    sspec = pl.BlockSpec((1, 1), lambda g, p: (0, 0),
                         memory_space=pltpu.SMEM)
    out_specs = (
        [sspec, sspec, sspec]
        + [wspec(w.shape[1:]) for w in ws]
        + [bspec(b) for b in bs3]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs3]
    )

    n = cfg.units
    l_mats = n_w - 2
    nst = 1 + si + np_
    chain_flops = 2 * G * P * nst * (si * n + l_mats * n * n + n * so)
    kernel = functools.partial(
        _hessian_kernel, cfg, variant, n_w, si, ky, kj, kh,
        y_mask is not None, jac_mask is not None, hess_mask is not None,
        weight is not None)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * chain_flops,
            bytes_accessed=x.size * x.dtype.itemsize * (2 + nst * so),
            transcendentals=6 * G * P * n * (n_w - 1),
        ),
        interpret=interpret,
    )(*ws, *bs3, x, target.astype(x.dtype), *jt_cols, *ht_cols, *mask_args)
    value_mse = outs[0][0, 0] / n_y
    jac_mse = outs[1][0, 0] / n_j
    hess_mse = outs[2][0, 0] / n_h
    dws = _unscale_grads(list(outs[3: 3 + n_w]), cfg, variant)
    dbs = outs[3 + n_w:]
    flat = [d.reshape(G, -1) for d in dws] + [d.reshape(G, -1) for d in dbs]
    d_wb = jnp.concatenate(flat, axis=-1).astype(wb.dtype)
    return value_mse, jac_mse, hess_mse, d_wb
