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
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ShapeNetConfig
from .shapenet import shapenet_grouped, unpack_shapenet_weights

__all__ = ["shapenet_grouped_fused", "fused_supported"]


# --------------------------------------------------------------------------
# Fast polynomial sine for bf16 compute.
#
# The VPU's exact f32 sine costs ~25 ops/element and dominates the kernel
# (measured: 2.4 ms of a 2.9 ms forward at G=32, P=8192, n=128). Activations
# are cast to bf16 between layers anyway (eps ~ 3.9e-3), so a degree-9 odd
# minimax polynomial on the range-reduced argument (max error 1.7e-5 — two
# orders below bf16 rounding) is a free 3-4x kernel speedup. The backward
# pass uses the TRUE derivative of the forward polynomial, so gradients are
# exact for the function actually computed.
# --------------------------------------------------------------------------
_INV2PI = float(1.0 / (2.0 * np.pi))
# sin(2*pi*t) ~ t*(c1 + c3 t^2 + c5 t^4 + c7 t^6 + c9 t^8), t in [-0.5, 0.5]
_SIN_C = (6.28308846, -41.33324754, 81.40008977, -74.67588387, 33.16809461)


def _fast_sin(y):
    t = y * _INV2PI
    t = t - jnp.round(t)
    s = t * t
    c1, c3, c5, c7, c9 = _SIN_C
    return t * (c1 + s * (c3 + s * (c5 + s * (c7 + s * c9))))


def _fast_sin_grad(y):
    """d/dy of _fast_sin — the exact gradient of the forward polynomial."""
    t = y * _INV2PI
    t = t - jnp.round(t)
    s = t * t
    c1, c3, c5, c7, c9 = _SIN_C
    return (
        c1 + s * (3 * c3 + s * (5 * c5 + s * (7 * c7 + s * (9 * c9))))
    ) * _INV2PI


def _trig_for(dtype):
    """(sin, dsin/dy) — polynomial for bf16 compute, exact for f32."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return _fast_sin, _fast_sin_grad
    return jnp.sin, jnp.cos


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


def fused_supported(cfg: ShapeNetConfig, variant: str, P: int) -> bool:
    """Whether the fused kernel handles this config (else XLA path)."""
    if cfg.connectivity != "full":
        return False
    if variant == "vanilla":
        try:
            _act_pair(cfg.activation)
        except ValueError:
            return False
    if _pick_tile(P) is None:
        return False
    # Tiny widths gain nothing and hit Mosaic tiling corner cases.
    return cfg.units >= 8


def _pick_tile(P: int):
    for tp in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if P % tp == 0:
            return tp
    return None


def _matmul(a, b):
    # [TP, k] x [k, m] -> [TP, m], f32 accumulation on the MXU.
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
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
    """Shared fwd chain: returns (out, residuals) with residuals the
    pre-activation inputs needed by the backward pass (empty if save=False).

    ``ws``/``bs`` are the per-layer 2-D weight matrices / 1-D biases in
    chain order (resblock layers contribute two consecutive entries).
    """
    om = jnp.float32(cfg.omega_0)
    l = cfg.nlayers
    res: List[Any] = []
    cdt = x.dtype
    sin_fn, _ = _trig_for(cdt)

    def lift(u):
        return u.astype(cdt)

    if variant == "siren":
        if save:
            res.append(x)
        u = sin_fn(om * _first_matmul(x, ws[0]) + bs[0].astype(jnp.float32))
        if cfg.use_resblock:
            for i in range(l):
                if save:
                    res.append(u)
                h = sin_fn(
                    om * _matmul(lift(u), ws[1 + 2 * i]) + bs[1 + 2 * i].astype(jnp.float32)
                )
                if save:
                    res.append(h)
                u = 0.5 * (
                    u
                    + sin_fn(
                        om * _matmul(lift(h), ws[2 + 2 * i])
                        + bs[2 + 2 * i].astype(jnp.float32)
                    )
                )
        else:
            for i in range(l):
                if save:
                    res.append(u)
                u = sin_fn(
                    om * _matmul(lift(u), ws[1 + i]) + bs[1 + i].astype(jnp.float32)
                )
        if save:
            res.append(u)
        out = _last_matmul(lift(u), ws[-1]) + bs[-1].astype(jnp.float32)
        return out, res

    # vanilla
    act, _ = _act_pair(cfg.activation)
    if save:
        res.append(x)
    u = act(_first_matmul(x, ws[0]) + bs[0].astype(jnp.float32))
    for i in range(l):
        if save:
            res.append(u)
        u = act(_matmul(lift(u), ws[1 + i]) + bs[1 + i].astype(jnp.float32)) + u
    if save:
        res.append(u)
    out = _last_matmul(lift(u), ws[-1]) + bs[-1].astype(jnp.float32)
    return out, res


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------
def _fwd_kernel(cfg: ShapeNetConfig, variant: str, n_w: int, *refs):
    # refs: w_0..w_{n_w-1}, b_0..b_{n_w-1}, x, out
    ws = [refs[i][0] for i in range(n_w)]
    bs = [refs[n_w + i][0] for i in range(n_w)]
    x_ref = refs[2 * n_w]
    out_ref = refs[2 * n_w + 1]
    out, _ = _forward_layers(x_ref[0], ws, bs, cfg, variant, save=False)
    out_ref[0] = out.astype(out_ref.dtype)


def _chain_weight_shapes(cfg: ShapeNetConfig) -> List[Tuple[int, int]]:
    si, so, n, l = cfg.input_dim, cfg.output_dim, cfg.units, cfg.nlayers
    m = 2 * l if cfg.use_resblock else l
    return [(si, n)] + [(n, n)] * m + [(n, so)]


def _split_chain(parts: Dict[str, Any]):
    """Flattened per-layer (weights, biases) lists from the unpack dict."""
    ws = [parts["w_first"], *parts["w_hidden"], parts["w_last"]]
    bs = [parts["b_first"], *parts["b_hidden"], parts["b_last"]]
    return ws, bs


def _fwd_pallas(ws, bs, x, cfg: ShapeNetConfig, variant: str, interpret: bool):
    G, P, si = x.shape
    so = cfg.output_dim
    TP = _pick_tile(P)
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
    cdt = x.dtype
    om = jnp.float32(cfg.omega_0)
    l = cfg.nlayers
    _, cos_fn = _trig_for(cdt)

    # Recompute forward, keeping the layer inputs (cheap; avoids writing
    # activations to HBM in the forward pass).
    _, res = _forward_layers(x, ws, bs, cfg, variant, save=True)

    def lift(u):
        return u.astype(cdt)

    def mmT_nt(a, b):
        # a [TP, m], b [k, m] -> a @ b.T : [TP, k]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def mmT_tn(a, b):
        # a [TP, k], b [TP, m] -> a.T @ b : [k, m]
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dws: List[Any] = [None] * n_w
    dbs: List[Any] = [None] * n_w

    # ---- last (linear) layer: out = u_last @ W_l + b_l
    u_last = res[-1]
    dws[-1] = mmT_tn(lift(u_last), lift(go))
    dbs[-1] = jnp.sum(go, axis=0)
    du = mmT_nt(lift(go), ws[-1]).astype(jnp.float32)  # [TP, n]

    if variant == "siren":
        if cfg.use_resblock:
            # res layout: [x, u_0, h_0, u_1, h_1, ..., u_{l-1}... , u_last]
            # where u_i is the input to resblock i and h_i its mid value.
            for i in range(l - 1, -1, -1):
                u_in = res[1 + 2 * i]
                h = res[2 + 2 * i]
                w1, w2 = ws[1 + 2 * i], ws[2 + 2 * i]
                b1, b2 = bs[1 + 2 * i], bs[2 + 2 * i]
                z2 = om * _matmul(lift(h), w2) + b2.astype(jnp.float32)
                dz2 = 0.5 * du * cos_fn(z2)
                dws[2 + 2 * i] = om * mmT_tn(lift(h), lift(dz2))
                dbs[2 + 2 * i] = jnp.sum(dz2, axis=0)
                dh = om * mmT_nt(lift(dz2), w2).astype(jnp.float32)
                z1 = om * _matmul(lift(u_in), w1) + b1.astype(jnp.float32)
                dz1 = dh * cos_fn(z1)
                dws[1 + 2 * i] = om * mmT_tn(lift(u_in), lift(dz1))
                dbs[1 + 2 * i] = jnp.sum(dz1, axis=0)
                du = 0.5 * du + om * mmT_nt(lift(dz1), w1).astype(jnp.float32)
            # first layer
            z0 = om * _first_matmul(x, ws[0]) + bs[0].astype(jnp.float32)
            dz0 = du * cos_fn(z0)
            dws[0] = om * mmT_tn(x, lift(dz0))
            dbs[0] = jnp.sum(dz0, axis=0)
            dx = om * mmT_nt(lift(dz0), ws[0])
        else:
            for i in range(l - 1, -1, -1):
                u_in = res[1 + i]
                w = ws[1 + i]
                z = om * _matmul(lift(u_in), w) + bs[1 + i].astype(jnp.float32)
                dz = du * jnp.cos(z)
                dws[1 + i] = om * mmT_tn(lift(u_in), lift(dz))
                dbs[1 + i] = jnp.sum(dz, axis=0)
                du = om * mmT_nt(lift(dz), w).astype(jnp.float32)
            z0 = om * _first_matmul(x, ws[0]) + bs[0].astype(jnp.float32)
            dz0 = du * cos_fn(z0)
            dws[0] = om * mmT_tn(x, lift(dz0))
            dbs[0] = jnp.sum(dz0, axis=0)
            dx = om * mmT_nt(lift(dz0), ws[0])
    else:
        _, dact = _act_pair(cfg.activation)
        for i in range(l - 1, -1, -1):
            u_in = res[1 + i]
            w = ws[1 + i]
            z = _matmul(lift(u_in), w) + bs[1 + i].astype(jnp.float32)
            dz = du * dact(z)
            dws[1 + i] = mmT_tn(lift(u_in), lift(dz))
            dbs[1 + i] = jnp.sum(dz, axis=0)
            # shortcut: u_{i} = act(z) + u_{i-1} -> grad adds straight through
            du = du + mmT_nt(lift(dz), w).astype(jnp.float32)
        z0 = _first_matmul(x, ws[0]) + bs[0].astype(jnp.float32)
        dz0 = du * dact(z0)
        dws[0] = mmT_tn(x, lift(dz0))
        dbs[0] = jnp.sum(dz0, axis=0)
        dx = mmT_nt(lift(dz0), ws[0])

    dx_ref[0] = dx.astype(dx_ref.dtype)

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


def _bwd_pallas(ws, bs, x, g_out, cfg, variant, interpret):
    G, P, si = x.shape
    so = cfg.output_dim
    TP = _pick_tile(P)
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
    return _fwd_pallas(ws, bs, x, cfg, variant, _resolve_interpret(interpret))


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
        ws, bs, x, g_out, cfg, variant, _resolve_interpret(interpret)
    )
    # Re-flatten the segment grads into the wb layout:
    # [W_first | W_hidden... | W_last | b_first | b_hidden... | b_last].
    G = wb.shape[0]
    flat = [d.reshape(G, -1) for d in dws] + [d.reshape(G, -1) for d in dbs]
    d_wb = jnp.concatenate(flat, axis=-1).astype(wb.dtype)
    return d_wb, dx.astype(x.dtype)


shapenet_grouped_fused.defvjp(_fused_fwd, _fused_bwd)
