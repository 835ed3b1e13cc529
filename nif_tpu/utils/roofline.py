"""Roofline accounting: FLOPs/bytes estimates and achieved-throughput
reporting for NIF configurations.

No reference equivalent (the reference reports nothing quantitative);
this is the observability side of "every hot kernel optimized": given a
model config and a measured step time, report achieved FLOP/s, points/s,
and the FLOPs/byte arithmetic intensity of each phase.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from ..config import ParameterNetConfig, ShapeNetConfig, shapenet_param_count

__all__ = ["flops_per_point", "pnet_flops", "step_report"]


def _chain_matmul_flops(cfg: ShapeNetConfig) -> int:
    """Forward FLOPs per coordinate point through the ShapeNet chain."""
    si, so, n, l = cfg.input_dim, cfg.output_dim, cfg.units, cfg.nlayers
    mats = (2 * l if cfg.use_resblock else l)
    return 2 * (si * n + mats * n * n + n * so)


def flops_per_point(cfg_s: ShapeNetConfig, training: bool = True) -> int:
    """ShapeNet FLOPs per point; training counts fwd + ~2x bwd."""
    fwd = _chain_matmul_flops(cfg_s)
    return fwd * 3 if training else fwd


def pnet_flops(cfg_p: ParameterNetConfig, cfg_s: ShapeNetConfig,
               n_groups: int, training: bool = True) -> int:
    """ParameterNet FLOPs per step (per group, times n_groups)."""
    po = shapenet_param_count(cfg_s, cfg_p.latent_dim)
    k, u, l = cfg_p.latent_dim, cfg_p.units, cfg_p.nlayers
    mats = (2 * l if cfg_p.use_resblock else l)
    fwd = 2 * (cfg_p.input_dim * u + mats * u * u + u * k + k * po)
    total = fwd * (3 if training else 1)
    return total * n_groups


def step_report(
    cfg_s: ShapeNetConfig,
    cfg_p: ParameterNetConfig,
    n_groups: int,
    points_per_group: int,
    step_seconds: float,
    peak_tflops: Optional[float] = None,
    training: bool = True,
) -> Dict[str, float]:
    """Summarize a measured step: points/s, TFLOP/s, utilization.

    ``peak_tflops``: the chip's peak (e.g. 197 for v5e bf16); if given,
    adds ``mxu_utilization``.
    """
    pts = n_groups * points_per_group
    snet = flops_per_point(cfg_s, training) * pts
    pnet = pnet_flops(cfg_p, cfg_s, n_groups, training)
    total = snet + pnet
    out = {
        "points_per_sec": pts / step_seconds,
        "tflops_per_sec": total / step_seconds / 1e12,
        "snet_flops": float(snet),
        "pnet_flops": float(pnet),
        "pnet_fraction": pnet / total,
    }
    if peak_tflops:
        out["mxu_utilization"] = out["tflops_per_sec"] / peak_tflops
    return out
