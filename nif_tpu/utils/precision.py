"""Matmul precision control.

TPU f32 matmuls default to reduced internal precision (bf16 passes), which
is fine for training throughput but hurts derivative-heavy paths (Sobolev
losses, Jacobian/Hessian extraction, L-BFGS). Use this context for those:

    with nif_tpu.utils.high_precision():
        y, jac = output_and_jacobian(fn, x)
"""
from __future__ import annotations

import jax

__all__ = ["high_precision"]


def high_precision():
    """Context manager forcing full-f32 matmuls inside traced code."""
    return jax.default_matmul_precision("highest")
