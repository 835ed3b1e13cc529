"""Mixed-precision policy.

The reference threads a Keras ``mixed_precision.Policy`` through every layer
with explicit casts at compute/variable boundaries (reference
nif/model.py:101-105, nif/layers/siren.py:170-173, nif/layers/mlp.py:39-40).
On TPU the idiomatic split is fp32 parameters / bf16 compute; XLA fuses the
boundary casts, so we only cast at the model entry and exit.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["Policy", "get_policy"]


@dataclasses.dataclass(frozen=True)
class Policy:
    name: str
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)


_POLICIES = {
    "float32": ("float32", "float32"),
    "float64": ("float64", "float64"),
    # TPU-native half-precision compute. 'mixed_float16' is accepted for
    # reference-config compatibility but mapped to bf16 compute, which is the
    # dtype the MXU natively consumes (fp16 has no TPU advantage).
    "mixed_bfloat16": ("float32", "bfloat16"),
    "mixed_float16": ("float32", "bfloat16"),
}


def get_policy(name) -> Policy:
    if isinstance(name, Policy):
        return name
    try:
        param, compute = _POLICIES[name]
    except KeyError:
        raise ValueError(
            f"unknown mixed_policy {name!r}; expected one of {sorted(_POLICIES)}"
        ) from None
    return Policy(name=name, param_dtype=jnp.dtype(param), compute_dtype=jnp.dtype(compute))
