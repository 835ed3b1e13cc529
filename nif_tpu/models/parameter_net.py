"""ParameterNet: the hypernetwork trunk mapping (t, mu) -> latent -> ShapeNet
weight vector.

Three variants, matching the reference's builder logic:

* ``vanilla``   — Dense(act) -> l_st x SimpleShortCut -> Dense(latent, linear)
                  -> Dense(po_dim, linear), all TruncatedNormal(0.1) init
                  (reference nif/model.py:156-231).
* ``siren``     — SIREN(first) -> l_st x (SIREN_ResNet | SIREN hidden) ->
                  SIREN bottleneck (linear) -> HyperLinearForSIREN
                  (reference nif/model.py:591-663).
* ``mlp_hyper`` — Dense(act) -> l_st x (MLP_ResNet | SimpleShortCut) ->
                  Dense(latent, linear) -> HyperLinearForSIREN
                  (reference nif/model.py:665-734).

``apply`` returns ``(po, latent)`` — the final weight vector and the
bottleneck activation — mirroring ``_call_parameter_net``
(reference nif/model.py:326-343).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ParameterNetConfig, ShapeNetConfig
from ..layers.mlp import (
    dense_apply,
    dense_init,
    mlp_resnet_apply,
    mlp_resnet_init,
    mlp_shortcut_apply,
    mlp_shortcut_init,
)
from ..layers.siren import (
    hyper_linear_apply,
    hyper_linear_init_params,
    siren_apply,
    siren_init,
    siren_resnet_apply,
    siren_resnet_init,
)

__all__ = ["parameter_net_kind", "parameter_net_init", "parameter_net_apply"]


def parameter_net_kind(cfg_p: ParameterNetConfig, vanilla: bool) -> str:
    if vanilla:
        return "vanilla"
    return "siren" if cfg_p.activation == "sine" else "mlp_hyper"


def parameter_net_init(
    key,
    cfg_p: ParameterNetConfig,
    cfg_s: ShapeNetConfig,
    po_dim: int,
    kind: str,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    n_keys = 3 + cfg_p.nlayers
    keys = jax.random.split(key, n_keys)
    k_first, k_hidden, k_bottleneck, k_last = (
        keys[0],
        keys[1 : 1 + cfg_p.nlayers],
        keys[-2],
        keys[-1],
    )
    params: Dict[str, Any] = {}

    if kind == "vanilla":
        params["first"] = dense_init(k_first, cfg_p.input_dim, cfg_p.units, dtype=dtype)
        for i in range(cfg_p.nlayers):
            params[f"hidden_{i}"] = mlp_shortcut_init(k_hidden[i], cfg_p.units, dtype)
        params["bottleneck"] = dense_init(
            k_bottleneck, cfg_p.units, cfg_p.latent_dim, dtype=dtype
        )
        params["last"] = dense_init(k_last, cfg_p.latent_dim, po_dim, dtype=dtype)
        return params

    if kind == "siren":
        params["first"] = siren_init(
            k_first, cfg_p.input_dim, cfg_p.units, "first", cfg_p.omega_0, dtype
        )
        for i in range(cfg_p.nlayers):
            if cfg_p.use_resblock:
                params[f"hidden_{i}"] = siren_resnet_init(
                    k_hidden[i], cfg_p.units, cfg_p.omega_0, dtype
                )
            else:
                params[f"hidden_{i}"] = siren_init(
                    k_hidden[i], cfg_p.units, cfg_p.units, "hidden", cfg_p.omega_0, dtype
                )
        params["bottleneck"] = siren_init(
            k_bottleneck, cfg_p.units, cfg_p.latent_dim, "bottleneck", cfg_p.omega_0, dtype
        )
        params["last"] = hyper_linear_init_params(
            k_last, cfg_p.latent_dim, po_dim, cfg_s, dtype
        )
        return params

    if kind == "mlp_hyper":
        params["first"] = dense_init(k_first, cfg_p.input_dim, cfg_p.units, dtype=dtype)
        for i in range(cfg_p.nlayers):
            if cfg_p.use_resblock:
                params[f"hidden_{i}"] = mlp_resnet_init(k_hidden[i], cfg_p.units, dtype)
            else:
                params[f"hidden_{i}"] = mlp_shortcut_init(k_hidden[i], cfg_p.units, dtype)
        params["bottleneck"] = dense_init(
            k_bottleneck, cfg_p.units, cfg_p.latent_dim, dtype=dtype
        )
        params["last"] = hyper_linear_init_params(
            k_last, cfg_p.latent_dim, po_dim, cfg_s, dtype
        )
        return params

    raise ValueError(f"unknown parameter net kind {kind!r}")


def parameter_net_latent(params, t: jnp.ndarray, cfg_p: ParameterNetConfig, kind: str):
    """Trunk up to and including the bottleneck: (t, mu) -> latent."""
    h = t
    if kind == "vanilla":
        h = dense_apply(params["first"], h, cfg_p.activation)
        for i in range(cfg_p.nlayers):
            h = mlp_shortcut_apply(params[f"hidden_{i}"], h, cfg_p.activation)
        return dense_apply(params["bottleneck"], h)
    if kind == "siren":
        h = siren_apply(params["first"], h, cfg_p.omega_0, "first")
        for i in range(cfg_p.nlayers):
            if cfg_p.use_resblock:
                h = siren_resnet_apply(params[f"hidden_{i}"], h, cfg_p.omega_0)
            else:
                h = siren_apply(params[f"hidden_{i}"], h, cfg_p.omega_0, "hidden")
        return siren_apply(params["bottleneck"], h, cfg_p.omega_0, "bottleneck")
    if kind == "mlp_hyper":
        h = dense_apply(params["first"], h, cfg_p.activation)
        for i in range(cfg_p.nlayers):
            if cfg_p.use_resblock:
                h = mlp_resnet_apply(params[f"hidden_{i}"], h, cfg_p.activation)
            else:
                h = mlp_shortcut_apply(params[f"hidden_{i}"], h, cfg_p.activation)
        return dense_apply(params["bottleneck"], h)
    raise ValueError(f"unknown parameter net kind {kind!r}")


def parameter_net_head(params, latent: jnp.ndarray, kind: str):
    """Final layer: latent -> flattened ShapeNet weight vector."""
    if kind == "vanilla":
        return dense_apply(params["last"], latent)
    return hyper_linear_apply(params["last"], latent)


def parameter_net_apply(
    params, t: jnp.ndarray, cfg_p: ParameterNetConfig, kind: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full ParameterNet: returns (weight_vector, latent)."""
    latent = parameter_net_latent(params, t, cfg_p, kind)
    return parameter_net_head(params, latent, kind), latent
