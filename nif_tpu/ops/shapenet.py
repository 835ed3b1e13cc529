"""ShapeNet evaluation: run an MLP whose weights are *data* (generated
per-sample by the ParameterNet).

This is the hot op of the whole framework (reference: the chain of
``EinsumLayer("ai,aij->aj")`` per-sample matvecs in nif/model.py:305-322,
:849-877, :936-951). Two layouts are provided:

* **point-wise** — ``x: [B, si]``, ``wb: [B, po]``: every coordinate point
  carries its own generated weight vector. Exact reference semantics; each
  layer is a per-sample matvec (``einsum('ai,aij->aj')``), which is
  HBM-bandwidth-bound on TPU (the generated weights dominate traffic).

* **grouped** — ``x: [G, P, si]``, ``wb: [G, po]``: P coordinate points share
  one generated weight set (they belong to the same ``(t, mu)`` snapshot, the
  overwhelmingly common case for spatio-temporal field data). Each layer is a
  true batched matmul (``einsum('gpi,gij->gpj')``) that tiles onto the MXU,
  and the generated weights are read once per P points instead of once per
  point — this is the TPU-first fast path.

The flattened weight-vector layout matches the reference slicing order
exactly: [W_first | W_hidden... | W_last | b_first | b_hidden... | b_last]
(reference nif/model.py:253-300; resblock variant :769-846), so
``x_to_u_given_w``-style ROM workflows interoperate.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp

from ..config import ShapeNetConfig, shapenet_param_count
from ..layers.mlp import get_activation

__all__ = [
    "unpack_shapenet_weights",
    "shapenet_pointwise",
    "shapenet_grouped",
]


def unpack_shapenet_weights(wb: jnp.ndarray, cfg: ShapeNetConfig) -> Dict[str, Any]:
    """Slice the flattened weight+bias vector into per-layer tensors.

    ``wb`` has shape ``[*batch, po_dim]``; returned tensors keep the leading
    batch dims. Slicing order replicates reference nif/model.py:253-300
    (plain) and :769-846 (resblock).
    """
    si, so, n, l = cfg.input_dim, cfg.output_dim, cfg.units, cfg.nlayers
    batch = wb.shape[:-1]
    n_hidden_mats = 2 * l if cfg.use_resblock else l

    expected = shapenet_param_count(cfg, latent_dim=0)
    if cfg.connectivity != "full":
        raise ValueError("unpack_shapenet_weights requires connectivity='full'")
    if wb.shape[-1] != expected:
        raise ValueError(
            f"weight vector has {wb.shape[-1]} entries, expected {expected} "
            f"for cfg {cfg}"
        )

    ofs = 0

    def take(count):
        nonlocal ofs
        seg = wb[..., ofs : ofs + count]
        ofs += count
        return seg

    w_first = take(si * n).reshape(*batch, si, n)
    w_hidden: List[jnp.ndarray] = [
        take(n * n).reshape(*batch, n, n) for _ in range(n_hidden_mats)
    ]
    w_last = take(n * so).reshape(*batch, n, so)
    b_first = take(n)
    b_hidden: List[jnp.ndarray] = [take(n) for _ in range(n_hidden_mats)]
    b_last = take(so)
    assert ofs == expected
    return {
        "w_first": w_first,
        "w_hidden": w_hidden,
        "w_last": w_last,
        "b_first": b_first,
        "b_hidden": b_hidden,
        "b_last": b_last,
    }


def _matvec_pointwise(u, w):
    # [B, i] x [B, i, j] -> [B, j]: per-sample matvec.
    return jnp.einsum("ai,aij->aj", u, w)


def _matvec_grouped(u, w):
    # [G, P, i] x [G, i, j] -> [G, P, j]: batched matmul; preferred MXU form.
    return jnp.einsum("gpi,gij->gpj", u, w, preferred_element_type=u.dtype)


def _bias_pointwise(b):
    return b


def _bias_grouped(b):
    return b[..., None, :]


def _shapenet_chain(x, parts, cfg: ShapeNetConfig, matvec, liftb, variant: str):
    """Run the layer chain. Shared by point-wise and grouped layouts.

    ``variant`` selects the architecture family:
      * 'siren'   — the NIFMultiScale chain: sine activations scaled by
        omega_0, optional resblocks (reference nif/model.py:738-954).
      * 'vanilla' — the plain NIF chain: cfg.activation with additive
        shortcuts on hidden layers (reference nif/model.py:302-322).
    """
    if variant == "siren":
        om = jnp.asarray(cfg.omega_0, x.dtype)
        u = jnp.sin(om * matvec(x, parts["w_first"]) + liftb(parts["b_first"]))
        if cfg.use_resblock:
            # u = 0.5*(u + sin(w0*h@W2 + b2)), h = sin(w0*u@W1 + b1)
            # (reference nif/model.py:849-877)
            for i in range(cfg.nlayers):
                w1, w2 = parts["w_hidden"][2 * i], parts["w_hidden"][2 * i + 1]
                b1, b2 = parts["b_hidden"][2 * i], parts["b_hidden"][2 * i + 1]
                h = jnp.sin(om * matvec(u, w1) + liftb(b1))
                u = 0.5 * (u + jnp.sin(om * matvec(h, w2) + liftb(b2)))
        else:
            for i in range(cfg.nlayers):
                u = jnp.sin(
                    om * matvec(u, parts["w_hidden"][i]) + liftb(parts["b_hidden"][i])
                )
    elif variant == "vanilla":
        # Vanilla NIF: act(first); hidden blocks are act(.) + shortcut
        # (reference nif/model.py:302-322).
        act = get_activation(cfg.activation)
        u = act(matvec(x, parts["w_first"]) + liftb(parts["b_first"]))
        for i in range(cfg.nlayers):
            u = act(matvec(u, parts["w_hidden"][i]) + liftb(parts["b_hidden"][i])) + u
    else:
        raise ValueError(f"unknown shapenet variant {variant!r}")
    return matvec(u, parts["w_last"]) + liftb(parts["b_last"])


def shapenet_pointwise(
    wb: jnp.ndarray, x: jnp.ndarray, cfg: ShapeNetConfig, variant: str = "vanilla"
):
    """Evaluate the ShapeNet point-wise.

    Args:
      wb: ``[B, po_dim]`` flattened generated weights+biases (one per point).
      x:  ``[B, si]`` spatial coordinates.
      variant: 'vanilla' or 'siren' (see :func:`_shapenet_chain`).

    Returns:
      ``[B, so]`` field values.
    """
    parts = unpack_shapenet_weights(wb, cfg)
    return _shapenet_chain(x, parts, cfg, _matvec_pointwise, _bias_pointwise, variant)


def shapenet_grouped(
    wb: jnp.ndarray, x: jnp.ndarray, cfg: ShapeNetConfig, variant: str = "vanilla"
):
    """Evaluate the ShapeNet with shared weights per group (MXU fast path).

    Args:
      wb: ``[G, po_dim]`` flattened generated weights+biases (one per group).
      x:  ``[G, P, si]`` spatial coordinates, P points per group.
      variant: 'vanilla' or 'siren' (see :func:`_shapenet_chain`).

    Returns:
      ``[G, P, so]`` field values.
    """
    parts = unpack_shapenet_weights(wb, cfg)
    return _shapenet_chain(x, parts, cfg, _matvec_grouped, _bias_grouped, variant)
