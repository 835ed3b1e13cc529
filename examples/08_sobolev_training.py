"""Tutorial 8 — Sobolev training: match derivatives, not just values.

Covers (reference tutorial/8_revisit_multi_scale_NIF_with_sobolov_training
.ipynb, README.md:234-237): feeding du/dx targets alongside u removes
spurious high-frequency signals; the separate loss terms are monitored
per-epoch (the reference uses custom Keras metrics — here the loss returns
a terms dict).

``--grouped`` runs the same problem through the scalable grouped layout
(``model.sobolev_value_and_grad``): the hypernetwork evaluates once per
time snapshot, and on TPU the whole step core (forward + Jacobian + both
MSE terms + backward) is ONE fused Pallas pass — the layout that scales
Sobolev training to million-point groups (measured 2.9x the XLA jacfwd
path at the flagship config; see docs/PERFORMANCE.md).
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWaveHighFreq
from nif_tpu.demo.datasets import traveling_wave_dudx
from nif_tpu.ops import sobolev_loss


def main(epochs=1000, w_jac=0.1, seed=0):
    # The reference's actual tutorial-8 data: the K=400 wave packet
    # (demo/datasets.py reproduces nif/demo/dataset/traveling_wave_high_freq
    # .npz to f32 rounding), with its exact analytic du/dx as supervision.
    tw = TravelingWaveHighFreq()
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)
    lo = tw.n_p + tw.n_x
    x_raw = tw.data_raw[:, 1]
    t_raw = tw.data_raw[:, 0]
    dudx_raw = traveling_wave_dudx(t_raw, x_raw, tw.wavenumber)
    # chain rule through both normalizations: d u_norm / d x_norm
    dudx_norm = dudx_raw * tw.std[1] / tw.std[lo]
    target_jac = dudx_norm.reshape(-1, 1, 1).astype(np.float32)

    cfg_s = {
        "connectivity": "full", "input_dim": 1, "output_dim": 1, "units": 30,
        "nlayers": 2, "weight_init_factor": 0.01, "omega_0": 30.0,
        "activation": "sine", "use_resblock": False,
    }
    cfg_p = {"input_dim": 1, "latent_dim": 1, "units": 30, "nlayers": 2,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    params = model.init(jax.random.key(seed))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    inp = jnp.asarray(inputs)
    tgt = jnp.asarray(targets)
    tj = jnp.asarray(target_jac)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            fn = lambda i: model.apply(p, i)
            total, terms = sobolev_loss(
                fn, inp, tgt, target_jac=tj, w_jac=w_jac, x_index=[1]
            )
            return total, terms

        (l, terms), g = jax.value_and_grad(loss, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l, terms

    for e in range(epochs):
        params, opt_state, l, terms = step(params, opt_state)
        if e % max(epochs // 10, 1) == 0:
            print(
                f"epoch {e:5d}  total {float(l):.3e}  "
                f"value {float(terms['value_mse']):.3e}  "
                f"jac {float(terms['jacobian_mse']):.3e}"
            )
    return float(terms["value_mse"])


_CFG_S = {
    "connectivity": "full", "input_dim": 1, "output_dim": 1, "units": 30,
    "nlayers": 2, "weight_init_factor": 0.01, "omega_0": 30.0,
    "activation": "sine", "use_resblock": False,
}
_CFG_P = {"input_dim": 1, "latent_dim": 1, "units": 30, "nlayers": 2,
          "activation": "swish", "use_resblock": False, "omega_0": 30.0}


def _grouped_problem(n_xg=256, G=10):
    """Shared grouped tutorial-8 problem: (t, x, u, target_jac) with the
    analytic du/dx_norm chained through both normalizations.

    The K=400 packet needs grid spacing below pi/400 ~ 0.0079 to be
    resolvable, so the grouped variant samples the same field at n_x=256
    (the bundled 200-point grid does not divide the kernel tile)."""
    tw = TravelingWaveHighFreq(n_t=G, n_x=n_xg)
    data = np.asarray(tw.data, np.float32)  # normalized [t, x, u], t-major
    t = data[::n_xg, 0:1]
    x = data[:, 1:2].reshape(G, n_xg, 1)
    u = data[:, 2:3].reshape(G, n_xg, 1)
    lo = tw.n_p + tw.n_x
    dudx_raw = traveling_wave_dudx(
        tw.data_raw[:, 0], tw.data_raw[:, 1], tw.wavenumber)
    tj = (dudx_raw * tw.std[1] / tw.std[lo]).reshape(
        G, n_xg, 1, 1).astype(np.float32)
    return t, x, u, tj


def main_grouped(epochs=1000, w_jac=0.1, seed=0, n_xg=256):
    """Grouped-layout Sobolev training: one hypernet eval per snapshot.

    Uses n_x=256 so the point count per group divides the fused train
    kernel's tile (pad to a multiple of 256 for large P)."""
    t, x, u, tj = _grouped_problem(n_xg)
    cfg_s, cfg_p = _CFG_S, _CFG_P
    model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    params = model.init(jax.random.key(seed))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    tg, xg, ug, tjg = map(jnp.asarray, (t, x, u, tj))

    @jax.jit
    def step(params, opt_state):
        total, terms, g = model.sobolev_value_and_grad(
            params, tg, xg, ug, target_jac=tjg, w_jac=w_jac
        )
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, total, terms

    for e in range(epochs):
        params, opt_state, l, terms = step(params, opt_state)
        if e % max(epochs // 10, 1) == 0:
            print(
                f"epoch {e:5d}  total {float(l):.3e}  "
                f"value {float(terms['value_mse']):.3e}  "
                f"jac {float(terms['jacobian_mse']):.3e}"
            )
    return float(terms["value_mse"])


def main_trainer(epochs=1000, w_jac=0.1, seed=0, n_xg=256):
    """The product path: ``GroupedTrainer`` in Sobolev mode.

    Identical objective to :func:`main_grouped`, but the loop is the
    trainer's — pass ``target_jac`` to ``fit_resident`` and every
    scan-chained device step trains value + jacobian MSE (the fused
    Pallas core on TPU), with padded tails, meshes, and checkpoints
    composing like any other grouped run."""
    from nif_tpu.training import GroupedTrainer

    G = 10
    t, x, u, tj = _grouped_problem(n_xg, G=G)
    cfg_s, cfg_p = _CFG_S, _CFG_P
    model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    trainer = GroupedTrainer(model, optax.adam(1e-4), w_jac=w_jac,
                             seed=seed)
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit_resident(state, t, x, u, target_jac=tj,
                                 epochs=epochs, group_batch=G,
                                 point_batch=n_xg,
                                 verbose_every=max(epochs // 10, 1))
    print(f"path={trainer.history['sobolev_path']}  "
          f"final loss {trainer.history['loss'][-1]:.3e}")
    return trainer.history["loss"][-1]


def main_hessian(epochs=1000, w_jac=0.1, w_hess=1e-3, seed=0, n_xg=256):
    """SECOND-order Sobolev training (round 5): supervise u, du/dx AND
    d2u/dx2 with the packet's analytic derivatives. On TPU the whole step
    — forward, Jacobian and Hessian tangent streams, all three MSE terms,
    and the backward — is ONE fused Pallas pass
    (``ops.pallas_shapenet.shapenet_hessian_grads``, 6.1x the
    nested-jacfwd XLA path at the flagship scale)."""
    from nif_tpu.demo.datasets import traveling_wave_d2udx2
    from nif_tpu.training import GroupedTrainer

    G = 10
    t, x, u, tj = _grouped_problem(n_xg, G=G)
    tw = TravelingWaveHighFreq(n_t=G, n_x=n_xg)
    lo = tw.n_p + tw.n_x
    d2_raw = traveling_wave_d2udx2(
        tw.data_raw[:, 0], tw.data_raw[:, 1], tw.wavenumber)
    # chain rule through both normalizations: d2 u_n / d x_n^2
    th = (d2_raw * tw.std[1] ** 2 / tw.std[lo]).reshape(
        G, n_xg, 1, 1, 1).astype(np.float32)

    model = nif_tpu.NIFMultiScale(_CFG_S, _CFG_P)
    trainer = GroupedTrainer(model, optax.adam(1e-4), w_jac=w_jac,
                             w_hess=w_hess, seed=seed)
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit_resident(state, t, x, u, target_jac=tj,
                                 target_hess=th, epochs=epochs,
                                 group_batch=G, point_batch=n_xg,
                                 verbose_every=max(epochs // 10, 1))
    print(f"path={trainer.history['sobolev_path']}  "
          f"final loss {trainer.history['loss'][-1]:.3e}")
    # per-term metrics incl. the second-order one — evaluation rides the
    # fused forward-over-forward kernel (shapenet_fwd_hess) on TPU
    m = trainer.evaluate_sobolev(state, t, x, u, tj, target_hess=th)
    print("  " + "  ".join(f"{k}={v:.3e}" for k, v in sorted(m.items())))
    return trainer.history["loss"][-1]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--w-jac", type=float, default=0.1)
    ap.add_argument("--w-hess", type=float, default=1e-3)
    ap.add_argument("--grouped", action="store_true",
                    help="grouped layout + fused Sobolev train core")
    ap.add_argument("--trainer", action="store_true",
                    help="GroupedTrainer Sobolev mode (target_jac)")
    ap.add_argument("--hessian", action="store_true",
                    help="second-order Sobolev: + d2u/dx2 targets "
                         "(fused second-order kernel on TPU)")
    args = ap.parse_args()
    if args.hessian:
        main_hessian(args.epochs, args.w_jac, args.w_hess)
    elif args.trainer:
        main_trainer(args.epochs, args.w_jac)
    elif args.grouped:
        main_grouped(args.epochs, args.w_jac)
    else:
        main(args.epochs, args.w_jac)
