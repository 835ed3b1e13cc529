"""Tutorial 8 — Sobolev training: match derivatives, not just values.

Covers (reference tutorial/8_revisit_multi_scale_NIF_with_sobolov_training
.ipynb, README.md:234-237): feeding du/dx targets alongside u removes
spurious high-frequency signals; the separate loss terms are monitored
per-epoch (the reference uses custom Keras metrics — here the loss returns
a terms dict).
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWaveHighFreq
from nif_tpu.ops import sobolev_loss


def main(epochs=1000, w_jac=0.1, seed=0):
    tw = TravelingWaveHighFreq(freq=10.0)
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)
    # analytic du/dx_norm of the normalized field: u_raw = sin(2*pi*f*(x - t))
    lo = tw.n_p + tw.n_x
    f = 10.0
    x_raw = tw.data_raw[:, 1]
    t_raw = tw.data_raw[:, 0]
    dudx_raw = 2 * np.pi * f * np.cos(2 * np.pi * f * (x_raw - t_raw))
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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--w-jac", type=float, default=0.1)
    args = ap.parse_args()
    main(args.epochs, args.w_jac)
