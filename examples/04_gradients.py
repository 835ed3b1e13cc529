"""Tutorial 4 — Input-output Jacobians and Hessians.

Covers (reference tutorial/4_get_gradients_by_wrapping_model_with_layer.ipynb,
README.md:216-217): the ``JacobianLayer``/``HessianLayer`` equivalents —
here plain function calls composed with the model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWave
from nif_tpu.ops import output_and_jacobian, output_jacobian_hessian
from nif_tpu.training import Trainer


def main(epochs=500, seed=0):
    tw = TravelingWave()
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)

    cfg = {"input_dim": 1, "output_dim": 1, "units": 30, "nlayers": 2,
           "activation": "tanh"}
    cfg_p = {"input_dim": 1, "latent_dim": 1, "units": 30, "nlayers": 2,
             "activation": "tanh"}
    model = nif_tpu.NIF(cfg, cfg_p)
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit(state, inputs, targets, epochs=epochs, batch_size=512)

    # (y, dy/dx): jacobian of the field w.r.t. [t, x]
    fn = lambda inp: model.apply(state.params, inp)
    y, jac = output_and_jacobian(fn, jnp.asarray(inputs[:100]))
    print(f"y {y.shape}, du/d[t,x] {jac.shape}")
    # du/dx only:
    _, dudx = output_and_jacobian(fn, jnp.asarray(inputs[:100]), x_index=[1])
    print(f"du/dx {dudx.shape}, mean |du/dx| = {float(jnp.mean(jnp.abs(dudx))):.3f}")

    # second derivatives
    y, jac, hess = output_jacobian_hessian(fn, jnp.asarray(inputs[:10]))
    print(f"hessian {hess.shape} (d2u/dx2[0] = {float(hess[0, 0, 1, 1]):.4f})")

    # at scale, use the GROUPED second-order evaluator: the hypernet runs
    # once per snapshot and, for sine chains on TPU, (y, jac, hess) comes
    # out of ONE fused forward-over-forward kernel (shapenet_fwd_hess,
    # 4.0x the nested-jacfwd XLA path at the flagship shape) — e.g. the
    # field's Laplacian over a full snapshot:
    from nif_tpu.ops import output_jacobian_hessian_grouped

    t_g = np.unique(inputs[:, :1], axis=0)  # [G, 1] snapshot times
    x_g = np.broadcast_to(np.unique(inputs[:, 1:], axis=0),
                          (len(t_g), tw.n_x_grid, 1))  # [G, P, 1]
    yg, jg, hg = output_jacobian_hessian_grouped(
        model, state.params, jnp.asarray(t_g), jnp.asarray(x_g))
    lap = hg[..., 0, 0, 0]  # d2u/dx2 per point, [G, P]
    print(f"grouped hessian {hg.shape}, mean |d2u/dx2| = "
          f"{float(jnp.mean(jnp.abs(lap))):.3f}")
    return float(jnp.mean(jnp.abs(dudx)))


if __name__ == "__main__":
    main()
