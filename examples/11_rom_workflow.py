"""Tutorial 11 (workflow capstone) — the NIF reduced-order-model pipeline.

The point of NIF (JMLR 2023): compress a spatio-temporal field into a
low-dimensional latent trajectory, then work entirely in latent space.
This example runs the full loop the reference enables via its subnetwork
extractors (reference README.md:99-117):

  1. train a NIF on snapshot data;
  2. encode: t -> latent trajectory  (p_to_lr);
  3. decode: latent -> ShapeNet weights -> field on ANY mesh
     (lr_to_w + x_to_u_given_w) — including a finer mesh than trained on;
  4. latent-space surrogate: fit dt-dynamics on the latent trajectory and
     roll it forward, decoding predicted latents back to fields.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWave
from nif_tpu.training import Trainer
from nif_tpu.utils import rel_l2


def main(epochs=3000, seed=0):
    tw = TravelingWave(n_t=20, n_x=100)
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)

    model = nif_tpu.NIF(
        {"input_dim": 1, "output_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"},
        {"input_dim": 1, "latent_dim": 2, "units": 30, "nlayers": 2,
         "activation": "swish"},
    )
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit(state, inputs, targets, epochs=epochs, batch_size=512)
    print(f"trained: MSE {trainer.evaluate(state, inputs, targets):.3e}")

    # ---- 2. encode the parameter axis into the latent trajectory --------
    t_grid = np.unique(inputs[:, :1], axis=0)  # [T, 1]
    latents = np.asarray(model.p_to_lr(state.params, t_grid))  # [T, k]
    print(f"latent trajectory: {latents.shape} (k={latents.shape[1]})")

    # ---- 3. decode on a FINER mesh than trained on (mesh-agnostic!) -----
    x_fine = np.linspace(0, 1, 400, endpoint=False)[:, None].astype(np.float32)
    x_fine_n = ((x_fine - tw.mean[1]) / tw.std[1]).astype(np.float32)
    wb = model.lr_to_w(state.params, latents[5:6])  # snapshot 5
    u_fine = model.x_to_u_given_w(
        np.broadcast_to(x_fine_n, (400, 1)), np.broadcast_to(wb, (400, wb.shape[1]))
    )
    print(f"decoded snapshot on 4x finer mesh: {np.asarray(u_fine).shape}")

    # ---- 4. latent dynamics surrogate: linear one-step model ------------
    z = latents
    A, *_ = np.linalg.lstsq(z[:-1], z[1:], rcond=None)  # z_{t+1} ~ z_t @ A
    z_roll = [z[0]]
    for _ in range(len(z) - 1):
        z_roll.append(z_roll[-1] @ A)
    z_roll = np.stack(z_roll)
    # decode the rolled-out latents at the training mesh and compare
    x_train = np.unique(inputs[:, 1:2], axis=0)
    errs = []
    for i in range(len(t_grid)):
        wb_i = model.lr_to_w(state.params, z_roll[i : i + 1])
        u_i = model.x_to_u_given_w(
            x_train, np.broadcast_to(wb_i, (len(x_train), wb_i.shape[1]))
        )
        mask = np.isclose(inputs[:, 0], t_grid[i, 0])
        u_true = targets[mask]
        errs.append(float(rel_l2(np.asarray(u_i), u_true)))
    print(f"latent-surrogate rollout rel-L2: mean {np.mean(errs):.3f}, "
          f"max {np.max(errs):.3f}")
    return float(np.mean(errs))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3000)
    main(ap.parse_args().epochs)
