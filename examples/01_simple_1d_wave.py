"""Tutorial 1 — Hello world: vanilla NIF on a 1-D traveling wave.

Covers (reference tutorial/1_simple_1d_wave.ipynb, README.md:201-205):
  * building ``nif_tpu.NIF`` from reference-style cfg dicts
  * mixed-precision training
  * checkpoint save / restore
  * L-BFGS fine-tuning
"""
import argparse

import jax
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWave
from nif_tpu.optimizers import LBFGS
from nif_tpu.training import Checkpointer, LossPrintingCallback, Trainer

cfg_shape_net = {
    "input_dim": 1,
    "output_dim": 1,
    "units": 30,
    "nlayers": 2,
    "activation": "swish",
}
cfg_parameter_net = {
    "input_dim": 1,
    "latent_dim": 1,
    "units": 30,
    "nlayers": 2,
    "activation": "swish",
}


def main(epochs=5000, batch_size=512, lbfgs_iters=1000, ckpt_dir=None,
         mixed_policy="float32", seed=0):
    tw = TravelingWave()
    inputs = np.asarray(tw.data[:, :2], np.float32)  # [t, x]
    targets = np.asarray(tw.u, np.float32)

    model = nif_tpu.NIF(cfg_shape_net, cfg_parameter_net, mixed_policy)
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit(
        state, inputs, targets, epochs=epochs, batch_size=batch_size,
        callbacks=[LossPrintingCallback(every=max(epochs // 10, 1))],
    )
    mse = trainer.evaluate(state, inputs, targets)
    print(f"Adam training MSE: {mse:.3e}")

    # checkpoint + config persistence (README.md:179-195 equivalent)
    if ckpt_dir:
        model.save_config(f"{ckpt_dir}/config.json")
        ckpt = Checkpointer(ckpt_dir)
        ckpt.save(epochs, state.params)
        ckpt.wait()
        restored = ckpt.restore(template=state.params)
        assert (
            float(trainer.evaluate(type(state)(restored, state.opt_state), inputs, targets))
            == mse
        )
        print(f"checkpoint round-trip OK at {ckpt_dir}")

    # L-BFGS fine-tune (README.md:51-69 equivalent)
    if lbfgs_iters:
        tuner = LBFGS(model, inputs=inputs, targets=targets)
        params = tuner.minimize(state.params, rounds=1, max_iter=lbfgs_iters)
        state = type(state)(params, state.opt_state, state.step)
        mse = trainer.evaluate(state, inputs, targets)
        print(f"after L-BFGS fine-tune MSE: {mse:.3e}")
    return mse


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--lbfgs-iters", type=int, default=1000)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--mixed-policy", default="float32")
    args = ap.parse_args()
    main(args.epochs, args.batch_size, args.lbfgs_iters, args.ckpt_dir,
         args.mixed_policy)
