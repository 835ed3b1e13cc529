"""Tutorial 9 (TPU-native extra) — data-parallel training over a device mesh.

The reference's distribution story is user-side
``tf.distribute.MirroredStrategy`` (reference README.md:39-49). The
TPU-native equivalent: a ``jax.sharding.Mesh``, batch sharded over the
``data`` axis, params replicated — XLA inserts the gradient all-reduce over
ICI. Works on any device count (runs on 1 chip, scales to a pod slice; test
on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
import argparse

import jax
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWave
from nif_tpu.parallel import make_mesh
from nif_tpu.training import Trainer


def main(epochs=500, batch_size=512, seed=0):
    mesh = make_mesh()
    print(f"mesh: {mesh.shape} over {len(mesh.devices.ravel())} devices")

    tw = TravelingWave()
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)

    model = nif_tpu.NIF(
        {"input_dim": 1, "output_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"},
        {"input_dim": 1, "latent_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"},
    )
    # any batch_size works: the trainer rounds up to the data-axis size
    # and zero-weight-pads, so nothing is dropped
    trainer = Trainer(model, optax.adam(2e-3), mesh=mesh)
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit(state, inputs, targets, epochs=epochs,
                        batch_size=batch_size)
    mse = trainer.evaluate(state, inputs, targets)
    print(f"data-parallel MSE: {mse:.3e}")
    return mse


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args()
    main(args.epochs, args.batch_size)
