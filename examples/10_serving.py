"""Tutorial 10 (TPU-native extra) — serving: batched predict + AOT export.

Train briefly, then:
  * run padded-batch inference over an arbitrary number of points;
  * export the forward pass to a portable StableHLO artifact with
    ``jax.export`` and reload it WITHOUT the model-building code.
"""
import argparse
import os
import tempfile

import jax
import numpy as np
import optax

import nif_tpu
from nif_tpu.demo import TravelingWave
from nif_tpu.serving import export_apply, load_exported, predict
from nif_tpu.training import Trainer
from nif_tpu.utils import rel_l2


def main(epochs=300, seed=0, out_dir=None):
    out_dir = out_dir or tempfile.mkdtemp(prefix="nif_export_")
    tw = TravelingWave()
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)

    model = nif_tpu.NIF(
        {"input_dim": 1, "output_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"},
        {"input_dim": 1, "latent_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"},
    )
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(seed))
    state = trainer.fit(state, inputs, targets, epochs=epochs, batch_size=512)

    # --- batched inference over "any" number of points ---
    pred = predict(model, state.params, inputs, batch_size=512)
    print(f"predict: {pred.shape}, rel-L2 {float(rel_l2(pred, targets)):.4f}")

    # --- AOT export: StableHLO artifact, reloadable without nif_tpu ---
    path = os.path.join(out_dir, "model.stablehlo")
    export_apply(model, state.params, batch_size=512, path=path)
    loaded = load_exported(path)
    out = np.asarray(loaded(inputs[:512]))
    agree = np.allclose(out, pred[:512], rtol=1e-5, atol=1e-6)
    print(f"exported {os.path.getsize(path)} bytes -> reloaded, agrees: {agree}")
    return float(rel_l2(pred, targets))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    main(args.epochs, out_dir=args.out_dir)
