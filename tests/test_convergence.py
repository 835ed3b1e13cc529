"""Convergence tests against the reference's accuracy anchors.

BASELINE.md: tutorial-1 vanilla NIF trains to MSE ~1e-4; rebuild target is
rel-L2 < 1e-3. The full-budget runs take minutes, so they are gated behind
NIF_SLOW=1; a trimmed always-on variant checks the convergence *trend*.
"""
import os

import jax
import numpy as np
import optax
import pytest

import nif_tpu
from nif_tpu.demo import TravelingWave
from nif_tpu.training import Trainer
from nif_tpu.utils import rel_l2

SLOW = os.environ.get("NIF_SLOW") == "1"

CFG_S = {"input_dim": 1, "output_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"}
CFG_P = {"input_dim": 1, "latent_dim": 1, "units": 30, "nlayers": 2,
         "activation": "swish"}


def _train(epochs, lr=2e-3, batch_size=512):
    tw = TravelingWave()
    inputs = np.asarray(tw.data[:, :2], np.float32)
    targets = np.asarray(tw.u, np.float32)
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(lr))
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, inputs, targets, epochs=epochs,
                        batch_size=batch_size)
    pred = model.apply(state.params, inputs)
    return trainer.evaluate(state, inputs, targets), float(rel_l2(pred, targets))


def test_tutorial1_convergence_trend():
    """400 epochs must get well below the variance floor (loss_0 ~ 1.0)."""
    mse, _ = _train(epochs=400)
    assert mse < 0.05, f"MSE {mse} after 400 epochs"


@pytest.mark.skipif(not SLOW, reason="set NIF_SLOW=1 for full-budget runs")
def test_tutorial1_full_convergence():
    """Full tutorial-1 budget: MSE ~1e-4 (BASELINE.md anchor)."""
    mse, rl2 = _train(epochs=5000)
    assert mse < 5e-4, f"MSE {mse}"
    assert rl2 < 3e-2, f"rel-L2 {rl2}"


@pytest.mark.skipif(not SLOW, reason="set NIF_SLOW=1 for full-budget runs")
def test_tutorial2_multiscale_full_convergence():
    """Multi-scale SIREN on the high-frequency wave: MSE < 5e-4 with the
    tuned cosine schedule (swept: flat 1e-4 -> 0.23; cosine 1e-3 -> 6e-5)."""
    import sys, os as _os
    sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "examples"))
    import importlib

    mod = importlib.import_module("02_multi_scale_nif")
    mse = mod.main(epochs=4000, batch_size=512)
    assert mse < 5e-4, f"MSE {mse}"


@pytest.mark.skipif(not SLOW, reason="set NIF_SLOW=1 for full-budget runs")
def test_tutorial3_linear_full_convergence():
    """NIF-linear on the area-weighted cylinder flow: weighted MSE < 1e-3
    (the rebuild's rel-L2-style accuracy bar; swept cosine 1e-3 -> 2.4e-4)."""
    import sys, os as _os
    sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "examples"))
    import importlib

    mod = importlib.import_module("03_multi_scale_linear_nif")
    mse = mod.main(epochs=2000, batch_size=1024)
    assert mse < 1e-3, f"weighted MSE {mse}"
