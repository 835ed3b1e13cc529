"""Smoke-run the tutorial examples with tiny budgets (CPU).

The reference's tutorials ARE its integration tests (SURVEY.md section 4);
these runs assert each end-to-end workflow executes and trains.
"""
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(EXAMPLES))


def _imp(name):
    import importlib

    return importlib.import_module(name)


def test_tutorial_1_trains_and_finetunes(tmp_path):
    # On the reference-fixture wave packet (round 4) short Adam runs sit
    # on a plateau near 1.0; the L-BFGS leg is what makes a tiny budget
    # meaningful (measured: 60 epochs + 600 iters -> 3.6e-2, vs 0.998 at
    # 30 iters).
    mod = _imp("01_simple_1d_wave")
    mse = mod.main(epochs=60, batch_size=512, lbfgs_iters=600,
                   ckpt_dir=str(tmp_path / "ckpt"))
    assert mse < 0.5  # random init starts ~1.0


def test_tutorial_2_multiscale():
    mod = _imp("02_multi_scale_nif")
    mse = mod.main(epochs=30, batch_size=512)
    assert mse < 2.0


def test_tutorial_3_linear():
    mod = _imp("03_multi_scale_linear_nif")
    mse = mod.main(epochs=20, batch_size=1024)
    assert mse < 2.0


def test_tutorial_4_gradients():
    mod = _imp("04_gradients")
    mean_dudx = mod.main(epochs=30)
    assert mean_dudx >= 0


def test_tutorial_5_streaming(tmp_path):
    mod = _imp("05_large_scale_training")
    loss = mod.main(epochs=2, batch_size=4096, n_points=20_000,
                    workdir=str(tmp_path))
    assert loss < 2.0


def test_tutorial_7_compression():
    mod = _imp("07_compression")
    mse, mse_q = mod.main(epochs=40)
    assert mse < 1.0 and mse_q < 2.0


def test_tutorial_8_sobolev():
    mod = _imp("08_sobolev_training")
    value_mse = mod.main(epochs=10)
    assert value_mse < 5.0


def test_tutorial_8_sobolev_grouped():
    mod = _imp("08_sobolev_training")
    value_mse = mod.main_grouped(epochs=10)
    assert value_mse < 5.0


def test_tutorial_8_sobolev_trainer():
    mod = _imp("08_sobolev_training")
    loss = mod.main_trainer(epochs=10)
    assert np.isfinite(loss)


def test_tutorial_8_sobolev_hessian():
    # second-order mode: u, du/dx AND d2u/dx2 supervised (round 5)
    mod = _imp("08_sobolev_training")
    loss = mod.main_hessian(epochs=10)
    assert np.isfinite(loss)


def test_tutorial_9_data_parallel():
    # Mechanics smoke: the sharded step must actually optimize (finite,
    # below the ~1.0026 init loss). Absolute accuracy at 40 epochs is not
    # meaningful on the reference wave packet (plateau ~0.999 — see
    # test_convergence.py for the calibrated anchors); the mesh-vs-single
    # trajectory EQUIVALENCE is asserted in test_training.py.
    mod = _imp("09_data_parallel")
    mse = mod.main(epochs=40, batch_size=512)
    assert np.isfinite(mse) and mse < 1.0


def test_tutorial_6_regularization():
    mod = _imp("06_regularization")
    mse = mod.run_one("l2_reg", 1e-5, epochs=20)
    assert mse < 2.0


def test_tutorial_10_serving(tmp_path):
    mod = _imp("10_serving")
    rl2 = mod.main(epochs=30, out_dir=str(tmp_path))
    assert rl2 < 1.5


def test_tutorial_11_rom_workflow():
    mod = _imp("11_rom_workflow")
    err = mod.main(epochs=150)
    assert np.isfinite(err)


import numpy as np  # noqa: E402  (used by test above)


def test_tutorial_5_grouped_streaming(tmp_path):
    mod = _imp("05_large_scale_training")
    final = mod.grouped_streaming_demo(workdir=str(tmp_path), epochs=2)
    assert np.isfinite(final)


def test_tutorial_13_paper_scale_smoke(tmp_path):
    """Example 13 (paper-scale 3-D) smoke run on CPU tiny defaults —
    VERDICT round-2 item 8: it was the only untested example."""
    mod = _imp("13_paper_scale_3d")
    err = mod.main(workdir=str(tmp_path), epochs=3)
    assert np.isfinite(err)


def test_tutorial_12_multihost():
    sys.path.insert(0, os.path.abspath(os.path.join(EXAMPLES, "..")))
    mod = _imp("12_multihost")
    assert mod.main(n_processes=2, devices_per_process=2) == 0.0
