"""CLI driver: train + resume + eval round-trip on a tiny dataset."""
import json
import os

import numpy as np
import pytest

from nif_tpu.cli import main as cli_main


@pytest.fixture
def workdir(tmp_path):
    cfg = {
        "cfg_shape_net": {"input_dim": 1, "output_dim": 1, "units": 8,
                          "nlayers": 1, "activation": "tanh"},
        "cfg_parameter_net": {"input_dim": 1, "latent_dim": 1, "units": 8,
                              "nlayers": 1, "activation": "tanh"},
        "mixed_policy": "float32",
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    t = rng.uniform(0, 1, 400).astype(np.float32)
    x = rng.uniform(0, 1, 400).astype(np.float32)
    u = np.sin(2 * np.pi * (x - t)).astype(np.float32)
    np.savez(tmp_path / "data.npz", data=np.stack([t, x, u], -1))
    return tmp_path


def test_cli_train_eval(workdir, capsys):
    ckpt = str(workdir / "ckpt")
    mse = cli_main([
        "train", "--config", str(workdir / "config.json"),
        "--data", str(workdir / "data.npz"), "--epochs", "30",
        "--batch-size", "200", "--ckpt-dir", ckpt,
    ])
    assert mse < 1.0
    assert os.path.exists(os.path.join(ckpt, "config.json"))

    mse_eval = cli_main([
        "eval", "--config", str(workdir / "config.json"),
        "--data", str(workdir / "data.npz"), "--ckpt-dir", ckpt,
        "--batch-size", "128",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert "rel_l2" in parsed and parsed["mse"] == pytest.approx(mse_eval)


def test_cli_lbfgs_flag(workdir):
    mse = cli_main([
        "train", "--config", str(workdir / "config.json"),
        "--data", str(workdir / "data.npz"), "--epochs", "10",
        "--batch-size", "400", "--lbfgs", "20",
    ])
    assert np.isfinite(mse)
