"""Serving: batched predict, AOT export round-trip."""
import jax
import numpy as np
import pytest

import nif_tpu
from nif_tpu.serving import export_apply, load_exported, predict

CFG_S = {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "tanh"}
CFG_P = {"input_dim": 1, "latent_dim": 1, "units": 8, "nlayers": 1,
         "activation": "tanh"}


@pytest.fixture(scope="module")
def model_and_params():
    model = nif_tpu.NIF(CFG_S, CFG_P)
    return model, model.init(jax.random.key(0))


def test_predict_matches_apply(model_and_params):
    model, params = model_and_params
    inputs = np.random.default_rng(0).standard_normal((1000, 2)).astype(np.float32)
    direct = np.asarray(model.apply(params, inputs))
    batched = predict(model, params, inputs, batch_size=128)
    np.testing.assert_allclose(batched, direct, rtol=1e-6, atol=1e-7)


def test_predict_ragged_and_empty(model_and_params):
    model, params = model_and_params
    inputs = np.random.default_rng(1).standard_normal((37, 2)).astype(np.float32)
    out = predict(model, params, inputs, batch_size=16)
    assert out.shape == (37, 1)
    assert predict(model, params, np.zeros((0, 2), np.float32)).size == 0


def test_export_roundtrip(model_and_params, tmp_path):
    model, params = model_and_params
    path = str(tmp_path / "model.stablehlo")
    export_apply(model, params, batch_size=32, path=path)
    loaded = load_exported(path)
    inputs = np.random.default_rng(2).standard_normal((32, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded(inputs)),
        np.asarray(model.apply(params, inputs)),
        rtol=1e-6, atol=1e-7,
    )


def test_export_bytes_roundtrip(model_and_params):
    model, params = model_and_params
    blob = export_apply(model, params, batch_size=8)
    loaded = load_exported(blob)
    inputs = np.zeros((8, 2), np.float32)
    assert np.asarray(loaded(inputs)).shape == (8, 1)


def test_predict_empty_input_keeps_output_shape():
    model = nif_tpu.NIF(CFG_S, CFG_P)
    params = model.init(jax.random.key(0))
    out = predict(model, params, np.zeros((0, 2), np.float32))
    assert out.shape == (0, model.so_dim)
    assert out.dtype == np.dtype(model.policy.param_dtype)
