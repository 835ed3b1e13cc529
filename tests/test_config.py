"""Config layer: po_dim formulas, segment sizes, JSON round-trip parity."""
import json

import pytest

from nif_tpu.config import (
    NIFConfig,
    ParameterNetConfig,
    ShapeNetConfig,
    shapenet_param_count,
    shapenet_segment_sizes,
)


def brute_force_count(si, so, n, l, resblock):
    """Count parameters of the ShapeNet by enumerating layer tensors."""
    mats = [si * n] + [n * n] * ((2 if resblock else 1) * l) + [n * so]
    biases = [n] + [n] * ((2 if resblock else 1) * l) + [so]
    return sum(mats) + sum(biases)


@pytest.mark.parametrize("si,so,n,l", [(1, 1, 30, 2), (2, 3, 128, 4), (3, 1, 8, 0)])
@pytest.mark.parametrize("resblock", [False, True])
def test_po_dim_full(si, so, n, l, resblock):
    cfg = ShapeNetConfig(
        input_dim=si, output_dim=so, units=n, nlayers=l, use_resblock=resblock
    )
    assert shapenet_param_count(cfg, latent_dim=7) == brute_force_count(
        si, so, n, l, resblock
    )


def test_po_dim_closed_forms():
    # The exact closed forms from reference nif/model.py:169-173, :572-582.
    cfg = ShapeNetConfig(input_dim=2, output_dim=3, units=10, nlayers=4)
    assert shapenet_param_count(cfg, 0) == 4 * 100 + (2 + 3 + 1 + 4) * 10 + 3
    cfg_r = ShapeNetConfig(
        input_dim=2, output_dim=3, units=10, nlayers=4, use_resblock=True
    )
    assert shapenet_param_count(cfg_r, 0) == 8 * 100 + (2 + 3 + 1 + 8) * 10 + 3


def test_po_dim_last_layer():
    cfg = ShapeNetConfig(
        input_dim=2, output_dim=3, units=10, nlayers=4, connectivity="last_layer"
    )
    assert shapenet_param_count(cfg, latent_dim=17) == 17


def test_segment_sizes_sum():
    cfg = ShapeNetConfig(input_dim=2, output_dim=3, units=16, nlayers=3)
    nw1, nwh, nwl, nb = shapenet_segment_sizes(cfg)
    assert nw1 + nwh + nwl + nb == shapenet_param_count(cfg, 0)
    assert nw1 == 2 * 16 and nwl == 3 * 16


def test_config_json_roundtrip(tmp_path):
    cfg = NIFConfig(
        shape_net=ShapeNetConfig(input_dim=1, output_dim=1, units=30, nlayers=2,
                                 activation="swish"),
        parameter_net=ParameterNetConfig(input_dim=1, latent_dim=1, units=30,
                                         nlayers=2, activation="swish"),
        mixed_policy="float32",
    )
    p = tmp_path / "config.json"
    cfg.save(str(p))
    loaded = NIFConfig.load(str(p))
    assert loaded == cfg
    # Reference-schema keys present (reference nif/model.py:474-478).
    raw = json.loads(p.read_text())
    assert set(raw) == {"cfg_shape_net", "cfg_parameter_net", "mixed_policy"}
    assert raw["cfg_shape_net"]["units"] == 30


def test_config_accepts_reference_style_dicts():
    # The exact dict shape a reference user would pass.
    cfg_shape = {
        "connectivity": "full",
        "input_dim": 1,
        "output_dim": 1,
        "units": 30,
        "nlayers": 2,
        "weight_init_factor": 0.01,
        "omega_0": 30.0,
        "activation": "sine",
        "use_resblock": False,
    }
    s = ShapeNetConfig.from_dict(cfg_shape)
    assert s.units == 30 and s.omega_0 == 30.0


def test_bad_connectivity_raises():
    cfg = ShapeNetConfig(input_dim=1, output_dim=1, units=4, nlayers=1,
                         connectivity="nope")
    with pytest.raises(ValueError):
        shapenet_param_count(cfg, 3)
