"""Fused Pallas ShapeNet kernel vs the XLA reference path (interpret mode
on CPU; the compiled path is exercised on TPU by bench.py / verify runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nif_tpu.config import ShapeNetConfig, shapenet_param_count
from nif_tpu.ops.pallas_shapenet import fused_supported, shapenet_grouped_fused
from nif_tpu.ops.shapenet import shapenet_grouped

CASES = [
    ("siren", ShapeNetConfig(3, 1, 128, 2, "sine", False, 30.0)),
    ("siren", ShapeNetConfig(2, 2, 64, 1, "sine", True, 10.0)),
    ("siren", ShapeNetConfig(1, 1, 16, 3, "sine", False, 5.0)),
    ("vanilla", ShapeNetConfig(2, 3, 32, 2, "swish")),
    ("vanilla", ShapeNetConfig(1, 1, 16, 1, "tanh")),
    ("vanilla", ShapeNetConfig(2, 1, 64, 2, "relu")),
]


def _data(cfg, G=3, P=256, seed=0):
    rng = np.random.default_rng(seed)
    po = shapenet_param_count(cfg, 0)
    # SIREN-regime weight scale: keeps omega*z bounded so f32 association
    # differences don't get chaotically amplified by sin.
    wb = jnp.asarray(rng.standard_normal((G, po)) * (0.3 / cfg.omega_0), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, cfg.input_dim)), jnp.float32)
    return wb, x


@pytest.mark.parametrize("variant,cfg", CASES)
def test_forward_matches_xla(variant, cfg):
    wb, x = _data(cfg)
    ref = shapenet_grouped(wb, x, cfg, variant)
    out = shapenet_grouped_fused(wb, x, cfg, variant, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize("variant,cfg", CASES)
def test_gradients_match_xla(variant, cfg):
    wb, x = _data(cfg, seed=1)
    g = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 256, cfg.output_dim)) * 0.1,
        jnp.float32,
    )
    _, vjp_ref = jax.vjp(lambda wb, x: shapenet_grouped(wb, x, cfg, variant), wb, x)
    dwb_r, dx_r = vjp_ref(g)
    _, vjp_f = jax.vjp(
        lambda wb, x: shapenet_grouped_fused(wb, x, cfg, variant, True), wb, x
    )
    dwb_f, dx_f = vjp_f(g)
    scale_wb = float(jnp.max(jnp.abs(dwb_r))) + 1e-9
    scale_x = float(jnp.max(jnp.abs(dx_r))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(dwb_f) / scale_wb, np.asarray(dwb_r) / scale_wb, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(dx_f) / scale_x, np.asarray(dx_r) / scale_x, atol=5e-5
    )


def test_unsupported_falls_back():
    cfg = ShapeNetConfig(
        1, 1, 4, 1, "sine", connectivity="last_layer"
    )
    assert not fused_supported(cfg, "siren", 256)
    # Odd P with no valid tile
    cfg2 = ShapeNetConfig(1, 1, 16, 1, "sine")
    assert not fused_supported(cfg2, "siren", 257)
    # Fallback still computes (via XLA path)
    wb, x = _data(ShapeNetConfig(1, 1, 16, 1, "sine"), P=257)
    out = shapenet_grouped_fused(wb, x, ShapeNetConfig(1, 1, 16, 1, "sine"), "siren", True)
    assert out.shape == (3, 257, 1)


def test_model_fused_flag_matches_xla():
    """apply_grouped(fused=True interpret) vs fused=False through a model."""
    from nif_tpu import NIFMultiScale

    cfg_s = {
        "input_dim": 2, "output_dim": 1, "units": 32, "nlayers": 2,
        "activation": "sine", "use_resblock": False, "omega_0": 30.0,
        "connectivity": "full", "weight_init_factor": 0.01,
    }
    cfg_p = {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    model = NIFMultiScale(cfg_s, cfg_p)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 128, 2)), jnp.float32)
    # On CPU the interpreter handles the fused path.
    u_xla = model.apply_grouped(params, t, x, fused=False)
    wb = model.p_to_w(params, t)
    u_fused = shapenet_grouped_fused(wb, x, model.cfg_shape_net, "siren", True)
    np.testing.assert_allclose(
        np.asarray(u_fused), np.asarray(u_xla), rtol=2e-4, atol=1e-5
    )


class TestFusedMseGrads:
    @pytest.mark.parametrize("variant,cfg", CASES[:3])
    def test_matches_value_and_grad(self, variant, cfg):
        wb, x = _data(cfg, seed=3)
        rng = np.random.default_rng(4)
        tgt = jnp.asarray(rng.standard_normal((3, 256, cfg.output_dim)), jnp.float32)
        w = jnp.asarray(rng.uniform(0.5, 1.5, (3, 256)), jnp.float32)
        from nif_tpu.ops.pallas_shapenet import shapenet_mse_grads

        for weight in [None, w]:
            def loss_fn(wb):
                pred = shapenet_grouped(wb, x, cfg, variant)
                err = jnp.square(pred - tgt)
                if weight is not None:
                    err = err * weight[..., None]
                return jnp.mean(err)

            l_ref, g_ref = jax.value_and_grad(loss_fn)(wb)
            l_f, g_f = shapenet_mse_grads(wb, x, tgt, cfg, variant, weight, True)
            assert float(l_f) == pytest.approx(float(l_ref), rel=1e-5)
            scale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(g_f) / scale, np.asarray(g_ref) / scale, atol=5e-6
            )

    def test_model_level_fused_train_matches(self):
        """mse_value_and_grad(fused=True interpret) == plain value_and_grad."""
        from nif_tpu import NIFMultiScale

        cfg_s = {"input_dim": 2, "output_dim": 1, "units": 32, "nlayers": 2,
                 "activation": "sine", "use_resblock": False, "omega_0": 10.0,
                 "connectivity": "full", "weight_init_factor": 0.01}
        cfg_p = {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
                 "activation": "swish"}
        model = NIFMultiScale(cfg_s, cfg_p)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(5)
        t = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 128, 2)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((2, 128, 1)), jnp.float32)
        l_ref, g_ref = model.mse_value_and_grad(params, t, x, u, fused=False)
        l_f, g_f = model.mse_value_and_grad(params, t, x, u, fused=True)
        assert float(l_f) == pytest.approx(float(l_ref), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_f)):
            scale = float(jnp.max(jnp.abs(a))) + 1e-9
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale, atol=1e-5)


class TestNIFLinearFusedTrain:
    """Fused NIF-linear train kernel (interpret mode) vs jax.value_and_grad
    over the unfused path — loss and every grad leaf must match."""

    def _model(self, so=1, resblock=False, K=8):
        import nif_tpu

        cfg_s = {"input_dim": 2, "output_dim": so, "units": 16, "nlayers": 2,
                 "activation": "sine", "use_resblock": resblock,
                 "omega_0": 5.0, "connectivity": "last_layer",
                 "weight_init_factor": 1.0}
        cfg_p = {"input_dim": 1, "latent_dim": K, "units": 16, "nlayers": 1,
                 "activation": "swish", "use_resblock": False, "omega_0": 5.0}
        return nif_tpu.NIFMultiScaleLastLayerParameterized(cfg_s, cfg_p)

    @pytest.mark.parametrize("so,resblock,weighted", [
        (1, False, False), (2, False, True), (1, True, False),
        (3, True, True),
    ])
    def test_matches_unfused(self, so, resblock, weighted):
        model = self._model(so=so, resblock=resblock)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        G, P = 3, 64
        t = jnp.asarray(rng.standard_normal((G, 1)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((G, P, 2)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((G, P, so)), jnp.float32)
        w = (jnp.asarray(rng.uniform(0.5, 1.5, (G, P)), jnp.float32)
             if weighted else None)

        loss_r, grads_r = model.mse_value_and_grad(params, t, x, u, weight=w,
                                                   fused=False)
        loss_f, grads_f = model.mse_value_and_grad(params, t, x, u, weight=w,
                                                   fused=True)
        assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
        flat_r = jax.tree_util.tree_leaves_with_path(grads_r)
        flat_f = dict(jax.tree_util.tree_leaves_with_path(grads_f))
        for path, leaf_r in flat_r:
            leaf_f = flat_f[path]
            scale = float(jnp.max(jnp.abs(leaf_r))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(leaf_f) / scale, np.asarray(leaf_r) / scale,
                atol=5e-5, err_msg=str(path),
            )

    def test_regularized_fused(self):
        import nif_tpu

        cfg_s = {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
                 "activation": "sine", "use_resblock": False, "omega_0": 5.0,
                 "connectivity": "last_layer", "weight_init_factor": 1.0,
                 "l2_reg": 1e-3}
        cfg_p = {"input_dim": 1, "latent_dim": 8, "units": 16, "nlayers": 1,
                 "activation": "swish", "use_resblock": False, "omega_0": 5.0,
                 "act_l2_reg": 1e-3}
        model = nif_tpu.NIFMultiScaleLastLayerParameterized(cfg_s, cfg_p)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(1)
        t = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 32, 2)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((2, 32, 1)), jnp.float32)
        loss_r, grads_r = model.mse_value_and_grad(params, t, x, u, fused=False)
        loss_f, grads_f = model.mse_value_and_grad(params, t, x, u, fused=True)
        assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(grads_f),
                        jax.tree_util.tree_leaves(grads_r)):
            scale = float(jnp.max(jnp.abs(b))) + 1e-9
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=5e-5)


def test_tile_picks_pinned():
    """Hardware-calibrated tile choices (round-2 sweeps): bf16 takes the
    enlarged tiles, f32 keeps the conservative ones. A silent change here
    is a measured perf regression (train +25%, linear +30%, fwd +9%) or a
    real-compile OOM (round-4 re-probe: w256 train @TP=4096 and
    w128-d4-resblock @TP=2048 still fail real compiles even with the
    halved compute-dtype residuals — do not loosen these without a
    hardware run)."""
    from nif_tpu.config import ShapeNetConfig
    from nif_tpu.ops.pallas_shapenet import _pick_tile, _pick_tile_linear

    mk = lambda u, n, r, out=1: ShapeNetConfig(
        input_dim=3, output_dim=out, units=u, nlayers=n, activation="sine",
        use_resblock=r, omega_0=30.0, connectivity="full")
    P = 32768
    # train/backward
    assert _pick_tile(P, mk(128, 2, False)) == 4096
    assert _pick_tile(P, mk(256, 2, False)) == 2048
    assert _pick_tile(P, mk(128, 8, True)) == 512
    assert _pick_tile(P, mk(128, 2, False), itemsize=4) == 1024  # f32
    # forward
    assert _pick_tile(P, mk(128, 2, False), backward=False) == 8192
    assert _pick_tile(P, mk(256, 2, False), backward=False) == 4096
    assert _pick_tile(P, mk(128, 2, False), backward=False, itemsize=4) == 2048
    # NIF-linear trunk (output_dim = so*K)
    assert _pick_tile_linear(P, mk(128, 2, False, out=128)) == 2048
    assert _pick_tile_linear(P, mk(128, 2, False, out=128), itemsize=4) == 1024
    # fwd+jac forward-tangent mode (rev mode reuses the backward picks);
    # f32 charge validated on hardware: w64 so=2/si=1 hit 17.15M scoped
    # at TP=2048 before the per-stream pad surcharge
    from nif_tpu.ops.pallas_shapenet import _pick_tile_jac, _pick_tile_sobolev
    assert _pick_tile_jac(P, mk(128, 2, False), si=3, itemsize=2) == 2048
    assert _pick_tile_jac(P, mk(64, 2, False), si=1, itemsize=4) == 1024
    # fused Sobolev train kernel (validated at the 62.9M pts/s run)
    assert _pick_tile_sobolev(P, mk(128, 2, False), si=3, itemsize=2) == 512
    assert _pick_tile_sobolev(P, mk(128, 2, False), si=3, itemsize=4) == 256
