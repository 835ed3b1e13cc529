"""Utils: policy, metrics, precision context, regularization paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nif_tpu
from nif_tpu.config import ParameterNetConfig, ShapeNetConfig
from nif_tpu.utils import Policy, get_policy, high_precision, mse, rel_l2, rmse


class TestPolicy:
    def test_float32(self):
        p = get_policy("float32")
        assert p.param_dtype == jnp.float32 and p.compute_dtype == jnp.float32

    def test_mixed_bfloat16(self):
        p = get_policy("mixed_bfloat16")
        assert p.param_dtype == jnp.float32 and p.compute_dtype == jnp.bfloat16

    def test_mixed_float16_maps_to_bf16(self):
        # reference-config compat: f16 has no TPU advantage
        p = get_policy("mixed_float16")
        assert p.compute_dtype == jnp.bfloat16

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_policy("float8")

    def test_policy_passthrough(self):
        p = get_policy("float32")
        assert get_policy(p) is p

    def test_mixed_model_output_is_param_dtype(self):
        model = nif_tpu.NIF(
            {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
             "activation": "tanh"},
            {"input_dim": 1, "latent_dim": 1, "units": 8, "nlayers": 1,
             "activation": "tanh"},
            mixed_policy="mixed_bfloat16",
        )
        params = model.init(jax.random.key(0))
        # params stored in f32
        assert all(
            p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params)
        )
        u = model.apply(params, np.zeros((3, 2), np.float32))
        assert u.dtype == jnp.float32  # cast back at the boundary


class TestMetrics:
    def test_rel_l2(self):
        t = jnp.asarray([3.0, 4.0])
        assert float(rel_l2(t, t)) == 0.0
        assert float(rel_l2(jnp.zeros(2), t)) == pytest.approx(1.0)
        # scale invariance
        assert float(rel_l2(2 * t, t)) == pytest.approx(1.0)

    def test_mse_rmse(self):
        a, b = jnp.asarray([1.0, 3.0]), jnp.asarray([1.0, 1.0])
        assert float(mse(a, b)) == pytest.approx(2.0)
        assert float(rmse(a, b)) == pytest.approx(np.sqrt(2.0))


class TestRegularization:
    def _model(self, **pnet_extra):
        cfg_s = ShapeNetConfig(input_dim=1, output_dim=1, units=8, nlayers=1,
                               activation="tanh")
        cfg_p = ParameterNetConfig(input_dim=1, latent_dim=2, units=8,
                                   nlayers=1, activation="tanh", **pnet_extra)
        return nif_tpu.NIF(cfg_s, cfg_p)

    def test_no_reg_is_zero(self):
        m = self._model()
        params = m.init(jax.random.key(0))
        assert float(m.regularization_loss(params)) == 0.0

    def test_l2_reg_positive(self):
        m = self._model(l2_reg=1e-3)
        params = m.init(jax.random.key(0))
        val = float(m.regularization_loss(params))
        expected = 1e-3 * sum(
            float(jnp.sum(jnp.square(p)))
            for p in jax.tree_util.tree_leaves(params["pnet"])
        )
        assert val == pytest.approx(expected, rel=1e-5)

    def test_l1_reg(self):
        m = self._model(l1_reg=1e-3)
        params = m.init(jax.random.key(0))
        assert float(m.regularization_loss(params)) > 0

    def test_act_reg_requires_inputs(self):
        m = self._model(act_l1_reg=0.1)
        params = m.init(jax.random.key(0))
        with pytest.raises(ValueError):
            m.regularization_loss(params)
        inputs = jnp.zeros((4, 2))
        assert float(m.regularization_loss(params, inputs)) >= 0

    def test_act_l2_reg(self):
        m = self._model(act_l2_reg=0.1)
        params = m.init(jax.random.key(0))
        inputs = jnp.ones((4, 2))
        # act reg = 0.1 * sum(wb^2) / batch over the pnet output (Keras
        # activity_regularizer semantics: penalty divided by batch size)
        wb = m.p_to_w(params, inputs[:, :1])
        expected = 0.1 * float(jnp.sum(jnp.square(wb))) / 4
        assert float(m.regularization_loss(params, inputs)) == pytest.approx(
            expected, rel=1e-5
        )


class TestHighPrecision:
    def test_context_runs(self):
        with high_precision():
            a = jnp.ones((8, 8))
            out = jax.jit(lambda a: a @ a)(a)
        assert float(out[0, 0]) == 8.0


class TestInitDistributions:
    """Init parity with the reference distributions (SURVEY.md section 8.2)."""

    def test_truncated_normal_bounds(self):
        from nif_tpu.layers import truncated_normal_init

        w = truncated_normal_init(jax.random.key(0), (10000,), stddev=0.1)
        w = np.asarray(w)
        assert np.abs(w).max() <= 0.2 + 1e-6  # truncated at 2 stddev
        assert 0.07 < w.std() < 0.1

    def test_siren_first_bounds(self):
        from nif_tpu.layers import siren_first_init

        w, b = siren_first_init(jax.random.key(0), 4, 5000)
        assert float(jnp.abs(w).max()) <= 1 / 4 + 1e-6
        assert float(jnp.abs(b).max()) <= 1 / 2 + 1e-6

    def test_siren_hidden_bounds(self):
        from nif_tpu.layers import siren_hidden_init

        w, b = siren_hidden_init(jax.random.key(0), 64, 2000, omega_0=30.0)
        lim = np.sqrt(6.0 / 64) / 30.0
        assert float(jnp.abs(w).max()) <= lim + 1e-7
        assert float(jnp.abs(b).max()) <= 1 / 8 + 1e-6

    def test_hyper_bias_segment_scales(self):
        from nif_tpu.layers import hyper_bias_scales

        s = hyper_bias_scales(
            num_outputs=100, num_weight_first=10, num_weight_hidden=50,
            num_weight_last=20, input_dim=2, width=16, omega_0=30.0,
        )
        np.testing.assert_allclose(s[:10], 1 / 2)
        np.testing.assert_allclose(s[10:60], np.sqrt(6 / 16) / 30)
        np.testing.assert_allclose(s[60:80], np.sqrt(6 / 32))
        np.testing.assert_allclose(s[80:], 1 / 16)


class TestRegularizationGrouped:
    def test_act_reg_with_t_rows(self):
        import nif_tpu
        from nif_tpu.config import ParameterNetConfig, ShapeNetConfig

        m = nif_tpu.NIF(
            ShapeNetConfig(1, 1, 8, 1, "tanh"),
            ParameterNetConfig(1, 2, 8, 1, "tanh", act_l2_reg=0.1),
        )
        params = m.init(jax.random.key(0))
        t = jnp.ones((4, 1))
        wb = m.p_to_w(params, t)
        expected = 0.1 * float(jnp.sum(jnp.square(wb))) / 4  # / batch (Keras)
        assert float(m.regularization_loss(params, t=t)) == pytest.approx(
            expected, rel=1e-5
        )

    def test_mse_value_and_grad_with_reg(self):
        import nif_tpu
        from nif_tpu.config import ParameterNetConfig, ShapeNetConfig

        m = nif_tpu.NIF(
            ShapeNetConfig(1, 1, 8, 1, "tanh"),
            ParameterNetConfig(1, 2, 8, 1, "tanh", l2_reg=1e-3),
        )
        params = m.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 16, 1)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((2, 16, 1)), jnp.float32)
        l, g = m.mse_value_and_grad(params, t, x, u, fused=False)
        # reg term present: loss > bare mse
        pred = m.apply_grouped(params, t, x, fused=False)
        bare = float(jnp.mean((pred - u) ** 2))
        assert float(l) > bare
        assert all(
            np.all(np.isfinite(le)) for le in jax.tree_util.tree_leaves(g)
        )


class TestRoofline:
    def test_flops_per_point(self):
        from nif_tpu.utils.roofline import flops_per_point

        cfg = ShapeNetConfig(3, 1, 128, 2, "sine")
        fwd = 2 * (3 * 128 + 2 * 128 * 128 + 128)
        assert flops_per_point(cfg, training=False) == fwd
        assert flops_per_point(cfg, training=True) == 3 * fwd

    def test_step_report(self):
        from nif_tpu.utils.roofline import step_report

        cfg_s = ShapeNetConfig(3, 1, 128, 2, "sine")
        cfg_p = ParameterNetConfig(4, 128, 128, 2, "swish")
        r = step_report(cfg_s, cfg_p, n_groups=32, points_per_group=32768,
                        step_seconds=4.3e-3, peak_tflops=197.0)
        assert r["points_per_sec"] > 2e8
        assert 0 < r["mxu_utilization"] < 1
        assert 0 < r["pnet_fraction"] < 0.2


def test_rel_l2_bf16_inputs_measured_in_f32():
    """rel-L2 < 1e-3 is below bf16 resolution: the metric must upcast
    instead of quantizing the target to the pred's dtype."""
    import jax.numpy as jnp
    from nif_tpu.utils import rel_l2

    rng = np.random.default_rng(0)
    target = rng.standard_normal(4096).astype(np.float32)
    pred_exact_bf16 = jnp.asarray(target, jnp.bfloat16)
    # identical-up-to-bf16 pred: true rel error is the bf16 quantization of
    # PRED only (~1e-3), and must not be doubled/zeroed by casting target
    v = float(rel_l2(pred_exact_bf16, target))
    assert 0 < v < 5e-3
    assert rel_l2(pred_exact_bf16, target).dtype == jnp.float32
    # small f32 perturbation below bf16 eps must be visible
    v2 = float(rel_l2(jnp.asarray(target + 1e-4, jnp.float32), target))
    assert v2 == pytest.approx(1e-4 / np.linalg.norm(target) *
                               np.sqrt(target.size), rel=1e-2)
