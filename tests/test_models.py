"""Model forward passes: golden values vs the numpy oracle, grouped-vs-
pointwise equivalence, subnetwork extraction consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nif_tpu import NIF, NIFMultiScale, NIFMultiScaleLastLayerParameterized
from nif_tpu.config import ParameterNetConfig, ShapeNetConfig

import _numpy_ref as ref


CFG_S = ShapeNetConfig(input_dim=2, output_dim=3, units=12, nlayers=2,
                       activation="swish")
CFG_P = ParameterNetConfig(input_dim=2, latent_dim=4, units=10, nlayers=2,
                           activation="swish")


def make_inputs(model, B=17, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, model.pi_dim + model.si_dim)).astype(np.float32)


class TestVanillaNIF:
    def test_forward_matches_numpy_oracle(self):
        model = NIF(CFG_S, CFG_P)
        params = model.init(jax.random.key(0))
        inputs = make_inputs(model)
        u = np.asarray(model.apply(params, inputs))
        t, x = inputs[:, :2], inputs[:, 2:4]
        po, _ = ref.pnet_vanilla(params["pnet"], t, CFG_P.nlayers, "swish")
        expected = ref.shapenet_vanilla(po, x, 2, 3, 12, 2, "swish")
        np.testing.assert_allclose(u, expected, rtol=2e-5, atol=2e-5)

    def test_output_shape_and_dtype(self):
        model = NIF(CFG_S, CFG_P)
        params = model.init(jax.random.key(0))
        u = model.apply(params, make_inputs(model, B=5))
        assert u.shape == (5, 3)
        assert u.dtype == jnp.float32

    def test_subnetwork_composition(self):
        """p_to_w == lr_to_w(p_to_lr); x_to_u_given_w(p_to_w) == apply."""
        model = NIF(CFG_S, CFG_P)
        params = model.init(jax.random.key(1))
        inputs = make_inputs(model, B=9)
        t, x = inputs[:, :2], inputs[:, 2:4]
        wb = model.p_to_w(params, t)
        lr = model.p_to_lr(params, t)
        np.testing.assert_allclose(
            np.asarray(model.lr_to_w(params, lr)), np.asarray(wb), rtol=1e-6
        )
        u_direct = model.apply(params, inputs)
        u_composed = model.x_to_u_given_w(x, wb)
        np.testing.assert_allclose(
            np.asarray(u_composed), np.asarray(u_direct), rtol=1e-5, atol=1e-6
        )

    def test_grouped_matches_pointwise(self):
        model = NIF(CFG_S, CFG_P)
        params = model.init(jax.random.key(2))
        G, P = 4, 6
        rng = np.random.default_rng(3)
        t = rng.standard_normal((G, 2)).astype(np.float32)
        x = rng.standard_normal((G, P, 2)).astype(np.float32)
        u_grouped = np.asarray(model.apply_grouped(params, t, x))
        flat = np.concatenate(
            [np.repeat(t, P, axis=0), x.reshape(G * P, 2)], axis=-1
        )
        u_point = np.asarray(model.apply(params, flat)).reshape(G, P, 3)
        np.testing.assert_allclose(u_grouped, u_point, rtol=1e-5, atol=1e-5)

    def test_jit_and_grad(self):
        model = NIF(CFG_S, CFG_P)
        params = model.init(jax.random.key(0))
        inputs = jnp.asarray(make_inputs(model, B=8))
        targets = jnp.zeros((8, 3))

        @jax.jit
        def loss(p):
            return jnp.mean((model.apply(p, inputs) - targets) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(l)) for l in leaves)
        assert any(np.abs(l).max() > 0 for l in leaves)


class TestMultiScale:
    @pytest.mark.parametrize("resblock", [False, True])
    @pytest.mark.parametrize("pnet_act", ["sine", "swish"])
    def test_forward_matches_numpy_oracle(self, resblock, pnet_act):
        cfg_s = ShapeNetConfig(
            input_dim=1, output_dim=1, units=10, nlayers=2, activation="sine",
            use_resblock=resblock, omega_0=30.0, weight_init_factor=0.01,
        )
        cfg_p = ParameterNetConfig(
            input_dim=1, latent_dim=3, units=8, nlayers=2, activation=pnet_act,
            use_resblock=resblock, omega_0=30.0,
        )
        model = NIFMultiScale(cfg_s, cfg_p)
        params = model.init(jax.random.key(0))
        inputs = make_inputs(model, B=11)
        u = np.asarray(model.apply(params, inputs))
        t, x = inputs[:, :1], inputs[:, 1:2]
        if pnet_act == "sine":
            po, _ = ref.pnet_siren(params["pnet"], t, 2, 30.0, resblock)
        else:
            # mlp_hyper trunk: first dense + resnet/shortcut + bottleneck.
            if resblock:
                act = ref.np_act("swish")
                h = act(t @ np.asarray(params["pnet"]["first"]["w"])
                        + np.asarray(params["pnet"]["first"]["b"]))
                for i in range(2):
                    p = params["pnet"][f"hidden_{i}"]
                    h1 = act(h @ np.asarray(p["dense1"]["w"]) + np.asarray(p["dense1"]["b"]))
                    h2 = h1 @ np.asarray(p["dense2"]["w"]) + np.asarray(p["dense2"]["b"])
                    h = act(h + h2)
                latent = h @ np.asarray(params["pnet"]["bottleneck"]["w"]) + np.asarray(
                    params["pnet"]["bottleneck"]["b"])
                po = latent @ np.asarray(params["pnet"]["last"]["w"]) + np.asarray(
                    params["pnet"]["last"]["b"])
            else:
                po, _ = ref.pnet_vanilla(params["pnet"], t, 2, "swish")
        expected = ref.shapenet_siren(po, x, 1, 1, 10, 2, 30.0, resblock)
        np.testing.assert_allclose(u, expected, rtol=2e-4, atol=2e-5)

    def test_grouped_matches_pointwise(self):
        cfg_s = ShapeNetConfig(
            input_dim=1, output_dim=1, units=10, nlayers=2, activation="sine",
            use_resblock=True, omega_0=30.0,
        )
        cfg_p = ParameterNetConfig(
            input_dim=1, latent_dim=3, units=8, nlayers=1, activation="sine",
        )
        model = NIFMultiScale(cfg_s, cfg_p)
        params = model.init(jax.random.key(5))
        G, P = 3, 7
        rng = np.random.default_rng(4)
        t = rng.standard_normal((G, 1)).astype(np.float32)
        x = rng.standard_normal((G, P, 1)).astype(np.float32)
        u_grouped = np.asarray(model.apply_grouped(params, t, x))
        flat = np.concatenate([np.repeat(t, P, 0), x.reshape(G * P, 1)], -1)
        u_point = np.asarray(model.apply(params, flat)).reshape(G, P, 1)
        np.testing.assert_allclose(u_grouped, u_point, rtol=1e-5, atol=1e-5)


class TestNIFLinear:
    def _model(self):
        cfg_s = ShapeNetConfig(
            input_dim=2, output_dim=2, units=10, nlayers=2, activation="sine",
            connectivity="last_layer", omega_0=30.0,
        )
        cfg_p = ParameterNetConfig(
            input_dim=1, latent_dim=5, units=8, nlayers=1, activation="swish",
        )
        return NIFMultiScaleLastLayerParameterized(cfg_s, cfg_p)

    def test_forward_is_phi_dot_a_plus_b(self):
        model = self._model()
        params = model.init(jax.random.key(0))
        inputs = make_inputs(model, B=13)
        u = np.asarray(model.apply(params, inputs))
        t, x = inputs[:, :1], inputs[:, 1:3]
        phi = np.asarray(model.x_to_phi(params, x))  # [B, so, k]
        a = np.asarray(model.p_to_lr(params, t))  # [B, k]
        expected = np.einsum("bok,bk->bo", phi, a) + np.asarray(
            params["snet"]["bias"]
        )
        np.testing.assert_allclose(u, expected, rtol=1e-5, atol=1e-6)
        assert phi.shape == (13, 2, 5)

    def test_po_dim_equals_latent(self):
        model = self._model()
        assert model.po_dim == model.pi_hidden == 5

    def test_lr_to_w_raises(self):
        model = self._model()
        params = model.init(jax.random.key(0))
        with pytest.raises(ValueError):
            model.lr_to_w(params, np.zeros((1, 5)))

    def test_shared_mesh_matches_grouped(self):
        model = self._model()
        params = model.init(jax.random.key(1))
        G, P = 4, 9
        rng = np.random.default_rng(0)
        t = rng.standard_normal((G, 1)).astype(np.float32)
        x = rng.standard_normal((P, 2)).astype(np.float32)
        u_shared = np.asarray(model.apply_shared_mesh(params, t, x))
        x_g = np.broadcast_to(x, (G, P, 2)).copy()
        u_grouped = np.asarray(model.apply_grouped(params, t, x_g))
        np.testing.assert_allclose(u_shared, u_grouped, rtol=1e-5, atol=1e-6)


class TestConfigIO:
    def test_save_and_rebuild(self, tmp_path):
        model = NIF(CFG_S, CFG_P)
        p = tmp_path / "config.json"
        model.save_config(str(p))
        rebuilt = NIF.from_config(str(p))
        assert rebuilt.po_dim == model.po_dim
        # Same seed -> same params -> same outputs.
        params_a = model.init(jax.random.key(7))
        params_b = rebuilt.init(jax.random.key(7))
        inputs = make_inputs(model, B=3)
        np.testing.assert_array_equal(
            np.asarray(model.apply(params_a, inputs)),
            np.asarray(rebuilt.apply(params_b, inputs)),
        )

    def test_linear_requires_last_layer(self):
        with pytest.raises(ValueError):
            NIFMultiScaleLastLayerParameterized(CFG_S, CFG_P)


class TestLinearFusedTrunk:
    def _model(self, resblock=False):
        from nif_tpu.config import ParameterNetConfig, ShapeNetConfig
        cfg_s = ShapeNetConfig(
            input_dim=2, output_dim=2, units=16, nlayers=2, activation="sine",
            connectivity="last_layer", omega_0=10.0, use_resblock=resblock,
        )
        cfg_p = ParameterNetConfig(
            input_dim=1, latent_dim=4, units=8, nlayers=1, activation="swish",
        )
        return NIFMultiScaleLastLayerParameterized(cfg_s, cfg_p)

    @pytest.mark.parametrize("resblock", [False, True])
    def test_fused_trunk_matches_xla(self, resblock):
        model = self._model(resblock)
        params = model.init(jax.random.key(0))
        x = np.random.default_rng(0).standard_normal((256, 2)).astype(np.float32)
        phi_ref = np.asarray(model.x_to_phi(params, x))
        phi_fused = np.asarray(model.x_to_phi(params, x, fused=True))
        np.testing.assert_allclose(phi_fused, phi_ref, rtol=2e-4, atol=1e-5)

    def test_fused_trunk_gradients(self):
        model = self._model()
        params = model.init(jax.random.key(1))
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((128, 2)), jnp.float32
        )
        g_ref = jax.grad(lambda p: jnp.sum(model.x_to_phi(p, x) ** 2))(params)
        g_fused = jax.grad(
            lambda p: jnp.sum(model.x_to_phi(p, x, fused=True) ** 2)
        )(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fused)
        ):
            scale = float(jnp.max(jnp.abs(a))) + 1e-8
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-5
            )


class TestWeightVectorRoundTrip:
    """unpack -> flatten == identity, for every chain shape (the layout
    contract between XLA and Pallas paths)."""

    @pytest.mark.parametrize("resblock", [False, True])
    def test_roundtrip(self, resblock):
        from nif_tpu.config import shapenet_param_count
        from nif_tpu.ops import unpack_shapenet_weights

        cfg = ShapeNetConfig(input_dim=2, output_dim=3, units=8, nlayers=2,
                             activation="sine", use_resblock=resblock)
        po = shapenet_param_count(cfg, 0)
        wb = jnp.arange(4 * po, dtype=jnp.float32).reshape(4, po)
        parts = unpack_shapenet_weights(wb, cfg)
        ws = [parts["w_first"], *parts["w_hidden"], parts["w_last"]]
        bs = [parts["b_first"], *parts["b_hidden"], parts["b_last"]]
        flat = jnp.concatenate(
            [w.reshape(4, -1) for w in ws] + [b.reshape(4, -1) for b in bs],
            axis=-1,
        )
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(wb))


def test_vanilla_nif_ignores_use_resblock():
    """The reference's vanilla NIF never consults use_resblock
    (nif/model.py:169-173); a multiscale-style cfg dict with
    use_resblock=True must produce the SAME model as without it (no
    inflated po_dim / dead generated weights)."""
    cfg_s = {"input_dim": 2, "output_dim": 1, "units": 8, "nlayers": 2,
             "activation": "swish", "use_resblock": True}
    cfg_p = {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
             "activation": "swish"}
    m_res = NIF(cfg_s, cfg_p)
    m_plain = NIF(dict(cfg_s, use_resblock=False), cfg_p)
    assert m_res.po_dim == m_plain.po_dim
    # reference closed form: l*n^2 + (si+so+1+l)*n + so
    assert m_res.po_dim == 2 * 64 + (2 + 1 + 1 + 2) * 8 + 1
    p = m_res.init(jax.random.key(0))
    inp = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    u1 = np.asarray(m_res.apply(p, inp))
    u2 = np.asarray(m_plain.apply(p, inp))
    np.testing.assert_array_equal(u1, u2)


def test_siren_resnet_init_tied():
    """Reference SIREN_ResNet builds w2/b2 from the same init tensors as
    w/b (nif/layers/siren.py:370-379): tied at init."""
    from nif_tpu.layers.siren import siren_resnet_init

    p = siren_resnet_init(jax.random.key(3), 16, 30.0)
    np.testing.assert_array_equal(np.asarray(p["w"]), np.asarray(p["w2"]))
    np.testing.assert_array_equal(np.asarray(p["b"]), np.asarray(p["b2"]))


def test_multiscale_last_layer_connectivity_rejected_early():
    """Reference wart (not replicated): plain NIFMultiScale +
    connectivity='last_layer' constructs there and breaks at call time —
    here it fails at construction, naming the working class."""
    cfg_s = {"input_dim": 2, "output_dim": 1, "units": 8, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "last_layer", "weight_init_factor": 1.0}
    cfg_p = {"input_dim": 1, "latent_dim": 4, "units": 8, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    with pytest.raises(ValueError, match="LastLayerParameterized"):
        NIFMultiScale(cfg_s, cfg_p)
    # the subclass (which IS a NIFMultiScale) still constructs fine
    NIFMultiScaleLastLayerParameterized(cfg_s, cfg_p)
