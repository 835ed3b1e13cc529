"""Derivatives: analytic checks on known functions, and through a model."""
import jax
import jax.numpy as jnp
import numpy as np

from nif_tpu import NIF
from nif_tpu.config import ParameterNetConfig, ShapeNetConfig
from nif_tpu.ops.derivatives import (
    jacobian_regularization,
    output_and_jacobian,
    output_jacobian_hessian,
    sobolev_loss,
)


def poly(inp):
    # y0 = x0^2 * x1, y1 = sin(x1) — known jacobian/hessian.
    x0, x1 = inp[:, 0], inp[:, 1]
    return jnp.stack([x0**2 * x1, jnp.sin(x1)], axis=-1)


def test_jacobian_analytic():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 2)).astype(np.float32)
    y, jac = output_and_jacobian(poly, x)
    np.testing.assert_allclose(np.asarray(y), poly(x), rtol=1e-6)
    expected = np.zeros((7, 2, 2), np.float32)
    expected[:, 0, 0] = 2 * x[:, 0] * x[:, 1]
    expected[:, 0, 1] = x[:, 0] ** 2
    expected[:, 1, 1] = np.cos(x[:, 1])
    np.testing.assert_allclose(np.asarray(jac), expected, rtol=1e-5, atol=1e-6)


def test_jacobian_index_selection():
    x = np.random.default_rng(1).standard_normal((5, 2)).astype(np.float32)
    _, jac = output_and_jacobian(poly, x, y_index=[0], x_index=[1])
    assert jac.shape == (5, 1, 1)
    np.testing.assert_allclose(
        np.asarray(jac)[:, 0, 0], x[:, 0] ** 2, rtol=1e-5, atol=1e-6
    )


def test_hessian_analytic():
    x = np.random.default_rng(2).standard_normal((4, 2)).astype(np.float32)
    y, jac, hess = output_jacobian_hessian(poly, x)
    assert hess.shape == (4, 2, 2, 2)
    # d2 y0 / dx0 dx0 = 2*x1 ; d2 y0 / dx0 dx1 = 2*x0 ; d2 y1/dx1^2 = -sin(x1)
    np.testing.assert_allclose(np.asarray(hess)[:, 0, 0, 0], 2 * x[:, 1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hess)[:, 0, 0, 1], 2 * x[:, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hess)[:, 1, 1, 1], -np.sin(x[:, 1]), rtol=1e-4, atol=1e-5
    )


def test_jacreg_and_through_model():
    cfg_s = ShapeNetConfig(input_dim=1, output_dim=1, units=8, nlayers=1,
                           activation="tanh")
    cfg_p = ParameterNetConfig(input_dim=1, latent_dim=2, units=8, nlayers=1,
                               activation="tanh")
    model = NIF(cfg_s, cfg_p)
    params = model.init(jax.random.key(0))
    inputs = jnp.asarray(
        np.random.default_rng(3).standard_normal((6, 2)).astype(np.float32)
    )
    fn = lambda inp: model.apply(params, inp)
    y, jac = output_and_jacobian(fn, inputs)
    assert y.shape == (6, 1) and jac.shape == (6, 1, 2)
    reg = jacobian_regularization(fn, inputs, l1=0.1)
    assert np.isfinite(float(reg)) and float(reg) >= 0
    # jacreg must be differentiable w.r.t. params (it feeds the loss).
    def loss(p):
        f = lambda inp: model.apply(p, inp)
        return jacobian_regularization(f, inputs, l1=0.1)
    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


def test_sobolev_loss_terms():
    x = np.random.default_rng(4).standard_normal((8, 2)).astype(np.float32)
    y_true = poly(x)
    _, jac_true = output_and_jacobian(poly, x)
    total, terms = sobolev_loss(poly, x, y_true, target_jac=jac_true)
    assert float(terms["value_mse"]) < 1e-10
    assert float(terms["jacobian_mse"]) < 1e-10
    assert float(total) < 1e-9
    # Wrong jacobian target -> nonzero jac term.
    total2, terms2 = sobolev_loss(poly, x, y_true, target_jac=jac_true + 1.0)
    assert float(terms2["jacobian_mse"]) > 0.5


def test_jac_reg_model_config_path():
    """jac_reg in the pnet config flows through regularization_loss."""
    cfg_s = ShapeNetConfig(input_dim=1, output_dim=1, units=6, nlayers=1,
                           activation="tanh")
    cfg_p = ParameterNetConfig(input_dim=1, latent_dim=2, units=6, nlayers=1,
                               activation="tanh", jac_reg=0.05)
    model = NIF(cfg_s, cfg_p)
    params = model.init(jax.random.key(1))
    inputs = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, 2)).astype(np.float32)
    )
    reg = model.regularization_loss(params, inputs)
    assert float(reg) > 0


def test_sobolev_loss_rejects_silent_broadcast():
    """targets [B,1] vs output [B,2] must raise, not broadcast (round-2
    review finding); with y_index it selects the matching columns."""
    import pytest

    def fn(x):
        return jnp.concatenate([x ** 2, x ** 3], axis=-1)

    x = jnp.linspace(0.0, 1.0, 8).reshape(-1, 1)
    bad_targets = x ** 2  # [B, 1] vs output [B, 2]
    with pytest.raises(ValueError, match="targets shape"):
        sobolev_loss(fn, x, bad_targets)
    # y_index-selected value term: targets for column 0 only
    total, terms = sobolev_loss(fn, x, x ** 2, target_jac=2 * x[..., None],
                                y_index=0)
    assert float(terms["value_mse"]) < 1e-12
    assert float(terms["jacobian_mse"]) < 1e-12
    # full-output targets still accepted alongside y_index
    full = jnp.concatenate([x ** 2, x ** 3], axis=-1)
    total2, terms2 = sobolev_loss(fn, x, full, target_jac=2 * x[..., None],
                                  y_index=0)
    assert float(terms2["value_mse"]) < 1e-12


def _multiscale_model():
    import nif_tpu

    cfg_s = {"input_dim": 2, "output_dim": 2, "units": 8, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1}
    cfg_p = {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    return nif_tpu.NIFMultiScale(cfg_s, cfg_p)


def test_grouped_jacobian_matches_pointwise():
    """output_and_jacobian_grouped (pnet once per group) must equal the
    per-point path that re-runs the full apply under jacfwd
    (VERDICT round-2 item 4)."""
    from nif_tpu.ops.derivatives import output_and_jacobian_grouped

    model = _multiscale_model()
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    G, P = 3, 5
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)

    y_g, jac_g = output_and_jacobian_grouped(model, params, t, x)
    assert y_g.shape == (G, P, 2) and jac_g.shape == (G, P, 2, 2)

    # per-point reference: rows [t, x] through the full apply
    rows = np.concatenate(
        [np.repeat(t, P, axis=0), x.reshape(G * P, 2)], axis=1
    )
    y_p, jac_p = output_and_jacobian(
        lambda inp: model.apply(params, inp), jnp.asarray(rows)
    )
    # keep only the d/dx columns (inputs are [t, x0, x1])
    np.testing.assert_allclose(
        np.asarray(y_g).reshape(G * P, 2), np.asarray(y_p), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jac_g).reshape(G * P, 2, 2),
        np.asarray(jac_p)[:, :, 1:], rtol=1e-4, atol=1e-5,
    )

    # index selection mirrors the point-wise API
    _, jac_sel = output_and_jacobian_grouped(
        model, params, t, x, y_index=[1], x_index=[0]
    )
    np.testing.assert_allclose(
        np.asarray(jac_sel), np.asarray(jac_g)[:, :, 1:2, 0:1], rtol=1e-6
    )


def test_grouped_hessian_and_sobolev():
    from nif_tpu.ops.derivatives import (
        output_and_jacobian_grouped,
        output_jacobian_hessian_grouped,
        sobolev_loss_grouped,
    )

    model = _multiscale_model()
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(4)
    G, P = 2, 4
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)

    y, jac, hess = output_jacobian_hessian_grouped(model, params, t, x)
    assert hess.shape == (G, P, 2, 2, 2)
    # hessian symmetry in the two x columns
    np.testing.assert_allclose(
        np.asarray(hess), np.transpose(np.asarray(hess), (0, 1, 2, 4, 3)),
        rtol=1e-4, atol=1e-5,
    )

    y0, jac0 = output_and_jacobian_grouped(model, params, t, x)
    total, terms = sobolev_loss_grouped(
        model, params, t, x, targets=np.asarray(y0),
        target_jac=np.asarray(jac0),
    )
    # matching targets -> zero loss
    assert float(total) < 1e-10
    assert set(terms) == {"value_mse", "jacobian_mse"}

    # NIF-linear variant routes through the params-carrying closure
    import nif_tpu

    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 2, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    lp = lin.init(jax.random.key(2))
    from nif_tpu.ops.derivatives import output_and_jacobian_grouped as oajg

    y_l, jac_l = oajg(lin, lp, t, x)
    assert y_l.shape == (G, P, 1) and jac_l.shape == (G, P, 1, 2)
    rows = np.concatenate([np.repeat(t, P, 0), x.reshape(G * P, 2)], 1)
    y_ref, jac_ref = output_and_jacobian(
        lambda inp: lin.apply(lp, inp), jnp.asarray(rows)
    )
    np.testing.assert_allclose(
        np.asarray(jac_l).reshape(G * P, 1, 2),
        np.asarray(jac_ref)[:, :, 1:], rtol=1e-4, atol=1e-5,
    )


def test_fused_fwd_jac_kernel_parity():
    """The fused forward+JVP Pallas kernel (shapenet_fwd_jac) must
    reproduce the XLA jacfwd path for every supported chain variant —
    interpret mode (exact math; Mosaic block rules checked on hardware,
    see CLAUDE.md)."""
    from nif_tpu.ops.derivatives import output_and_jacobian_grouped
    from nif_tpu.ops.pallas_shapenet import (
        fwd_jac_supported,
        fwd_jac_unsupported_reason,
        shapenet_fwd_jac,
    )

    import nif_tpu

    rng = np.random.default_rng(0)
    G, P = 2, 256

    cases = [
        ("siren plain", nif_tpu.NIFMultiScale(
            {"input_dim": 3, "output_dim": 2, "units": 16, "nlayers": 2,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1},
            {"input_dim": 2, "latent_dim": 4, "units": 16, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0},
        ), 3),
        ("siren resblock", nif_tpu.NIFMultiScale(
            {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
             "activation": "sine", "use_resblock": True, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1},
            {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0},
        ), 2),
        ("vanilla tanh", nif_tpu.NIF(
            {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
             "activation": "tanh"},
            {"input_dim": 1, "latent_dim": 3, "units": 16, "nlayers": 1,
             "activation": "swish"},
        ), 2),
        # so >= si exercises the forward-mode tangent kernel (the cases
        # above all pick reverse-mode: so < si)
        ("siren fwd-mode", nif_tpu.NIFMultiScale(
            {"input_dim": 2, "output_dim": 3, "units": 16, "nlayers": 2,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1},
            {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0},
        ), 2),
    ]
    for name, model, si in cases:
        params = model.init(jax.random.key(0))
        pi = model.cfg_parameter_net.input_dim
        t = jnp.asarray(rng.standard_normal((G, pi)), jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
        assert fwd_jac_supported(
            model.cfg_shape_net, model.shapenet_variant, P, si
        ), name
        y0, j0 = output_and_jacobian_grouped(model, params, t, x,
                                             fused=False)
        wb = model.p_to_w(params, t)
        y1, j1 = shapenet_fwd_jac(
            wb, x, model.cfg_shape_net, model.shapenet_variant,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(j0), np.asarray(j1),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    # y_index/x_index subsetting rides the fused output the same way
    name, model, si = cases[0]
    params = model.init(jax.random.key(0))
    t = jnp.asarray(rng.standard_normal((G, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
    y0, j0 = output_and_jacobian_grouped(
        model, params, t, x, y_index=1, x_index=[0, 2], fused=False)
    assert j0.shape == (G, P, 1, 2)

    # unsupported configs report a reason (awkward P -> XLA fallback)
    reason = fwd_jac_unsupported_reason(
        model.cfg_shape_net, model.shapenet_variant, 1001, si)
    assert reason is not None and "point tile" in reason

    # NIF-linear routes through its EFFECTIVE chain (bottleneck + latent
    # contraction fold into a per-group last layer), not the plain route
    from nif_tpu.ops.derivatives import _fwd_jac_fusable

    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": True, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    assert not _fwd_jac_fusable(lin, np.zeros((2, 256, 2), np.float32), None)
    lparams = lin.init(jax.random.key(2))
    lt = jnp.asarray(rng.standard_normal((G, 1)), jnp.float32)
    lx = jnp.asarray(rng.uniform(-1, 1, (G, P, 2)), jnp.float32)
    ly0, lj0 = output_and_jacobian_grouped(lin, lparams, lt, lx, fused=False)
    ly1, lj1 = output_and_jacobian_grouped(lin, lparams, lt, lx, fused=True)
    np.testing.assert_allclose(np.asarray(ly0), np.asarray(ly1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lj0), np.asarray(lj1),
                               rtol=1e-4, atol=1e-4)
    # forcing fused=True on a supported plain model works even on CPU
    # (interpret resolves automatically off-TPU)
    y2, j2 = output_and_jacobian_grouped(model, params, t, x, fused=True)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(
        output_and_jacobian_grouped(model, params, t, x, fused=False)[1]),
        rtol=1e-4, atol=1e-4)


def test_fused_sobolev_grads_parity():
    """sobolev_value_and_grad's fused single-pass kernel (fwd + jac + both
    MSE terms + backward through the tangent chain) must match
    jax.value_and_grad over the XLA sobolev_loss_grouped — every variant,
    index subsetting, term weights, and regularization (interpret mode)."""
    import pytest

    import nif_tpu

    rng = np.random.default_rng(3)
    G, P = 2, 256

    def compare(name, model, si, so, y_index=None, x_index=None,
                w_value=1.0, w_jac=1.0):
        params = model.init(jax.random.key(1))
        pi = model.cfg_parameter_net.input_dim
        t = jnp.asarray(rng.standard_normal((G, pi)), jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
        n_y = so if y_index is None else len(np.atleast_1d(y_index))
        n_x = si if x_index is None else len(np.atleast_1d(x_index))
        u = jnp.asarray(rng.standard_normal((G, P, so)), jnp.float32)
        jt = jnp.asarray(
            rng.standard_normal((G, P, n_y, n_x)), jnp.float32)
        kw = dict(target_jac=jt, w_value=w_value, w_jac=w_jac,
                  y_index=y_index, x_index=x_index)
        tot0, terms0, g0 = model.sobolev_value_and_grad(
            params, t, x, u, fused=False, **kw)
        tot1, terms1, g1 = model.sobolev_value_and_grad(
            params, t, x, u, fused=True, **kw)
        np.testing.assert_allclose(float(tot0), float(tot1), rtol=2e-4,
                                   err_msg=name)
        for k in terms0:
            np.testing.assert_allclose(
                float(terms0[k]), float(terms1[k]), rtol=2e-4,
                err_msg=f"{name}:{k}")
        flat0 = jax.flatten_util.ravel_pytree(g0)[0]
        flat1 = jax.flatten_util.ravel_pytree(g1)[0]
        scale = float(jnp.max(jnp.abs(flat0))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(flat1) / scale, np.asarray(flat0) / scale,
            atol=5e-5, err_msg=name)

    siren = nif_tpu.NIFMultiScale(
        {"input_dim": 3, "output_dim": 2, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 2, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    compare("siren plain", siren, 3, 2)
    compare("siren subset", siren, 3, 2, y_index=1, x_index=[0, 2],
            w_value=0.7, w_jac=2.5)

    resb = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": True, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    compare("siren resblock", resb, 2, 1)

    vanilla = nif_tpu.NIF(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
         "activation": "tanh"},
        {"input_dim": 1, "latent_dim": 3, "units": 16, "nlayers": 1,
         "activation": "swish"},
    )
    compare("vanilla tanh", vanilla, 2, 1)

    # regularization rides both paths identically
    reg = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0,
         "l2_reg": 1e-3},
    )
    compare("siren l2reg", reg, 2, 1)

    # NIF-linear: the fused path trains trunk AND pnet via jax.vjp through
    # the effective generated chain (bottleneck + contraction fold into a
    # per-group last layer)
    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    lp = lin.init(jax.random.key(0))
    lt = jnp.asarray(rng.standard_normal((G, 1)), jnp.float32)
    lx = jnp.asarray(rng.uniform(-1, 1, (G, P, 2)), jnp.float32)
    lu = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)
    ljt = jnp.asarray(rng.standard_normal((G, P, 1, 2)), jnp.float32)
    lt0, lterms0, lg0 = lin.sobolev_value_and_grad(
        lp, lt, lx, lu, target_jac=ljt, fused=False)
    lt1, lterms1, lg1 = lin.sobolev_value_and_grad(
        lp, lt, lx, lu, target_jac=ljt, fused=True)
    np.testing.assert_allclose(float(lt0), float(lt1), rtol=2e-4)
    lf0 = jax.flatten_util.ravel_pytree(lg0)[0]
    lf1 = jax.flatten_util.ravel_pytree(lg1)[0]
    lscale = float(jnp.max(jnp.abs(lf0))) + 1e-8
    np.testing.assert_allclose(np.asarray(lf1) / lscale,
                               np.asarray(lf0) / lscale, atol=5e-5)


def test_fused_hessian_grads_parity():
    """The second-order fused train kernel (VERDICT r4 item 1): forward +
    jacobian + hessian tangent streams + all three MSE terms + the full
    reverse-over-forward-over-forward backward in ONE pass must match
    jax.value_and_grad over the XLA nested-jacfwd path
    (output_jacobian_hessian_grouped) — plain and resblock sine chains,
    hessian-only and jac+hess, weights, index subsetting, asymmetric
    targets (the kernel symmetrizes; the wrapper restores the exact
    full-grid loss via the params-independent asymmetry constant), and
    the NIF-linear effective chain. Interpret mode on CPU."""
    import nif_tpu

    rng = np.random.default_rng(17)
    G, P = 2, 256

    def compare(name, model, si, so, y_index=None, x_index=None,
                weight=False, with_jac=True, symmetric=True,
                w_value=1.0, w_jac=0.3, w_hess=0.05):
        params = model.init(jax.random.key(1))
        pi = model.cfg_parameter_net.input_dim
        t = jnp.asarray(rng.standard_normal((G, pi)), jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
        n_y = so if y_index is None else len(np.atleast_1d(y_index))
        n_x = si if x_index is None else len(np.atleast_1d(x_index))
        u = jnp.asarray(rng.standard_normal((G, P, so)), jnp.float32)
        jt = (jnp.asarray(rng.standard_normal((G, P, n_y, n_x)),
                          jnp.float32) if with_jac else None)
        ht = rng.standard_normal((G, P, n_y, n_x, n_x)).astype(np.float32)
        if symmetric:
            ht = 0.5 * (ht + ht.transpose(0, 1, 2, 4, 3))
        ht = jnp.asarray(ht)
        w = (jnp.asarray(rng.uniform(0.5, 1.5, (G, P)), jnp.float32)
             if weight else None)
        kw = dict(target_jac=jt, target_hess=ht, w_value=w_value,
                  w_jac=w_jac, w_hess=w_hess, y_index=y_index,
                  x_index=x_index, weight=w)
        tot0, terms0, g0 = model.sobolev_value_and_grad(
            params, t, x, u, fused=False, **kw)
        tot1, terms1, g1 = model.sobolev_value_and_grad(
            params, t, x, u, fused=True, **kw)
        np.testing.assert_allclose(float(tot0), float(tot1), rtol=2e-4,
                                   err_msg=name)
        assert set(terms0) == set(terms1), name
        for k in terms0:
            np.testing.assert_allclose(
                float(terms0[k]), float(terms1[k]), rtol=2e-4,
                err_msg=f"{name}:{k}")
        flat0 = jax.flatten_util.ravel_pytree(g0)[0]
        flat1 = jax.flatten_util.ravel_pytree(g1)[0]
        scale = float(jnp.max(jnp.abs(flat0))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(flat1) / scale, np.asarray(flat0) / scale,
            atol=1e-4, err_msg=name)

    siren = nif_tpu.NIFMultiScale(
        {"input_dim": 3, "output_dim": 2, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 2, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    compare("siren jac+hess", siren, 3, 2)
    compare("siren hess-only", siren, 3, 2, with_jac=False)
    compare("siren weighted asym", siren, 3, 2, weight=True,
            symmetric=False)
    compare("siren subset", siren, 3, 2, y_index=1, x_index=[0, 2],
            w_value=0.7, w_jac=2.5, w_hess=0.2)

    resb = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": True, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    compare("siren resblock", resb, 2, 1)

    # NIF-linear routes through the effective generated chain
    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    compare("nif-linear", lin, 2, 1)

    # vanilla chains have no hessian kernel — fused=True is loud, auto
    # quietly stays on XLA
    vanilla = nif_tpu.NIF(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "tanh"},
        {"input_dim": 1, "latent_dim": 3, "units": 16, "nlayers": 1,
         "activation": "swish"},
    )
    vp = vanilla.init(jax.random.key(0))
    vt = jnp.asarray(rng.standard_normal((G, 1)), jnp.float32)
    vx = jnp.asarray(rng.uniform(-1, 1, (G, P, 2)), jnp.float32)
    vu = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)
    vht = jnp.asarray(rng.standard_normal((G, P, 1, 2, 2)), jnp.float32)
    import pytest

    with pytest.raises(ValueError, match="sine chains only"):
        vanilla.sobolev_value_and_grad(vp, vt, vx, vu, target_hess=vht,
                                       fused=True)
    info = vanilla.sobolev_path_info(P, 2, hess=True)
    assert info["path"] == "xla" and "sine chains" in info["reason"]


def test_fused_sobolev_weight_parity():
    """Per-point weights (the trainers' padding convention) through the
    fused Sobolev kernel: both loss terms and every gradient match the
    weighted XLA path (interpret mode on CPU)."""
    import nif_tpu

    rng = np.random.default_rng(11)
    G, P, si, so = 2, 256, 3, 2
    model = nif_tpu.NIFMultiScale(
        {"input_dim": si, "output_dim": so, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 2, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    params = model.init(jax.random.key(1))
    t = jnp.asarray(rng.standard_normal((G, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, so)), jnp.float32)
    jt = jnp.asarray(rng.standard_normal((G, P, so, si)), jnp.float32)
    # zero rows exercise the padding convention exactly
    w = rng.uniform(0.5, 1.5, (G, P)).astype(np.float32)
    w[0, -32:] = 0.0
    w = jnp.asarray(w)
    kw = dict(target_jac=jt, w_value=0.7, w_jac=2.5, weight=w)
    tot0, terms0, g0 = model.sobolev_value_and_grad(
        params, t, x, u, fused=False, **kw)
    tot1, terms1, g1 = model.sobolev_value_and_grad(
        params, t, x, u, fused=True, **kw)
    np.testing.assert_allclose(float(tot0), float(tot1), rtol=2e-4)
    for k in terms0:
        np.testing.assert_allclose(float(terms0[k]), float(terms1[k]),
                                   rtol=2e-4, err_msg=k)
    f0 = jax.flatten_util.ravel_pytree(g0)[0]
    f1 = jax.flatten_util.ravel_pytree(g1)[0]
    scale = float(jnp.max(jnp.abs(f0))) + 1e-8
    np.testing.assert_allclose(np.asarray(f1) / scale,
                               np.asarray(f0) / scale, atol=5e-5)

    # weighted + zero-padded rows equal the unpadded smaller problem:
    # real rows scaled P/(P-pad) reproduces the plain mean over real rows
    pad = 32
    w2 = np.zeros((G, P), np.float32)
    w2[:, : P - pad] = P / (P - pad)
    tot_pad, terms_pad, _ = model.sobolev_value_and_grad(
        params, t, x, u, target_jac=jt, weight=jnp.asarray(w2), fused=True)
    tot_ref, terms_ref, _ = model.sobolev_value_and_grad(
        params, t, x[:, : P - pad], u[:, : P - pad],
        target_jac=jt[:, : P - pad], fused=False)
    np.testing.assert_allclose(float(tot_pad), float(tot_ref), rtol=2e-4)


def test_sobolev_fused_true_raises_cleanly_on_unsupported():
    """Forced fused=True must fail with a clear ValueError (not a
    TypeError deep in the kernel) when P has no dividing tile or when
    NO derivative targets are given (hessian targets route to the
    second-order kernel since round 5)."""
    import pytest

    import nif_tpu

    model = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G = 2
    t = jnp.asarray(rng.standard_normal((G, 1)), jnp.float32)

    def data(P):
        x = jnp.asarray(rng.uniform(-1, 1, (G, P, 2)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)
        jt = jnp.asarray(rng.standard_normal((G, P, 1, 2)), jnp.float32)
        return x, u, jt

    x, u, jt = data(1001)  # no dividing tile
    with pytest.raises(ValueError, match="1001"):
        model.sobolev_value_and_grad(params, t, x, u, target_jac=jt,
                                     fused=True)
    x, u, jt = data(256)
    with pytest.raises(ValueError, match="target_jac or target_hess"):
        model.sobolev_value_and_grad(params, t, x, u, fused=True)
    # hessian targets now have their own kernel: fused=True works, and a
    # mis-shaped target is loud
    with pytest.raises(ValueError, match="target_hess shape"):
        model.sobolev_value_and_grad(
            params, t, x, u, target_jac=jt,
            target_hess=jnp.zeros((G, 256, 1, 2)), fused=True)


def test_fused_sobolev_weight_parity_more_variants():
    """Per-point weights through the fused Sobolev kernel for the chains
    the first weight-parity test doesn't cover: resblock SIREN and
    NIF-linear's effective generated chain."""
    import nif_tpu

    rng = np.random.default_rng(21)
    G, P = 2, 256

    def check(model, si, so, name):
        params = model.init(jax.random.key(2))
        pi = model.cfg_parameter_net.input_dim
        t = jnp.asarray(rng.standard_normal((G, pi)), jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((G, P, so)), jnp.float32)
        jt = jnp.asarray(rng.standard_normal((G, P, so, si)), jnp.float32)
        w = jnp.asarray(rng.uniform(0.0, 2.0, (G, P)), jnp.float32)
        kw = dict(target_jac=jt, w_jac=0.4, weight=w)
        t0, terms0, g0 = model.sobolev_value_and_grad(
            params, t, x, u, fused=False, **kw)
        t1, terms1, g1 = model.sobolev_value_and_grad(
            params, t, x, u, fused=True, **kw)
        np.testing.assert_allclose(float(t0), float(t1), rtol=2e-4,
                                   err_msg=name)
        f0 = jax.flatten_util.ravel_pytree(g0)[0]
        f1 = jax.flatten_util.ravel_pytree(g1)[0]
        scale = float(jnp.max(jnp.abs(f0))) + 1e-8
        np.testing.assert_allclose(np.asarray(f1) / scale,
                                   np.asarray(f0) / scale, atol=5e-5,
                                   err_msg=name)

    resb = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": True, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    check(resb, 2, 1, "resblock")

    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    check(lin, 2, 1, "nif-linear")


def test_hessian_target_training_improves_curvature():
    """Second-order Sobolev TRAINING (VERDICT r3 item 3): optimizing the
    grouped hessian-target loss through ``sobolev_value_and_grad``
    (nested-jacfwd XLA formulation) actually fits the field's curvature —
    hessian MSE drops by >5x while value MSE also improves."""
    import optax

    import nif_tpu

    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 3.0,
         "connectivity": "full", "weight_init_factor": 0.3},
        {"input_dim": 1, "latent_dim": 2, "units": 16, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 3.0},
    )
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 4, 64
    t = np.linspace(0, 1, G, dtype=np.float32)[:, None]
    x = rng.uniform(-1, 1, (G, P, 1)).astype(np.float32)
    k = 2.0
    phase = k * (x[..., 0] - t)
    u = np.sin(phase).astype(np.float32)[..., None]
    ju = (k * np.cos(phase)).astype(np.float32)[..., None, None]
    hu = (-k * k * np.sin(phase)).astype(np.float32)[..., None, None, None]
    tg, xg, ug = map(jnp.asarray, (t, x, u))
    jg, hg = jnp.asarray(ju), jnp.asarray(hu)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        total, terms, g = model.sobolev_value_and_grad(
            p, tg, xg, ug, target_jac=jg, target_hess=hg,
            w_value=1.0, w_jac=0.1, w_hess=0.01,
        )
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, terms

    _, _, terms0 = step(params, opt)
    h0 = float(terms0["hessian_mse"])
    v0 = float(terms0["value_mse"])
    for _ in range(300):
        params, opt, terms = step(params, opt)
    h1 = float(terms["hessian_mse"])
    v1 = float(terms["value_mse"])
    assert np.isfinite(h1) and np.isfinite(v1)
    assert h1 < h0 / 5, f"hessian MSE {h0} -> {h1}"
    assert v1 < v0, f"value MSE {v0} -> {v1}"


def test_fused_hess_eval_parity():
    """The fused second-order EVALUATION kernel (round 5): (y, jac, hess)
    in one forward-over-forward pallas_call must match the XLA
    nested-jacfwd path of output_jacobian_hessian_grouped — plain and
    resblock sine chains, index subsetting, and NIF-linear's effective
    generated chain. f32 interpret mode on CPU (exact trig), so
    tolerances are tight; the returned hessian must be exactly
    symmetric (unique pairs mirrored across the diagonal)."""
    import nif_tpu
    from nif_tpu.ops import output_jacobian_hessian_grouped

    rng = np.random.default_rng(33)
    G, P = 2, 256

    def check(name, model, si, y_index=None, x_index=None):
        params = model.init(jax.random.key(3))
        pi = model.cfg_parameter_net.input_dim
        t = jnp.asarray(rng.standard_normal((G, pi)), jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (G, P, si)), jnp.float32)
        y0, j0, h0 = output_jacobian_hessian_grouped(
            model, params, t, x, y_index, x_index, fused=False)
        y1, j1, h1 = output_jacobian_hessian_grouped(
            model, params, t, x, y_index, x_index, fused=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=5e-5, err_msg=name)
        jscale = float(jnp.max(jnp.abs(j0))) + 1e-8
        np.testing.assert_allclose(np.asarray(j1) / jscale,
                                   np.asarray(j0) / jscale, atol=5e-5,
                                   err_msg=name)
        hscale = float(jnp.max(jnp.abs(h0))) + 1e-8
        np.testing.assert_allclose(np.asarray(h1) / hscale,
                                   np.asarray(h0) / hscale, atol=5e-5,
                                   err_msg=name)
        if x_index is None:
            np.testing.assert_array_equal(
                np.asarray(h1), np.asarray(h1).swapaxes(-1, -2),
                err_msg=f"{name}: hessian not exactly symmetric")

    siren = nif_tpu.NIFMultiScale(
        {"input_dim": 3, "output_dim": 2, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 2, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    check("siren", siren, 3)
    check("siren subset", siren, 3, y_index=1, x_index=[0, 2])

    resb = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 2,
         "activation": "sine", "use_resblock": True, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    check("resblock", resb, 2)

    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    check("nif-linear", lin, 2)

    # vanilla chains have no second-order kernel: fused=None/True both
    # fall back to the XLA path (the predicate gates, never crashes)
    van = nif_tpu.NIF(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "tanh", "use_resblock": False,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "swish", "use_resblock": False},
    )
    vparams = van.init(jax.random.key(4))
    vt = jnp.asarray(rng.standard_normal((G, 1)), jnp.float32)
    vx = jnp.asarray(rng.uniform(-1, 1, (G, P, 2)), jnp.float32)
    vy, vj, vh = output_jacobian_hessian_grouped(
        van, vparams, vt, vx, fused=True)
    assert vh.shape == (G, P, 1, 2, 2)
