"""Regression: every model family x regularizer x (fused/unfused) trains
one step through mse_value_and_grad / GroupedTrainer (VERDICT round-1
Weak #2: NIF-linear + any regularizer + grouped training raised TypeError
because the regularization_loss override dropped the t= kwarg)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import nif_tpu


def _make_model(family, **pnet_reg):
    cfg_s = {"input_dim": 2, "output_dim": 1, "units": 8, "nlayers": 1,
             "activation": "tanh", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 1.0}
    cfg_p = {"input_dim": 1, "latent_dim": 4, "units": 8, "nlayers": 1,
             "activation": "tanh", "use_resblock": False, "omega_0": 30.0,
             **pnet_reg}
    if family == "nif":
        cfg_s = {k: cfg_s[k] for k in
                 ("input_dim", "output_dim", "units", "nlayers", "activation")}
        return nif_tpu.NIF(cfg_s, cfg_p)
    if family == "multiscale":
        cfg_s["activation"] = "sine"
        return nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    cfg_s.update(activation="sine", connectivity="last_layer")
    return nif_tpu.NIFMultiScaleLastLayerParameterized(cfg_s, cfg_p)


def _batch(seed=0, G=2, P=16):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((G, 1)).astype(np.float32),
            rng.standard_normal((G, P, 2)).astype(np.float32),
            rng.standard_normal((G, P, 1)).astype(np.float32))


REGS = [{"l2_reg": 1e-3}, {"act_l2_reg": 1e-3}, {"jac_reg": 1e-3}]


@pytest.mark.parametrize("family", ["nif", "multiscale", "linear"])
@pytest.mark.parametrize("reg", REGS, ids=lambda r: next(iter(r)))
@pytest.mark.parametrize("fused", [False, True])
def test_regularized_mse_value_and_grad(family, reg, fused):
    model = _make_model(family, **reg)
    params = model.init(jax.random.key(0))
    t, x, u = _batch()
    loss, grads = model.mse_value_and_grad(params, t, x, u, fused=fused)
    assert np.isfinite(float(loss))
    # reg contributes: loss with reg > plain MSE
    loss_plain, _ = model.mse_value_and_grad(params, t, x, u, fused=fused,
                                             use_reg=False)
    assert float(loss) > float(loss_plain)
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g, np.float32)))


@pytest.mark.parametrize("reg", REGS, ids=lambda r: next(iter(r)))
def test_padded_batch_regularization_exact(reg):
    """Zero-weight tail padding must not bias batch-mean regularization
    terms (act/jac): padded loss+grads == exact loss+grads on the real
    rows (round-2 review finding)."""
    from nif_tpu.training.trainer import pad_batch, reg_row_weights

    model = _make_model("multiscale", **reg)
    params = model.init(jax.random.key(1))
    t, x, u = _batch(G=3, P=16)
    loss_exact, grads_exact = model.mse_value_and_grad(params, t, x, u,
                                                       fused=False)
    # pad 3 real groups to 4 with a zero-weight filler copy
    (tp, xp, up), w_rows = pad_batch((t, x, u), None, 3, 4)
    w = np.broadcast_to(w_rows[:, None], (4, 16))
    rw = reg_row_weights(3, 4)
    loss_pad, grads_pad = model.mse_value_and_grad(
        params, tp, xp, up, weight=w, fused=False, reg_weight=rw
    )
    assert float(loss_pad) == pytest.approx(float(loss_exact), rel=1e-5)
    for ge, gp in zip(jax.tree_util.tree_leaves(grads_exact),
                      jax.tree_util.tree_leaves(grads_pad)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ge),
                                   rtol=2e-4, atol=1e-7)
    # without reg_weight the padded batch-mean reg terms ARE biased
    # (guards against the fix silently regressing to the unweighted path);
    # compare the reg component directly — it can be tiny vs the MSE
    if "act_l2_reg" in reg or "jac_reg" in reg:
        reg_exact = float(model.regularization_loss(params, t=t))
        reg_bad = float(model.regularization_loss(params, t=tp))
        reg_fixed = float(
            model.regularization_loss(params, t=tp, reg_weight=rw)
        )
        assert reg_fixed == pytest.approx(reg_exact, rel=1e-5)
        assert reg_bad != pytest.approx(reg_exact, rel=1e-6)


def test_grouped_trainer_tail_batch_reg_exact():
    """GroupedTrainer end-to-end: with a tail group batch (G=3,
    group_batch=2) and activity reg, the recorded epoch loss equals the
    size-weighted average of the EXACT per-batch losses (replaying the
    trainer's rng draws) — i.e. the padded filler group contributes
    nothing to MSE or reg."""
    t, x, u = _batch(G=3, P=8)
    model = _make_model("multiscale", act_l2_reg=1e-2)
    tr = nif_tpu.training.GroupedTrainer(model, optax.adam(1e-3), seed=7)
    state0 = tr.init(jax.random.key(0))
    tr.fit(state0, t, x, u, epochs=1, group_batch=2, point_batch=8)
    epoch_loss = tr.history["loss"][-1]

    # replay: same rng stream as fit (seed=7: permutation, then one
    # point-choice per group batch)
    rng = np.random.default_rng(7)
    order = rng.permutation(3)
    psel1 = rng.choice(8, size=8, replace=False)
    psel2 = rng.choice(8, size=8, replace=False)
    model2 = _make_model("multiscale", act_l2_reg=1e-2)
    tr2 = nif_tpu.training.GroupedTrainer(model2, optax.adam(1e-3), seed=7)
    state = tr2.init(jax.random.key(0))
    s1 = order[:2]
    state, l1 = tr2.step(state, t[s1], x[s1][:, psel1], u[s1][:, psel1])
    s2 = order[2:]
    l2, _ = model2.mse_value_and_grad(
        state.params, t[s2], x[s2][:, psel2], u[s2][:, psel2], fused=False
    )
    expect = np.average([float(l1), float(l2)], weights=[2, 1])
    assert epoch_loss == pytest.approx(expect, rel=1e-5)


@pytest.mark.parametrize("family", ["nif", "multiscale", "linear"])
def test_regularized_grouped_trainer_step(family):
    """The round-1 crash repro: reg x model x GroupedTrainer default path."""
    model = _make_model(family, l2_reg=1e-4, act_l2_reg=1e-4, jac_reg=1e-4)
    trainer = nif_tpu.training.GroupedTrainer(model, optax.adam(1e-3))
    state = trainer.init(jax.random.key(0))
    t, x, u = _batch()
    state = trainer.fit(state, t, x, u, epochs=2, group_batch=2, point_batch=16)
    assert np.isfinite(trainer.history["loss"][-1])
