"""Optimizers: AdaBelief variants, Lion, gradient centralization, schedules,
L-BFGS convergence on analytic problems."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nif_tpu.optimizers import (
    LBFGS,
    adabelief,
    adabelief_full,
    centralize_gradients,
    lbfgs_minimize,
    lion,
    warmup_linear_decay,
)


def rosenbrock(p):
    x, y = p["x"], p["y"]
    return (1 - x) ** 2 + 100 * (y - x**2) ** 2


def quad(p):
    return jnp.sum((p - jnp.arange(5.0)) ** 2)


def run_opt(tx, loss, p0, steps=500):
    state = tx.init(p0)
    p = p0

    @jax.jit
    def step(p, state):
        g = jax.grad(loss)(p)
        upd, state = tx.update(g, state, p)
        return optax.apply_updates(p, upd), state

    for _ in range(steps):
        p, state = step(p, state)
    return p, float(loss(p))


def test_lbfgs_minimize_quadratic():
    p0 = jnp.zeros(5)
    p, losses = lbfgs_minimize(quad, p0, max_iter=100)
    assert float(quad(p)) < 1e-10
    assert losses[0] > losses[-1]


def test_lbfgs_minimize_rosenbrock():
    p0 = {"x": jnp.float32(-1.2), "y": jnp.float32(1.0)}
    p, losses = lbfgs_minimize(rosenbrock, p0, max_iter=300)
    assert float(rosenbrock(p)) < 1e-6


def test_lbfgs_records_history():
    p, losses = lbfgs_minimize(quad, jnp.zeros(5), max_iter=50)
    assert len(losses) >= 1
    assert np.all(np.isfinite(losses))


def test_adabelief_full_converges():
    p0 = {"x": jnp.float32(-1.0), "y": jnp.float32(2.0)}
    # early degenerated-to-SGD steps explode on stiff problems without
    # warmup — the reference pairs AdaBelief with its warmup schedule
    tx = adabelief_full(1e-2, total_steps=3000, warmup_proportion=0.1)
    _, l = run_opt(tx, rosenbrock, p0, steps=3000)
    # rosenbrock valley descent is slow for adaptive methods; assert strong
    # progress from the initial loss of 104
    assert l < 5.0


@pytest.mark.parametrize("rectify,amsgrad", [(False, False), (True, False),
                                             (False, True), (True, True)])
def test_adabelief_variants_decrease_loss(rectify, amsgrad):
    p0 = jnp.array([5.0, -3.0, 2.0, 0.0, 1.0])
    tx = adabelief_full(1e-1, rectify=rectify, amsgrad=amsgrad)
    _, l = run_opt(tx, quad, p0, steps=300)
    assert l < float(quad(p0)) * 0.05


def test_adabelief_matches_optax_when_plain():
    """rectify=False, amsgrad=False should track optax.adabelief closely."""
    p0 = jnp.array([2.0, -1.0])
    loss = lambda p: jnp.sum(p**2)
    p_a, _ = run_opt(adabelief_full(1e-2, rectify=False, eps=1e-16), loss, p0, 100)
    p_b, _ = run_opt(optax.adabelief(1e-2, eps=1e-16, eps_root=1e-16), loss, p0, 100)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=2e-2)


def test_lion_converges():
    p0 = jnp.array([5.0, -3.0])
    _, l = run_opt(lion(1e-2), lambda p: jnp.sum(p**2), p0, steps=500)
    # Lion's sign updates orbit the optimum at ~lr scale
    assert l < 0.5


def test_centralized_gradients():
    tx = optax.chain(centralize_gradients(), optax.sgd(1.0))
    params = {"w": jnp.ones((3, 4)), "b": jnp.ones(4)}
    grads = {"w": jnp.ones((3, 4)) * 2.0, "b": jnp.ones(4) * 2.0}
    state = tx.init(params)
    upd, _ = tx.update(grads, state, params)
    # kernel grad centered over non-last axes -> exactly zero here
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.0, atol=1e-7)
    # bias (rank 1) untouched
    np.testing.assert_allclose(np.asarray(upd["b"]), -2.0, atol=1e-7)


def test_warmup_linear_decay_shape():
    sched = warmup_linear_decay(1e-3, total_steps=100, warmup_proportion=0.2,
                                min_lr=1e-5)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(20)) == pytest.approx(1e-3, rel=0.1)
    assert float(sched(100)) == pytest.approx(1e-5, rel=0.1)


def test_adabelief_with_schedule():
    tx = adabelief(1e-2, total_steps=200, warmup_proportion=0.1, min_lr=1e-5)
    p0 = jnp.array([3.0, -2.0])
    _, l = run_opt(tx, lambda p: jnp.sum(p**2), p0, steps=200)
    assert l < 1.0


def test_lbfgs_resume_continues():
    """Resumable L-BFGS: two 25-iter resumed calls track one 50-iter run."""
    p0 = jnp.zeros(5)
    p_a, l_a, st = lbfgs_minimize(quad, p0, max_iter=25, return_state=True)
    p_a2, l_a2 = lbfgs_minimize(quad, p_a, max_iter=25, opt_state=st)
    p_b, l_b = lbfgs_minimize(quad, p0, max_iter=50)
    assert float(quad(p_a2)) < 1e-8
    assert float(quad(p_b)) < 1e-8
