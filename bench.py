"""Headline benchmark: coordinate points/sec/chip (fwd+bwd) through the
ShapeNet eval, on the flagship NIFMultiScale model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``value``      — points/sec/chip for a full jitted train step (forward +
                 backward + adam update) in the grouped TPU-first layout.
``vs_baseline`` — speedup over the reference-style point-wise layout (the
                 reference recomputes the generated weight vector for every
                 coordinate point; see SURVEY.md section 3.1), measured on
                 the same chip with the same model. The reference publishes
                 no absolute numbers (BASELINE.md), so its own algorithmic
                 layout is the baseline.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu


def make_model():
    # Paper-scale-ish config: 3-D coordinates, width-128 SIREN ShapeNet.
    cfg_s = {
        "input_dim": 3,
        "output_dim": 1,
        "units": 128,
        "nlayers": 2,
        "activation": "sine",
        "use_resblock": False,
        "omega_0": 30.0,
        "connectivity": "full",
        "weight_init_factor": 0.01,
    }
    cfg_p = {
        "input_dim": 4,  # (t, mu1..mu3)
        "latent_dim": 128,
        "units": 128,
        "nlayers": 2,
        "activation": "swish",
        "use_resblock": False,
        "omega_0": 30.0,
    }
    return nif_tpu.NIFMultiScale(cfg_s, cfg_p, mixed_policy="mixed_bfloat16")


def time_steps(step, args, warmup=3, iters=10):
    for _ in range(warmup):
        out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    model = make_model()
    tx = optax.adam(1e-4)
    params = model.init(jax.random.key(0))
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)

    # ---------------- grouped layout (TPU-first fast path) ----------------
    G, P = 32, 8192  # 262,144 points per step
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)

    def loss_grouped(params, t, x, u):
        pred = model.apply_grouped(params, t, x)
        return jnp.mean(jnp.square(pred - u))

    @jax.jit
    def step_grouped(params, opt_state, t, x, u):
        loss, grads = jax.value_and_grad(loss_grouped)(params, t, x, u)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dt_grouped = time_steps(step_grouped, (params, opt_state, t, x, u))
    pps_grouped = G * P / dt_grouped

    # ------------- point-wise layout (reference algorithmic baseline) -----
    B = 8192  # wb materializes [B, po_dim]; keep memory bounded
    inp = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)

    def loss_pw(params, inp, tgt):
        pred = model.apply(params, inp)
        return jnp.mean(jnp.square(pred - tgt))

    @jax.jit
    def step_pw(params, opt_state, inp, tgt):
        loss, grads = jax.value_and_grad(loss_pw)(params, inp, tgt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dt_pw = time_steps(step_pw, (params, opt_state, inp, tgt))
    pps_pw = B / dt_pw

    print(
        json.dumps(
            {
                "metric": "shapenet_train_points_per_sec_per_chip",
                "value": round(pps_grouped, 1),
                "unit": "points/s",
                "vs_baseline": round(pps_grouped / pps_pw, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
