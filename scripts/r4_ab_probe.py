"""A/B the colsum-on-MXU switch within ONE process (same chip state):
times w128/w256 train steps with NIF_COLSUM_MXU=1 then =0, interleaved.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.r4_kernel_probe import make_model, time_step  # noqa: E402


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    tx = optax.adam(1e-4)
    rng = np.random.default_rng(0)
    G, P = 32, 32768
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)

    jobs = []
    for vname, vkw in (("w128_d2", dict(units=128, nlayers=2)),
                       ("w256_d2", dict(units=256, nlayers=2))):
        model = make_model(**vkw)
        params = model.init(jax.random.key(0))
        opt = tx.init(params)

        for flag in ("1", "0"):
            jobs.append((vname, flag, model, params, opt))

    # two rounds over all jobs so chip-state drift shows as within-config
    # spread rather than biasing the A/B
    for rnd in range(2):
        for vname, flag, model, params, opt in jobs:
            os.environ["NIF_COLSUM_MXU"] = flag

            def step(state, model=model):
                p, o = state
                loss, grads = model.mse_value_and_grad(p, t, x, u)
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            # flag is read at TRACE time; separate jit cache per flag via
            # a fresh closure each round is NOT enough (jit caches on
            # function identity) — but each loop iteration creates a new
            # `step`, so each (variant, flag, round) compiles fresh for
            # flag changes and hits the XLA compile cache for repeats.
            dt = time_step(step, (params, opt))
            print(json.dumps({
                "round": rnd, "variant": vname, "colsum_mxu": flag,
                "step_ms": round(dt * 1e3, 4),
                "points_per_sec": round(G * P / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
