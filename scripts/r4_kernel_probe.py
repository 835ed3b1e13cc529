"""Round-4 kernel experiment probe: times the fused train step for the
bench variants and prints one JSON line per (variant, tile) so before/after
kernel edits can be compared in the same chip clock state.

Usage: python scripts/r4_kernel_probe.py [tag]
Optional env:
  NIF_PROBE_TILES="0"        -> only default tile
  NIF_PROBE_REPEATS=N        -> timed repeats per point (default 5)
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

import nif_tpu
from nif_tpu.ops import pallas_shapenet as pk

TAG = sys.argv[1] if len(sys.argv) > 1 else "probe"
REPEATS = int(os.environ.get("NIF_PROBE_REPEATS", "5"))


def make_model(units=128, nlayers=2, use_resblock=False):
    cfg_s = {
        "input_dim": 3, "output_dim": 1, "units": units, "nlayers": nlayers,
        "activation": "sine", "use_resblock": use_resblock, "omega_0": 30.0,
        "connectivity": "full", "weight_init_factor": 0.01,
    }
    cfg_p = {
        "input_dim": 4, "latent_dim": 128, "units": 128, "nlayers": 2,
        "activation": "swish", "use_resblock": False, "omega_0": 30.0,
    }
    return nif_tpu.NIFMultiScale(cfg_s, cfg_p, mixed_policy="mixed_bfloat16")


def time_step(step_fn, state0, n1=5, n2=20, repeats=REPEATS):
    def run_n(n):
        @jax.jit
        def run(state):
            def body(c, _):
                c, loss = step_fn(c)
                return c, loss
            c, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        _ = float(run(state0))
        times = []
        for _i in range(repeats):
            t0 = time.perf_counter()
            _ = float(run(state0))
            times.append(time.perf_counter() - t0)
        return min(times)

    d1, d2 = run_n(n1), run_n(n2)
    if d2 <= d1:
        d1, d2 = run_n(n1), run_n(n2)
    if d2 <= d1:
        return d2 / n2
    return (d2 - d1) / (n2 - n1)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)
    tx = optax.adam(1e-4)
    rng = np.random.default_rng(0)
    G, P = 32, 32768
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)

    variants = [
        ("w128_d2", dict(units=128, nlayers=2)),
        ("w256_d2", dict(units=256, nlayers=2)),
    ]
    if os.environ.get("NIF_PROBE_RESBLOCK", "0") == "1":
        variants.append(
            ("w128_d4_resblock",
             dict(units=128, nlayers=4, use_resblock=True)))
    tile_overrides = [None]
    if os.environ.get("NIF_PROBE_TILES", "1") != "0":
        tile_overrides += [2048, 4096, 8192]

    orig_pick = pk._pick_tile
    for vname, vkw in variants:
        model = make_model(**vkw)
        params = model.init(jax.random.key(0))
        opt = tx.init(params)

        def step(state, model=model):
            p, o = state
            loss, grads = model.mse_value_and_grad(p, t, x, u)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        for tp in tile_overrides:
            if tp is None:
                pk._pick_tile = orig_pick
                label = "default"
            else:
                def fixed(Pn, cfg=None, backward=True, itemsize=2, tp=tp):
                    return tp if Pn % tp == 0 else orig_pick(
                        Pn, cfg, backward, itemsize)
                pk._pick_tile = fixed
                label = str(tp)
            try:
                dt = time_step(step, (params, opt))
                rec = {
                    "tag": TAG, "variant": vname, "tile": label,
                    "step_ms": round(dt * 1e3, 4),
                    "points_per_sec": round(G * P / dt, 1),
                }
            except Exception as e:  # compile OOM etc.
                rec = {"tag": TAG, "variant": vname, "tile": label,
                       "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
    pk._pick_tile = orig_pick


if __name__ == "__main__":
    main()
