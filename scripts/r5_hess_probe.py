"""Round-5 hardware probe: the fused second-order (hessian) train kernel.

Measures hessian-target train throughput at the FLAGSHIP scale
(w128 d2, si=3, G=32, P=32768 — 1M points/step) for the fused kernel vs
the XLA nested-jacfwd path, plus the weighted variant (Mosaic block rules
only fail at real compile). VERDICT r4 item 1 bar: >= 15M pts/s.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu


def steady(step_fn, state0, n1, n2, repeats=3):
    runs = {}
    for n in (n1, n2):
        @jax.jit
        def run(state, n=n):
            def body(c, _):
                c, loss = step_fn(c)
                return c, loss
            c, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]
        t0 = time.perf_counter()
        _ = float(run(state0))
        print(f"  compile+warm n={n}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        runs[n] = run
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(runs[n1](state0))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(runs[n2](state0))
        d2 = time.perf_counter() - t0
        dts.append((d2 - d1) / (n2 - n1) if d2 > d1 else d2 / n2)
    return float(np.median(dts)), min(dts), max(dts)


def main():
    print("devices:", jax.devices(), flush=True)
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 3, "output_dim": 1, "units": 128, "nlayers": 2,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.01},
        {"input_dim": 4, "latent_dim": 128, "units": 128, "nlayers": 2,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
        mixed_policy="mixed_bfloat16",
    )
    tx = optax.adam(1e-4)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 32, 32768
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)
    jt = jnp.asarray(rng.standard_normal((G, P, 1, 3)), jnp.float32)
    ht0 = rng.standard_normal((G, P, 1, 3, 3)).astype(np.float32)
    ht = jnp.asarray(0.5 * (ht0 + ht0.transpose(0, 1, 2, 4, 3)))
    w = jnp.asarray(rng.uniform(0.5, 1.5, (G, P)), jnp.float32)

    from nif_tpu.ops.pallas_shapenet import _pick_tile_hessian
    print("tile:", _pick_tile_hessian(P, model.cfg_shape_net, 3, 2),
          flush=True)

    def mk_step(fused, weight=None, Pc=P):
        xc, uc, jtc, htc = x[:, :Pc], u[:, :Pc], jt[:, :Pc], ht[:, :Pc]
        wc = None if weight is None else weight[:, :Pc]

        def step(state):
            p, o = state
            tot, _terms, grads = model.sobolev_value_and_grad(
                p, t, xc, uc, target_jac=jtc, target_hess=htc,
                w_jac=0.1, w_hess=0.01, weight=wc, fused=fused)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), tot
        return step

    state0 = (params, tx.init(params))

    print("== fused hessian train (flagship P=32768) ==", flush=True)
    med, lo, hi = steady(mk_step(True), state0, n1=5, n2=25, repeats=4)
    print(f"fused: {med * 1e3:.2f} ms/step [{lo * 1e3:.2f}..{hi * 1e3:.2f}]"
          f" -> {G * P / med / 1e6:.1f}M pts/s", flush=True)

    print("== fused WEIGHTED hessian train ==", flush=True)
    medw, lo, hi = steady(mk_step(True, weight=w), state0, n1=5, n2=25,
                          repeats=3)
    print(f"fused+w: {medw * 1e3:.2f} ms/step -> "
          f"{G * P / medw / 1e6:.1f}M pts/s", flush=True)

    print("== XLA hessian train (P=8192, r4 bench scale) ==", flush=True)
    medx, lo, hi = steady(mk_step(False, Pc=8192), state0, n1=2, n2=8,
                          repeats=3)
    print(f"xla:   {medx * 1e3:.2f} ms/step -> "
          f"{G * 8192 / medx / 1e6:.1f}M pts/s", flush=True)

    # loss sanity: fused vs XLA on the same batch (bf16 tolerance)
    totf, termsf, _ = model.sobolev_value_and_grad(
        params, t, x[:, :8192], u[:, :8192], target_jac=jt[:, :8192],
        target_hess=ht[:, :8192], w_jac=0.1, w_hess=0.01, fused=True)
    totx, termsx, _ = model.sobolev_value_and_grad(
        params, t, x[:, :8192], u[:, :8192], target_jac=jt[:, :8192],
        target_hess=ht[:, :8192], w_jac=0.1, w_hess=0.01, fused=False)
    print(f"loss fused {float(totf):.6f} vs xla {float(totx):.6f} "
          f"(rel {abs(float(totf) - float(totx)) / float(totx):.2e})",
          flush=True)
    for k in termsx:
        print(f"  {k}: fused {float(termsf[k]):.6f} "
              f"xla {float(termsx[k]):.6f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
