"""Round-5 hardware probe: the fused second-order EVALUATION kernel.

Measures (y, jac, hess) evaluation throughput at the flagship scale
(w128 d2, si=3, G=32, P=32768 — 1M points/eval) for the fused
forward-over-forward kernel (``shapenet_fwd_hess`` via
``output_jacobian_hessian_grouped(fused=True)``) vs the XLA nested-jacfwd
path, plus on-hardware numerics. Timing scans carry a serial dependency
through x so the kernel cannot be hoisted out of the loop, and windows
are sized to >= 300 ms of differenced signal (see CLAUDE.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import nif_tpu
from nif_tpu.ops import output_jacobian_hessian_grouped


def steady(run_factory, n1, n2, repeats=3):
    runs = {}
    for n in (n1, n2):
        run = run_factory(n)
        t0 = time.perf_counter()
        _ = float(run())
        print(f"  compile+warm n={n}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        runs[n] = run
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(runs[n1]())
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(runs[n2]())
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
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 32, 32768
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)

    from nif_tpu.ops.pallas_shapenet import _pick_tile_hess_eval
    print("tile:", _pick_tile_hess_eval(P, model.cfg_shape_net, 3, 2),
          flush=True)

    def mk_run(fused, Pc):
        xc = x[:, :Pc]

        def factory(n):
            @jax.jit
            def run():
                def body(c, _):
                    y, j, h = output_jacobian_hessian_grouped(
                        model, params, t, xc + c * 1e-9, fused=fused)
                    m = (jnp.mean(y.astype(jnp.float32))
                         + jnp.mean(h.astype(jnp.float32)))
                    return m, m
                _, ms = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return ms[-1]
            return run
        return factory

    print("== fused hess eval (flagship P=32768) ==", flush=True)
    med, lo, hi = steady(mk_run(True, P), n1=10, n2=40, repeats=4)
    print(f"fused: {med * 1e3:.2f} ms/eval [{lo * 1e3:.2f}..{hi * 1e3:.2f}]"
          f" -> {G * P / med / 1e6:.1f}M pts/s", flush=True)

    print("== XLA hess eval (P=8192) ==", flush=True)
    medx, lo, hi = steady(mk_run(False, 8192), n1=2, n2=10, repeats=3)
    print(f"xla:   {medx * 1e3:.2f} ms/eval -> "
          f"{G * 8192 / medx / 1e6:.1f}M pts/s", flush=True)
    print(f"ratio at P=8192-equivalent: {medx * P / (8192 * med):.1f}x",
          flush=True)

    # on-hardware numerics: fused vs XLA on the same bf16 batch
    Pn = 8192
    y0, j0, h0 = output_jacobian_hessian_grouped(
        model, params, t, x[:, :Pn], fused=False)
    y1, j1, h1 = output_jacobian_hessian_grouped(
        model, params, t, x[:, :Pn], fused=True)
    for name, a, b in (("y", y0, y1), ("jac", j0, j1), ("hess", h0, h1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        print(f"  {name}: rel l2 {rel:.2e} (bf16 path)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
