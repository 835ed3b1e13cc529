"""Round-5 roofline probe (VERDICT r4 item 4): close the w128 question.

Measures, in ONE run (so chip clock state cancels):
  1. MXU peak      — large bf16 matmul chain (the bench's calibration)
  2. VPU peak      — iterated FMA polynomial on a resident f32 array
                     (compute-bound: 192 ops per 8 bytes moved)
  3. HBM bandwidth — big-array add (2 reads + 1 write per element)
  4. the flagship fused-train step time (w128 d2, G=32, P=32768)

then composes train_kernel_cost_model's counts with the measured peaks
into the serial time model t = t_MXU + t_VPU + t_HBM and reports the
coverage of the measured step. Either the model explains >= 85% of the
step (proof that points/s is op-mix bound) or the residual locates the
next kernel win.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu
from nif_tpu.utils.roofline import train_kernel_cost_model


def paired(short_fn, long_fn, n_short, n_long, repeats=3):
    float(short_fn())
    float(long_fn())
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(short_fn())
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long_fn())
        d2 = time.perf_counter() - t0
        if d2 > d1:
            dts.append((d2 - d1) / (n_long - n_short))
    return float(np.median(dts))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. MXU peak (bf16) ----
    NK = 8192
    w_pk = jnp.asarray(rng.standard_normal((NK, NK)) / np.sqrt(NK),
                       jnp.bfloat16)
    y_pk = jnp.asarray(rng.standard_normal((4096, NK)), jnp.bfloat16)

    def peak_run(n):
        @jax.jit
        def f(y):
            out, _ = jax.lax.scan(
                lambda c, _: (jnp.dot(c, w_pk,
                                      preferred_element_type=jnp.bfloat16),
                              None), y, None, length=n)
            return out.astype(jnp.float32).sum()
        return lambda: f(y_pk)

    dt = paired(peak_run(30), peak_run(150), 30, 150)
    mxu_peak = 2 * 4096 * NK * NK / dt
    print(f"MXU peak: {mxu_peak / 1e12:.1f} TF/s", flush=True)

    # ---- 1b. MXU at the KERNEL's matmul shape ----
    # The train kernel's passes are [TP, 128] x [128, 128] — K=128, not
    # 8192: each pass pays pipeline fill/drain against only 128
    # contraction depth, so the achievable rate at this shape (not the
    # big-matmul peak) is the honest MXU component for the model.
    # 16 dependent matmuls per scan body amortize the per-iteration scan
    # overhead; windows sized so the differenced signal is >= 300 ms
    # (the axon relay adds ~10 ms jitter per readback — a sub-noise
    # window measured 222 TF/s, i.e. above peak, in an earlier run).
    wk = jnp.asarray(rng.standard_normal((128, 128)) / 12.0, jnp.bfloat16)
    yk = jnp.asarray(rng.standard_normal((4096, 128)), jnp.bfloat16)
    CH = 16

    def kshape_run(n):
        @jax.jit
        def f(y):
            def body(c, _):
                for _ in range(CH):
                    c = jnp.dot(c, wk,
                                preferred_element_type=jnp.bfloat16)
                return c, None
            out, _ = jax.lax.scan(body, y, None, length=n)
            return out.astype(jnp.float32).sum()
        return lambda: f(yk)

    dt = paired(kshape_run(2000), kshape_run(17000), 2000, 17000)
    mxu_kshape = CH * 2 * 4096 * 128 * 128 / dt
    print(f"MXU @ [4096,128]x[128,128]: {mxu_kshape / 1e12:.1f} TF/s "
          f"({mxu_kshape / mxu_peak * 100:.0f}% of big-matmul peak)",
          flush=True)

    # ---- 2. VPU peak: iterated degree-3 FMA polynomial, f32 ----
    # 64 inner iterations x 3 ops per element per pass: 192 ops per 8
    # bytes -> compute-bound at any plausible bandwidth. The polynomial
    # keeps |x| <= 1 so values stay finite across any scan length.
    A = jnp.asarray(rng.uniform(-1, 1, (1024, 1024)), jnp.float32)
    K = 64

    def vpu_run(n):
        @jax.jit
        def f(x):
            def body(c, _):
                y = c
                for _ in range(K):
                    # 1 mul + 2 fma = 3 VPU ops/element
                    y = y * (0.25 + y * (0.5 - 0.25 * y))
                return y, None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out.sum()
        return lambda: f(A)

    # window: ~50 us/step at the ~4 T ops/s hardware rate -> 8000
    # differenced steps = ~0.4 s of signal (>= 300 ms bar)
    dt = paired(vpu_run(1000), vpu_run(9000), 1000, 9000)
    vpu_peak = A.size * K * 3 / dt
    print(f"VPU peak: {vpu_peak / 1e12:.2f} T ops/s (f32)", flush=True)

    # ---- 3. HBM bandwidth: out = a + b over 256 MB operands ----
    big_a = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.float32)
    big_b = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.float32)

    def hbm_run(n):
        @jax.jit
        def f(a, b):
            def body(c, _):
                return (c[1] + 1e-7 * c[0], c[0]), None
            (x, y), _ = jax.lax.scan(body, (a, b), None, length=n)
            return x.sum()
        return lambda: f(big_a, big_b)

    dt = paired(hbm_run(10), hbm_run(130), 10, 130)
    hbm_bw = big_a.size * 4 * 3 / dt  # 2 reads + 1 write per step
    print(f"HBM bandwidth: {hbm_bw / 1e9:.0f} GB/s", flush=True)

    # ---- 4. flagship fused train step ----
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
    G, P = 32, 32768
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)
    state0 = (params, tx.init(params))

    def step_run(n):
        @jax.jit
        def f(state):
            def body(c, _):
                p, o = c
                loss, grads = model.mse_value_and_grad(p, t, x, u)
                upd, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, upd), o), loss
            _, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]
        return lambda: f(state0)

    dt_step = paired(step_run(20), step_run(120), 20, 120)
    print(f"flagship step: {dt_step * 1e3:.3f} ms "
          f"({G * P / dt_step / 1e6:.1f}M pts/s)", flush=True)

    # ---- compose ----
    cm = train_kernel_cost_model(model.cfg_shape_net, G, P)
    for name, rate in (("big-matmul peak", mxu_peak),
                       ("kernel-shape rate", mxu_kshape)):
        t_mxu = cm["mxu_flops"] / rate
        t_vpu = cm["vpu_ops"] / vpu_peak
        t_hbm = cm["hbm_bytes"] / hbm_bw
        t_model = t_mxu + t_vpu + t_hbm
        print(f"model[{name}]: MXU {t_mxu * 1e3:.3f} ms "
              f"+ VPU {t_vpu * 1e3:.3f} ms + HBM {t_hbm * 1e3:.3f} ms "
              f"= {t_model * 1e3:.3f} ms "
              f"-> coverage {t_model / dt_step * 100:.1f}% (bar >= 85%)",
              flush=True)
    print(f"counts: {cm}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
