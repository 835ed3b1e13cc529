"""Probe: int8 vs f32 fixed-mesh ROM decode with the decoded field
MATERIALIZED (optimization_barrier), as a real serving decode would be —
the fused-mean form lets XLA skip the output write entirely, which
benchmarks phi-read bandwidth instead of the decode."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax  # noqa: F401

import nif_tpu
from nif_tpu.compression import quantize_shared_mesh, rom_decode_int8
from nif_tpu.models.parameter_net import parameter_net_apply


def steady(step_fn, state0, n1, n2, repeats):
    runs = {}
    for n in (n1, n2):
        @jax.jit
        def run(state, n=n):
            c, losses = jax.lax.scan(
                lambda c, _: step_fn(c), state, None, length=n)
            return losses[-1]
        _ = float(run(state0))
        runs[n] = run
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); _ = float(runs[n1](state0))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(runs[n2](state0))
        d2 = time.perf_counter() - t0
        dts.append((d2 - d1) / (n2 - n1) if d2 > d1 else d2 / n2)
    return float(np.median(dts)), sorted(dts)


def main():
    rng = np.random.default_rng(0)
    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        {"input_dim": 3, "output_dim": 1, "units": 128, "nlayers": 2,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "last_layer", "weight_init_factor": 1.0},
        {"input_dim": 4, "latent_dim": 128, "units": 128, "nlayers": 2,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
        mixed_policy="mixed_bfloat16",
    )
    lp = lin.init(jax.random.key(1))
    G_rom, P_rom = 256, 32768
    t_rom = jnp.asarray(rng.standard_normal((G_rom, 4)), jnp.float32)
    x_rom = jnp.asarray(rng.standard_normal((P_rom, 3)), jnp.float32)
    pack = quantize_shared_mesh(lin, lp, x_rom)
    phi_fixed = jnp.asarray(lin.x_to_phi(lp, x_rom), jnp.float32)

    def rom8_step(state):
        p, acc = state
        pred = rom_decode_int8(lin, p, pack, t_rom + acc * 1e-9)
        pred = jax.lax.optimization_barrier(pred)
        acc = jnp.mean(pred.astype(jnp.float32))
        return (p, acc), acc

    def romf_step(state):
        p, acc = state
        a, _ = parameter_net_apply(p["pnet"], t_rom + acc * 1e-9,
                                   lin.cfg_parameter_net, lin.pnet_kind)
        pred = jnp.einsum("pok,gk->gpo", phi_fixed, a)
        pred = jax.lax.optimization_barrier(pred)
        acc = jnp.mean(pred.astype(jnp.float32))
        return (p, acc), acc

    d8, s8 = steady(rom8_step, (lp, jnp.zeros(())), 500, 3000, 5)
    df, sf = steady(romf_step, (lp, jnp.zeros(())), 500, 3000, 5)
    pts = G_rom * P_rom
    print(f"int8 materialized: {d8*1e6:.1f} us/step  {pts/d8/1e9:.1f} B pts/s"
          f"  spread={[round(x*1e6,1) for x in s8]}")
    print(f"f32  materialized: {df*1e6:.1f} us/step  {pts/df/1e9:.1f} B pts/s"
          f"  spread={[round(x*1e6,1) for x in sf]}")
    print(f"int8_vs_f32 (materialized) = {df/d8:.3f}")


if __name__ == "__main__":
    main()
