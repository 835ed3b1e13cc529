"""Multi-host (multi-process) data-parallel training harness.

The reference tops out at single-node ``MirroredStrategy`` (reference
README.md:42-52). Here the pod-scale recipe is:

1. every process calls :func:`nif_tpu.parallel.init_distributed`;
2. build a mesh over the now-global ``jax.devices()``;
3. each process streams ITS stripe of the dataset
   (``GroupedDataset.open(path, host_id, num_hosts)``) and feeds LOCAL
   group batches to ``GroupedTrainer.step`` — :func:`put_batch` assembles
   the global array from the per-process shards, and the jitted step's
   gradient pmean rides the mesh collectives.

``run_worker`` below is that recipe as a self-contained entry point, used
by the 2-process CPU integration test (tests/test_multihost.py) and by
``__graft_entry__.dryrun_multihost``. Run it as::

    python -m nif_tpu.parallel.multihost --coordinator 127.0.0.1:1234 \
        --num-processes 2 --process-id 0 --data-dir /path/to/snapshots
"""
from __future__ import annotations

import argparse
import json
import os


def run_worker(
    coordinator: str,
    num_processes: int,
    process_id: int,
    data_dir: str,
    out_path: str = None,
    devices_per_process: int = 2,
    epochs: int = 2,
    group_batch_per_host: int = 2,
    point_batch: int = 64,
) -> float:
    """One process of a multi-host data-parallel training run.

    Returns the final step loss (identical on every process — it is
    pmean-reduced over the global mesh).
    """
    # Virtual CPU devices for the test harness; real TPU pods skip this.
    force_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{devices_per_process}"
            ).strip()

    import jax

    if force_cpu:
        # site hooks (e.g. a TPU relay plugin) can override the env var;
        # the config update is authoritative before backend init.
        jax.config.update("jax_platforms", "cpu")

    from . import init_distributed, make_mesh
    from ..data import GroupedDataset
    from ..training import GroupedTrainer

    init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    mesh = make_mesh()  # 1-D 'data' mesh over ALL processes' devices

    import numpy as np
    import optax

    import nif_tpu

    model = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 2, "latent_dim": 4, "units": 16, "nlayers": 1,
         "activation": "swish", "use_resblock": False, "omega_0": 30.0},
    )
    trainer = GroupedTrainer(model, optax.adam(1e-3), mesh=mesh)
    # Same seed everywhere -> identical replicated params.
    state = trainer.init(jax.random.key(0))

    ds = GroupedDataset()
    ds.open(data_dir, host_id=process_id, num_hosts=num_processes)

    loss = float("nan")
    for epoch, bt, bx, bu, _ in ds.iter_batches(
        group_batch=group_batch_per_host, point_batch=point_batch,
        epochs=epochs, seed=process_id,
    ):
        state, loss_arr = trainer.step(state, bt, bx, bu)
        loss = float(loss_arr)
    result = {
        "process_id": process_id,
        "num_processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "final_loss": loss,
        "steps": int(state.step),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(f"multihost worker {process_id}: {result}")
    return loss


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args(argv)
    run_worker(
        args.coordinator, args.num_processes, args.process_id,
        args.data_dir, args.out, args.devices_per_process, args.epochs,
    )


if __name__ == "__main__":
    main()
