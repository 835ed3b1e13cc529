"""Tutorial 12 (TPU-native extra) — multi-host (pod-scale) data parallelism.

The reference tops out at single-node ``MirroredStrategy`` (reference
README.md:42-52). On a TPU pod each HOST process runs this same script:

    from nif_tpu.parallel import init_distributed, make_mesh, put_batch
    init_distributed()                  # auto-detected on TPU pods
    mesh = make_mesh()                  # spans ALL processes' chips
    trainer = GroupedTrainer(model, optax.adam(1e-3), mesh=mesh)
    state = trainer.init(jax.random.key(0))        # same seed on every host
    ds = GroupedDataset().open(path, host_id=jax.process_index(),
                               num_hosts=jax.process_count())
    for epoch, t, x, u, w in ds.iter_batches(group_batch, point_batch, epochs):
        state, loss = trainer.step(state, t, x, u, w)   # local shard in,
        # global batch assembled across hosts; gradient pmean over the mesh

Run locally (no pod needed) this example demonstrates the identical code
path on a 2-process CPU cluster by spawning workers
(``nif_tpu/parallel/multihost.py``) against a striped ``GroupedDataset``.
"""
import argparse


def main(n_processes=2, devices_per_process=2):
    import __graft_entry__ as g

    g.dryrun_multihost(n_processes, devices_per_process)
    return 0.0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=2)
    args = ap.parse_args()
    main(args.n_processes, args.devices_per_process)
