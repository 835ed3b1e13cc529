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
