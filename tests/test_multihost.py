"""Multi-host (2-process) data-parallel integration test on a local CPU
cluster: each process stripes the GroupedDataset shards and feeds local
batches; the pmean-reduced loss must come back identical on both.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel(tmp_path):
    from nif_tpu.data import GroupedDataset

    rng = np.random.default_rng(0)
    G, P = 8, 128
    t = rng.standard_normal((G, 2)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    data_dir = str(tmp_path / "snaps")
    GroupedDataset.create_from_arrays(t, x, u, data_dir, groups_per_file=2)

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"worker_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nif_tpu.parallel.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--data-dir", data_dir, "--out", out],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.load(open(o)) for o in outs]
    assert all(r["global_devices"] == 4 for r in results)
    assert all(r["num_processes"] == 2 for r in results)
    # 8 groups striped 4/4, local group_batch 2 -> 2 steps/epoch x 2 epochs
    assert all(r["steps"] == 4 for r in results)
    # pmean-reduced loss is identical across processes
    assert results[0]["final_loss"] == pytest.approx(
        results[1]["final_loss"], rel=1e-6
    )
    assert np.isfinite(results[0]["final_loss"])
