"""Training loop, callbacks, checkpointing, grouped trainer, mesh parallel."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import nif_tpu
from nif_tpu.data.point_wise_data import PointWiseData
from nif_tpu.parallel import make_mesh
from nif_tpu.training import (
    CheckpointCallback,
    CSVLogger,
    GroupedTrainer,
    LearningRateScheduler,
    Trainer,
    TrainState,
)

CFG_S = {"input_dim": 1, "output_dim": 1, "units": 16, "nlayers": 2,
         "activation": "swish"}
CFG_P = {"input_dim": 1, "latent_dim": 1, "units": 16, "nlayers": 2,
         "activation": "swish"}


class _EasyWave(PointWiseData):
    """Dense global sinusoid for trainer-MECHANICS tests: 20x100 grid,
    u = sin(2pi(x - t)), standard-normalized.

    These tests assert mechanics ("loss drops 30% in 50 epochs", grouped
    slicing with G=20), not accuracy — the real demo fixture (the
    reference's localized K=4 wave packet, round 4) sits on a ~1000-epoch
    Adam plateau and has G=10, which is what the convergence anchors in
    test_convergence.py are calibrated on instead."""

    def __init__(self, n_t: int = 20, n_x: int = 100):
        t = np.linspace(0.0, 1.0, n_t, endpoint=False)
        x = np.linspace(0.0, 1.0, n_x, endpoint=False)
        tt, xx = np.meshgrid(t, x, indexing="ij")
        u = np.sin(2.0 * np.pi * (xx - tt))
        data = np.stack(
            [tt.ravel(), xx.ravel(), u.ravel()], axis=-1
        ).astype(np.float32)
        super().__init__(data[:, [0]], data[:, [1]], data[:, [2]])
        self.data, self.mean, self.std = self.standard_normalize(
            self.data_raw)
        self.n_t, self.n_x_grid = n_t, n_x


def make_data():
    tw = _EasyWave()
    return (np.asarray(tw.data[:, :2], np.float32),
            np.asarray(tw.u, np.float32), tw)


def test_trainer_decreases_loss():
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, inputs, targets, epochs=50, batch_size=500)
    assert trainer.history["loss"][-1] < trainer.history["loss"][0] * 0.7


def test_grouped_trainer_decreases_loss():
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = GroupedTrainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, t, x, u, epochs=100, group_batch=10,
                        point_batch=50)
    assert trainer.history["loss"][-1] < trainer.history["loss"][0] * 0.7
    mse = trainer.evaluate(state, t, x, u)
    assert mse < trainer.history["loss"][0]


def test_grouped_and_pointwise_agree_in_eval():
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    params = model.init(jax.random.key(1))
    u_grouped = np.asarray(model.apply_grouped(params, t, x, fused=False))
    flat_in = np.concatenate(
        [np.repeat(t, x.shape[1], 0), x.reshape(-1, 1)], axis=1
    ).astype(np.float32)
    u_pw = np.asarray(model.apply(params, flat_in)).reshape(u_grouped.shape)
    np.testing.assert_allclose(u_grouped, u_pw, rtol=1e-5, atol=1e-5)


def test_callbacks_csv_and_lr_scheduler(tmp_path):
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3)
    trainer = Trainer(model, tx)
    state = trainer.init(jax.random.key(0))
    csv_path = str(tmp_path / "log.csv")

    def schedule(epoch, lr):
        return 1e-4 if epoch >= 3 else lr

    state = trainer.fit(
        state, inputs, targets, epochs=6, batch_size=1000,
        callbacks=[CSVLogger(csv_path), LearningRateScheduler(schedule)],
    )
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 7  # header + 6 epochs
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(1e-4)


def test_checkpoint_resume(tmp_path):
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(0))
    ckpt_dir = str(tmp_path / "ckpt")
    state = trainer.fit(
        state, inputs, targets, epochs=4, batch_size=1000,
        callbacks=[CheckpointCallback(ckpt_dir, every=2)],
    )
    # fresh trainer resumes from latest checkpoint (saved at epoch 2,
    # after 3 epochs x 2 batches of training -> optimizer step 6)
    trainer2 = Trainer(model, optax.adam(2e-3))
    resumed = trainer2.init_or_restore(jax.random.key(99), ckpt_dir)
    assert int(resumed.step) == 6
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        assert a.shape == b.shape
    # restored params produce finite predictions
    u = model.apply(resumed.params, inputs[:4])
    assert np.all(np.isfinite(np.asarray(u)))


def test_resume_prefers_full_state_over_final_marker(tmp_path):
    """A completed CLI run leaves a params-only final marker at
    step + FINAL_MARKER_OFFSET; resume must pick the latest REAL
    full-state checkpoint below the offset (round-2 advisor finding)."""
    from nif_tpu.training import Checkpointer
    from nif_tpu.training.checkpoint import FINAL_MARKER_OFFSET

    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(0))
    ckpt_dir = str(tmp_path / "ckpt")
    state = trainer.fit(
        state, inputs, targets, epochs=4, batch_size=1000,
        callbacks=[CheckpointCallback(ckpt_dir, every=2)],
    )
    ckpt = Checkpointer(ckpt_dir)
    ckpt.save(int(state.step) + FINAL_MARKER_OFFSET, state.params)
    ckpt.wait()
    resumed = Trainer(model, optax.adam(2e-3)).init_or_restore(
        jax.random.key(99), ckpt_dir
    )
    assert int(resumed.step) == 6  # the full-state step, not the marker
    # with ONLY a marker present, it restores that (params-only)
    only_marker = str(tmp_path / "marker_only")
    ck2 = Checkpointer(only_marker)
    ck2.save(FINAL_MARKER_OFFSET + 8, state.params)
    ck2.wait()
    r2 = Trainer(model, optax.adam(2e-3)).init_or_restore(
        jax.random.key(99), only_marker
    )
    assert int(r2.step) == FINAL_MARKER_OFFSET + 8


def test_fit_resident_trains_and_matches_objective():
    """Device-resident grouped training (data staged once, point batches
    sampled on device): loss must converge like fit's, both without and
    with a mesh (dataset sharded over the group axis)."""
    cfg_s = {"input_dim": 1, "output_dim": 1, "units": 16, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1}
    cfg_p = {"input_dim": 1, "latent_dim": 2, "units": 16, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    rng = np.random.default_rng(0)
    G, P = 8, 128
    t = np.linspace(0, 1, G, dtype=np.float32)[:, None]
    x = rng.uniform(-1, 1, (G, P, 1)).astype(np.float32)
    u = np.sin(2 * np.pi * (x[..., 0] - t)).astype(np.float32)[..., None]

    for mesh in (None, make_mesh()):
        model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
        tr = GroupedTrainer(model, optax.adam(5e-3), mesh=mesh, seed=0)
        state = tr.init(jax.random.key(0))
        loss0 = tr.evaluate(state, t, x, u)
        state = tr.fit_resident(state, t, x, u, epochs=40, group_batch=4,
                                point_batch=64, seed=1)
        loss1 = tr.evaluate(state, t, x, u)
        assert loss1 < loss0 * 0.5, (mesh, loss0, loss1)
        # mesh rounds group_batch 4 -> 8 (one step/epoch); mesh-less keeps 2
        assert int(state.step) == (40 if mesh is not None else 80)

    # weighted variant: per-point weights ride the device-side gather
    model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    tr = GroupedTrainer(model, optax.adam(5e-3), seed=0)
    state = tr.init(jax.random.key(0))
    w = rng.uniform(0.5, 1.5, (G, P)).astype(np.float32)
    state = tr.fit_resident(state, t, x, u, sample_weight=w, epochs=5,
                            point_batch=64, seed=2)
    assert np.isfinite(tr.history["loss"][-1])


def test_fit_resident_chunked_dispatch_keeps_host_obligations():
    """fit_resident scan-chains steps on device in multi-epoch chunks
    (one dispatch per chunk — per-step dispatch over the TPU relay costs
    ~100x the step). Host-side obligations must survive the chunking:
    per-epoch history, validation exactly on its cadence, and callbacks
    seeing every epoch with end-of-epoch state."""
    cfg_s = {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1}
    cfg_p = {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    rng = np.random.default_rng(3)
    G, P = 4, 64
    t = np.linspace(0, 1, G, dtype=np.float32)[:, None]
    x = rng.uniform(-1, 1, (G, P, 1)).astype(np.float32)
    u = np.sin(2 * np.pi * x).astype(np.float32)

    seen = []

    class Recorder:
        def on_train_begin(self, trainer):
            pass

        def on_epoch_end(self, trainer, state, epoch, logs):
            seen.append((epoch, int(state.step), logs["loss"]))

        def on_train_end(self, trainer, state):
            seen.append(("end", int(state.step)))

    model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    tr = GroupedTrainer(model, optax.adam(5e-3), seed=0)
    state = tr.init(jax.random.key(0))
    state = tr.fit_resident(
        state, t, x, u, epochs=7, group_batch=2, point_batch=32, seed=1,
        callbacks=[Recorder()],
        validation_data=(t, x, u), validation_every=3,
    )
    # 2 steps/epoch x 7 epochs
    assert int(state.step) == 14
    assert tr.history["epoch"] == list(range(7))
    assert len(tr.history["loss"]) == 7
    # validation cadence: epochs 0, 3, 6
    assert tr.history["val_epoch"] == [0, 3, 6]
    assert all(np.isfinite(v) for v in tr.history["val_loss"])
    # callbacks saw every epoch, with state advancing 2 steps/epoch
    assert [s[0] for s in seen] == list(range(7)) + ["end"]
    assert [s[1] for s in seen[:-1]] == [2 * (e + 1) for e in range(7)]

    # without callbacks the whole run is chunked into few dispatches;
    # the key schedule is independent of chunking, so the trajectory
    # matches the per-epoch-dispatch (callback-constrained) run exactly
    model2 = nif_tpu.NIFMultiScale(cfg_s, cfg_p)
    tr2 = GroupedTrainer(model2, optax.adam(5e-3), seed=0)
    s2 = tr2.init(jax.random.key(0))
    tr2.fit_resident(s2, t, x, u, epochs=7, group_batch=2, point_batch=32,
                     seed=1)
    np.testing.assert_allclose(tr2.history["loss"],
                               [s[2] for s in seen[:-1]], rtol=1e-6)


def test_fast_path_observability(caplog):
    """An awkward P forfeits the fused kernel; the fallback must be
    loudly observable (round-2 review: it was silent and ~6-8x slower)."""
    import logging

    cfg_s = {"input_dim": 2, "output_dim": 1, "units": 16, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 30.0,
             "connectivity": "full", "weight_init_factor": 0.1}
    cfg_p = {"input_dim": 1, "latent_dim": 4, "units": 16, "nlayers": 1,
             "activation": "swish", "use_resblock": False, "omega_0": 30.0}
    model = nif_tpu.NIFMultiScale(cfg_s, cfg_p)

    # config-level introspection: divisibility reason wins over backend
    info = model.fast_path_info(1001)
    assert info["path"] == "xla" and "point tile" in info["reason"]
    # a clean P on CPU reports the backend as the reason
    info_ok = model.fast_path_info(1024)
    assert info_ok["path"] == "xla" and "not on TPU" in info_ok["reason"]

    # trainer: the warning fires once and history records the path
    G, P = 4, 129  # P=129 divides no tile
    rng = np.random.default_rng(0)
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    trainer = GroupedTrainer(model, optax.adam(1e-3))
    state = trainer.init(jax.random.key(0))
    with caplog.at_level(logging.WARNING, logger="nif_tpu"):
        state = trainer.fit(state, t, x, u, epochs=2, group_batch=4,
                            point_batch=129)
    warns = [r for r in caplog.records if "FALLING BACK" in r.message]
    assert len(warns) == 1  # once, not per step
    assert trainer.history["path"] == "xla"
    assert "point tile" in trainer.history["path_reason"]

    # NIF-linear override reports its own kernel's gate
    lin = nif_tpu.NIFMultiScaleLastLayerParameterized(
        dict(cfg_s, connectivity="last_layer"), cfg_p
    )
    assert "point tile" in lin.fast_path_info(77)["reason"]


def test_fresh_init_when_no_checkpoint(tmp_path):
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(1e-3))
    state = trainer.init_or_restore(jax.random.key(0), str(tmp_path / "none"))
    assert state.step == 0


def test_mesh_data_parallel_trainer():
    assert jax.device_count() == 8, "conftest should give 8 virtual devices"
    mesh = make_mesh()
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(2e-3), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, inputs, targets, epochs=20, batch_size=512)
    assert trainer.history["loss"][-1] < trainer.history["loss"][0]

    # parity: mesh vs single-device training gives same loss trajectory
    trainer1 = Trainer(model, optax.adam(2e-3))
    state1 = trainer1.init(jax.random.key(0))
    state1 = trainer1.fit(state1, inputs, targets, epochs=20, batch_size=512)
    np.testing.assert_allclose(
        trainer.history["loss"], trainer1.history["loss"], rtol=2e-3, atol=1e-5
    )


def test_mesh_grouped_trainer():
    mesh = make_mesh()
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()  # G=20 groups over 8 devices won't divide —
    t, x, u = t[:16], x[:16], u[:16]
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = GroupedTrainer(model, optax.adam(2e-3), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, t, x, u, epochs=20, group_batch=16,
                        point_batch=64)
    assert np.isfinite(trainer.history["loss"][-1])


def test_step_timer():
    from nif_tpu.utils import StepTimer

    timer = StepTimer(window=3)
    v = jnp.ones(())
    assert timer.tick(v) is None  # primes
    assert timer.tick(v) is None
    assert timer.tick(v) is None
    stats = timer.tick(v)
    assert stats is not None and stats["steps_per_sec"] > 0


def test_sharded_opt_state_trains():
    """ZeRO-1-style optimizer-state sharding trains identically."""
    mesh = make_mesh()
    inputs, targets, _ = make_data()
    big_cfg_p = dict(CFG_P, units=64, latent_dim=8)
    big_cfg_s = dict(CFG_S, units=64)
    model = nif_tpu.NIF(big_cfg_s, big_cfg_p)
    tr_sh = Trainer(model, optax.adam(2e-3), mesh=mesh, shard_opt_state=True)
    st_sh = tr_sh.init(jax.random.key(0))
    # the big hyper-head moments actually got sharded
    import jax as _jax
    shardings = {
        leaf.sharding.spec
        for leaf in _jax.tree_util.tree_leaves(st_sh.opt_state)
        if hasattr(leaf, "sharding") and leaf.size >= 1 << 16
    }
    assert any(s != () and s is not None and len(s) > 0 for s in shardings)
    st_sh = tr_sh.fit(st_sh, inputs, targets, epochs=10, batch_size=512)
    tr = Trainer(model, optax.adam(2e-3))
    st = tr.init(jax.random.key(0))
    st = tr.fit(st, inputs, targets, epochs=10, batch_size=512)
    np.testing.assert_allclose(tr_sh.history["loss"], tr.history["loss"],
                               rtol=2e-3, atol=1e-6)


def test_validation_data_logging():
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(2e-3))
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, inputs[:1500], targets[:1500], epochs=5,
                        batch_size=500,
                        validation_data=(inputs[1500:], targets[1500:]))
    assert len(trainer.history["val_loss"]) == 5
    assert all(np.isfinite(v) for v in trainer.history["val_loss"])


def test_grouped_trainer_fused_mode():
    """fused=True (interpret on CPU) trains equivalently to fused=False."""
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()
    cfg_s = {"input_dim": 1, "output_dim": 1, "units": 16, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 5.0,
             "connectivity": "full", "weight_init_factor": 0.01}
    model = nif_tpu.NIFMultiScale(cfg_s, CFG_P)
    results = {}
    for fused in [False, True]:
        trainer = GroupedTrainer(model, optax.adam(1e-3), fused=fused, seed=3)
        state = trainer.init(jax.random.key(0))
        state = trainer.fit(state, t, x, u, epochs=5, group_batch=20,
                            point_batch=100)
        results[fused] = trainer.history["loss"]
    np.testing.assert_allclose(results[True], results[False], rtol=1e-4,
                               atol=1e-6)


def test_batch_size_larger_than_data():
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(1e-3))
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, inputs[:100], targets[:100], epochs=2,
                        batch_size=10_000)
    assert np.isfinite(trainer.history["loss"][-1])


def test_tensorboard_callback_writes(tmp_path):
    """The torch-free event writer produces files TensorBoard itself can
    load (round-trip through tensorboard's event_file_loader, which
    verifies the TFRecord CRCs and protobuf layout)."""
    from nif_tpu.training import TensorBoardCallback

    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(1e-3))
    state = trainer.init(jax.random.key(0))
    logdir = str(tmp_path / "tb")
    state = trainer.fit(state, inputs[:200], targets[:200], epochs=2,
                        batch_size=100,
                        callbacks=[TensorBoardCallback(logdir)])
    event_files = [f for f in os.listdir(logdir)
                   if f.startswith("events.out.tfevents")]
    assert len(event_files) == 1
    assert "scalars.csv" in os.listdir(logdir)

    try:
        from tensorboard.backend.event_processing import event_file_loader
    except Exception:
        return  # writer exercised; reader unavailable in this env
    loader = event_file_loader.EventFileLoader(
        os.path.join(logdir, event_files[0]))
    events = list(loader.Load())
    assert events[0].file_version == "brain.Event:2"
    def _val(v):  # the loader migrates simple_value -> tensor float_val
        return v.tensor.float_val[0] if v.tensor.float_val else v.simple_value

    scalars = [
        (v.tag, e.step, _val(v))
        for e in events for v in e.summary.value
    ]
    losses = [s for s in scalars if s[0] == "loss"]
    assert [s[1] for s in losses] == [0, 1]  # one point per epoch
    np.testing.assert_allclose(  # simple_value is f32 in the proto
        [s[2] for s in losses], trainer.history["loss"], rtol=1e-5)


def test_cli_data_parallel(tmp_path):
    import json as _json
    from nif_tpu.cli import main as cli_main

    cfg = {
        "cfg_shape_net": {"input_dim": 1, "output_dim": 1, "units": 8,
                          "nlayers": 1, "activation": "tanh"},
        "cfg_parameter_net": {"input_dim": 1, "latent_dim": 1, "units": 8,
                              "nlayers": 1, "activation": "tanh"},
        "mixed_policy": "float32",
    }
    (tmp_path / "config.json").write_text(_json.dumps(cfg))
    rng = np.random.default_rng(0)
    data = np.stack([rng.uniform(0, 1, 320), rng.uniform(0, 1, 320),
                     rng.uniform(-1, 1, 320)], -1).astype(np.float32)
    np.savez(tmp_path / "d.npz", data=data)
    mse = cli_main([
        "train", "--config", str(tmp_path / "config.json"),
        "--data", str(tmp_path / "d.npz"), "--epochs", "3",
        "--batch-size", "320", "--data-parallel",
    ])
    assert np.isfinite(mse)


def test_full_state_resume_preserves_moments(tmp_path):
    """Resuming restores optimizer moments: the resumed trajectory must
    exactly match uninterrupted training (same data order)."""
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    ckpt_dir = str(tmp_path / "full")

    # uninterrupted: 6 epochs, no shuffle for determinism
    tr_a = Trainer(model, optax.adam(2e-3))
    st_a = tr_a.init(jax.random.key(0))
    st_a = tr_a.fit(st_a, inputs, targets, epochs=6, batch_size=1000,
                    shuffle=False)

    # interrupted at 3: checkpoint, new process resumes
    tr_b = Trainer(model, optax.adam(2e-3))
    st_b = tr_b.init(jax.random.key(0))
    st_b = tr_b.fit(st_b, inputs, targets, epochs=3, batch_size=1000,
                    shuffle=False,
                    callbacks=[CheckpointCallback(ckpt_dir, every=1)])
    tr_c = Trainer(model, optax.adam(2e-3))
    st_c = tr_c.init_or_restore(jax.random.key(123), ckpt_dir)
    assert st_c.step == st_b.step  # full state incl step restored
    st_c = tr_c.fit(st_c, inputs, targets, epochs=3, batch_size=1000,
                    shuffle=False)

    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_mesh_grouped_fused_shard_map():
    """The fused kernel under a mesh runs per-shard via shard_map and the
    pmean'd gradients match single-device training."""
    mesh = make_mesh()
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()
    t, x, u = t[:16], x[:16], u[:16]
    cfg_s = {"input_dim": 1, "output_dim": 1, "units": 16, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 5.0,
             "connectivity": "full", "weight_init_factor": 0.01}
    model = nif_tpu.NIFMultiScale(cfg_s, CFG_P)

    tr_mesh = GroupedTrainer(model, optax.adam(1e-3), mesh=mesh, fused=True,
                             seed=5)
    st_m = tr_mesh.init(jax.random.key(0))
    st_m = tr_mesh.fit(st_m, t, x, u, epochs=4, group_batch=16,
                       point_batch=100)

    tr_one = GroupedTrainer(model, optax.adam(1e-3), fused=True, seed=5)
    st_1 = tr_one.init(jax.random.key(0))
    st_1 = tr_one.fit(st_1, t, x, u, epochs=4, group_batch=16,
                      point_batch=100)
    np.testing.assert_allclose(tr_mesh.history["loss"], tr_one.history["loss"],
                               rtol=1e-4, atol=1e-6)


def test_tail_batch_trained_and_loss_exact():
    """VERDICT round-1 Weak #4: tail batches must not be dropped, and the
    zero-weight padding must not change the loss: with lr=0, the epoch loss
    over n=10, batch=8 (one full + one padded tail batch) equals the plain
    full-dataset MSE."""
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.sgd(0.0))
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    inputs = rng.standard_normal((10, 2)).astype(np.float32)
    targets = rng.standard_normal((10, 1)).astype(np.float32)
    state = trainer.fit(state, inputs, targets, epochs=1, batch_size=8,
                        shuffle=False)
    assert state.step == 2  # full batch + padded tail, none dropped
    direct = trainer.evaluate(state, inputs, targets)
    assert trainer.history["loss"][-1] == pytest.approx(direct, rel=1e-5)


def test_mesh_indivisible_batch_trains():
    """batch sizes not divisible by the data axis round up + pad."""
    mesh = make_mesh()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(1e-3), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    inputs = rng.standard_normal((1000, 2)).astype(np.float32)
    targets = rng.standard_normal((1000, 1)).astype(np.float32)
    state = trainer.fit(state, inputs, targets, epochs=1, batch_size=250)
    # 250 -> 256; ceil(1000/256) = 4 steps
    assert state.step == 4
    assert np.isfinite(trainer.history["loss"][-1])


def test_grouped_tail_groups_trained_and_loss_exact():
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 30.0},
    )
    trainer = GroupedTrainer(model, optax.sgd(0.0))
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 5, 32
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    state = trainer.fit(state, t, x, u, epochs=1, group_batch=2, point_batch=P)
    assert state.step == 3  # 2 + 2 + padded tail of 1
    direct = trainer.evaluate(state, t, x, u)
    assert trainer.history["loss"][-1] == pytest.approx(direct, rel=1e-5)


def test_grouped_mesh_indivisible_group_batch():
    mesh = make_mesh()
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 30.0},
    )
    trainer = GroupedTrainer(model, optax.adam(1e-3), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 10, 32
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    # group_batch=3 -> rounds to 8 on the 8-device mesh; 10 groups -> 2 steps
    state = trainer.fit(state, t, x, u, epochs=1, group_batch=3, point_batch=16)
    assert state.step == 2
    assert np.isfinite(trainer.history["loss"][-1])


def test_grouped_mesh_padded_reg_exact():
    """Mesh + group padding + activity reg: the shard_map path must carry
    the reg row weights (new in_specs packing) and stay exact — epoch loss
    == full MSE + full-batch reg with frozen params."""
    mesh = make_mesh()
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 30.0,
         "act_l2_reg": 1e-2},
    )
    trainer = GroupedTrainer(model, optax.sgd(0.0), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 10, 32
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    # group_batch=3 rounds to 8 on the 8-device mesh: batches of 8 real and
    # 2 real + 6 zero-weight pad groups
    state = trainer.fit(state, t, x, u, epochs=1, group_batch=3, point_batch=P)
    direct = trainer.evaluate(state, t, x, u)
    reg = float(model.regularization_loss(state.params, t=t))
    assert trainer.history["loss"][-1] == pytest.approx(direct + reg, rel=1e-5)


def test_trainer_mesh_padded_reg_exact():
    """Point-wise Trainer under a mesh with a padded tail batch and
    activity reg: epoch loss == full MSE + full-batch reg (frozen params)."""
    mesh = make_mesh()
    cfg_p = dict(CFG_P, act_l2_reg=1e-2)
    model = nif_tpu.NIF(CFG_S, cfg_p)
    trainer = Trainer(model, optax.sgd(0.0), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    inputs = rng.standard_normal((10, 2)).astype(np.float32)
    targets = rng.standard_normal((10, 1)).astype(np.float32)
    state = trainer.fit(state, inputs, targets, epochs=1, batch_size=8,
                        shuffle=False)
    assert state.step == 2
    direct = trainer.evaluate(state, inputs, targets)
    reg = float(model.regularization_loss(state.params, inputs))
    assert trainer.history["loss"][-1] == pytest.approx(direct + reg, rel=1e-5)


def test_grouped_weighted_tail_loss_exact():
    """Area-weighted case: padding must preserve the weighted mean."""
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 30.0},
    )
    trainer = GroupedTrainer(model, optax.sgd(0.0))
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 3, 16
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (G, P)).astype(np.float32)
    state = trainer.fit(state, t, x, u, sample_weight=w, epochs=1,
                        group_batch=2, point_batch=P)
    direct = trainer.evaluate(state, t, x, u, sample_weight=w)
    assert trainer.history["loss"][-1] == pytest.approx(direct, rel=1e-5)


def test_mesh_grouped_fused_shard_map_weighted():
    """Weighted fused path under a mesh (the round-2 [G,P,1] weight-layout
    fix): shard_map weighted training matches single-device."""
    mesh = make_mesh()
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()
    t, x, u = t[:16], x[:16], u[:16]
    rng = np.random.default_rng(3)
    w = rng.uniform(0.5, 1.5, u.shape[:2]).astype(np.float32)
    cfg_s = {"input_dim": 1, "output_dim": 1, "units": 16, "nlayers": 1,
             "activation": "sine", "use_resblock": False, "omega_0": 5.0,
             "connectivity": "full", "weight_init_factor": 0.01}
    model = nif_tpu.NIFMultiScale(cfg_s, CFG_P)

    tr_mesh = GroupedTrainer(model, optax.adam(1e-3), mesh=mesh, fused=True,
                             seed=5)
    st_m = tr_mesh.init(jax.random.key(0))
    st_m = tr_mesh.fit(st_m, t, x, u, sample_weight=w, epochs=3,
                       group_batch=16, point_batch=100)

    tr_one = GroupedTrainer(model, optax.adam(1e-3), fused=True, seed=5)
    st_1 = tr_one.init(jax.random.key(0))
    st_1 = tr_one.fit(st_1, t, x, u, sample_weight=w, epochs=3,
                      group_batch=16, point_batch=100)
    np.testing.assert_allclose(tr_mesh.history["loss"],
                               tr_one.history["loss"], rtol=1e-4, atol=1e-6)


def test_hybrid_mesh_replica_data_training():
    """Hybrid (replica x data) mesh — the multi-slice layout — trains with
    the batch sharded jointly over BOTH axes (VERDICT: hybrid mesh existed
    but was never driven end to end)."""
    from nif_tpu.parallel import batch_axis_size, make_hybrid_mesh
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("replica", "data"))
    assert batch_axis_size(mesh) == 8

    model = nif_tpu.NIF(CFG_S, CFG_P)
    trainer = Trainer(model, optax.adam(1e-3), mesh=mesh)
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    inputs = rng.standard_normal((64, 2)).astype(np.float32)
    targets = rng.standard_normal((64, 1)).astype(np.float32)
    state = trainer.fit(state, inputs, targets, epochs=2, batch_size=32)
    assert np.isfinite(trainer.history["loss"][-1])

    # single-slice fallback of make_hybrid_mesh presents the same axes
    hm = make_hybrid_mesh(ici_axes=("data",))
    assert hm.axis_names == ("replica", "data")


def test_residual_point_sampling_smoke():
    """Residual-guided point subsampling: per-group index path (weighted
    too) runs and trains."""
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 5.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 5.0},
    )
    trainer = GroupedTrainer(model, optax.adam(1e-3))
    state = trainer.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    G, P = 4, 64
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (G, P)).astype(np.float32)
    state = trainer.fit(state, t, x, u, sample_weight=w, epochs=4,
                        group_batch=2, point_batch=16,
                        point_sampling="residual", resample_every=2)
    assert np.isfinite(trainer.history["loss"][-1])
    with pytest.raises(ValueError):
        trainer.fit(state, t, x, u, epochs=1, point_sampling="bogus")


def test_residual_point_sampling_resident():
    """Device-resident residual sampling (VERDICT r3 item 8): the scanned
    step draws points from a resident categorical — refreshed logits,
    weighted + Sobolev variants, and a mesh all compose; it trains on a
    localized-feature problem where a uniform 8-point subsample rarely
    sees the feature."""
    from nif_tpu.parallel import make_mesh

    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 12, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 5.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 2, "units": 12, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 5.0},
    )
    rng = np.random.default_rng(0)
    G, P = 4, 128
    t = np.linspace(0, 1, G, dtype=np.float32)[:, None]
    x = rng.uniform(-1, 1, (G, P, 1)).astype(np.float32)
    # localized bump: nonzero only on ~10% of the domain
    u = np.exp(-200.0 * (x[..., 0] - 0.5) ** 2).astype(np.float32)[..., None]

    def run(sampling, **kw):
        tr = GroupedTrainer(model, optax.adam(5e-3), seed=0, **kw)
        st = tr.init(jax.random.key(0))
        st = tr.fit_resident(st, t, x, u, epochs=30, group_batch=G,
                             point_batch=8, point_sampling=sampling,
                             resample_every=5, seed=1)
        return tr.evaluate(st, t, x, u), tr

    mse_res, tr_res = run("residual")
    assert np.isfinite(mse_res)
    assert len(tr_res.history["loss"]) == 30

    # weighted + Sobolev + mesh variant composes
    w = rng.uniform(0.5, 1.5, (G, P)).astype(np.float32)
    ju = (-400.0 * (x[..., 0] - 0.5) * u[..., 0]).astype(
        np.float32)[..., None, None]
    tr2 = GroupedTrainer(model, optax.adam(1e-3), seed=0,
                         mesh=make_mesh(n_devices=2), w_jac=0.1)
    st2 = tr2.init(jax.random.key(0))
    st2 = tr2.fit_resident(st2, t, x, u, sample_weight=w, target_jac=ju,
                           epochs=6, group_batch=2, point_batch=16,
                           point_sampling="residual", resample_every=3,
                           seed=2)
    assert np.isfinite(tr2.history["loss"][-1])

    with pytest.raises(ValueError):
        tr2.fit_resident(st2, t, x, u, epochs=1, point_sampling="bogus")


def test_trainer_hessian_target_modes():
    """Second-order targets compose with every trainer mode (round-4
    review item 5): fit, fit_resident, and the mesh'd shard_map step all
    accept target_hess; the step loss matches sobolev_value_and_grad."""
    from nif_tpu.parallel import make_mesh

    model = nif_tpu.NIFMultiScale(
        {"input_dim": 2, "output_dim": 1, "units": 12, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 5.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 2, "units": 12, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 5.0},
    )
    rng = np.random.default_rng(0)
    G, P = 4, 64
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 2)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    ju = rng.standard_normal((G, P, 1, 2)).astype(np.float32)
    hu = rng.standard_normal((G, P, 1, 2, 2)).astype(np.float32)

    tr = GroupedTrainer(model, optax.adam(1e-3), w_jac=0.1, w_hess=0.01)
    st = tr.init(jax.random.key(0))
    # reference BEFORE the step: tr.step donates the state buffers
    ref, _terms, _g = model.sobolev_value_and_grad(
        st.params, t, x, u, target_jac=ju, target_hess=hu,
        w_jac=0.1, w_hess=0.01)
    st, loss = tr.step(st, t, x, u, target_jac=ju, target_hess=hu)
    assert float(loss) == pytest.approx(float(ref), rel=1e-5)

    st = tr.fit(st, t, x, u, target_jac=ju, target_hess=hu, epochs=2,
                group_batch=3, point_batch=16)  # tail pads hu too
    assert np.isfinite(tr.history["loss"][-1])
    st = tr.fit_resident(st, t, x, u, target_jac=ju, target_hess=hu,
                         epochs=2, group_batch=2, point_batch=16, seed=1)
    assert np.isfinite(tr.history["loss"][-1])

    # hessian-only (no target_jac) + mesh shard_map step
    tr2 = GroupedTrainer(model, optax.adam(1e-3), w_hess=0.01,
                         mesh=make_mesh(n_devices=2))
    st2 = tr2.init(jax.random.key(1))
    _, loss2 = tr2.step(st2, t, x, u, target_hess=hu)
    assert np.isfinite(float(loss2))


def test_gumbel_topk_is_valid_subsample():
    probs = np.full((3, 50), 1 / 50)
    idx = GroupedTrainer._gumbel_topk(probs, 10, np.random.default_rng(0))
    assert idx.shape == (3, 10)
    for row in idx:
        assert len(set(row.tolist())) == 10  # without replacement
        assert row.min() >= 0 and row.max() < 50


def test_grouped_arbitrary_axis_name_mesh_reduces():
    """A mesh with an arbitrary axis name must still pmean grads/loss over
    the batch axis (round-2 review: the reduce set and the sharding spec
    disagreed, silently training per-device)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("batch",))
    model = nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 30.0,
         "connectivity": "full", "weight_init_factor": 1.0},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 30.0},
    )
    rng = np.random.default_rng(0)
    G, P = 8, 32
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    tr_mesh = GroupedTrainer(model, optax.sgd(0.0), mesh=mesh)
    st = tr_mesh.init(jax.random.key(0))
    st = tr_mesh.fit(st, t, x, u, epochs=1, group_batch=8, point_batch=P)
    # frozen params: the reduced loss must equal the full-batch MSE, which
    # only holds if every device's shard was pmean'd together
    direct = tr_mesh.evaluate(st, t, x, u)
    assert tr_mesh.history["loss"][-1] == pytest.approx(direct, rel=1e-5)


def test_checkpoint_callback_resume_same_dir(tmp_path):
    """Saving into a directory that already holds checkpoints (the resume
    flow) must not collide: saves are keyed by global step, not epoch."""
    inputs, targets, _ = make_data()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    ckpt_dir = str(tmp_path / "ckpt")
    tr = Trainer(model, optax.adam(2e-3))
    st = tr.init(jax.random.key(0))
    st = tr.fit(st, inputs, targets, epochs=2, batch_size=1000,
                callbacks=[CheckpointCallback(ckpt_dir, every=1)])
    # resume against the SAME directory and keep checkpointing — the old
    # epoch-keyed scheme raised StepAlreadyExistsError at epoch 0 here
    tr2 = Trainer(model, optax.adam(2e-3))
    st2 = tr2.init_or_restore(jax.random.key(1), ckpt_dir)
    st2 = tr2.fit(st2, inputs, targets, epochs=2, batch_size=1000,
                  callbacks=[CheckpointCallback(ckpt_dir, every=1)])
    assert int(st2.step) == 8  # 2 + 2 epochs x 2 batches


def test_evaluate_batched_matches_full():
    """Batched evaluate (fixed executable, no full-dataset forward) returns
    the exact full-dataset weighted mean."""
    inputs, targets, _ = make_data()
    w = np.random.default_rng(3).uniform(0.5, 2.0, inputs.shape[0]).astype(np.float32)
    model = nif_tpu.NIF(CFG_S, CFG_P)
    tr = Trainer(model, optax.adam(1e-3))
    st = tr.init(jax.random.key(0))
    batched = tr.evaluate(st, inputs, targets, sample_weight=w, batch_size=300)
    pred = np.asarray(model.apply(st.params, jnp.asarray(inputs)))
    full = float(np.mean((pred - targets) ** 2 * w[:, None]))
    assert batched == pytest.approx(full, rel=1e-5)


def test_grouped_validation_logging():
    _, _, tw = make_data()
    t, x, u = tw.as_grouped()
    model = nif_tpu.NIF(CFG_S, CFG_P)
    tr = GroupedTrainer(model, optax.adam(2e-3))
    st = tr.init(jax.random.key(0))
    tr.fit(st, t[:16], x[:16], u[:16], epochs=4, group_batch=8,
           point_batch=50, validation_data=(t[16:], x[16:], u[16:]),
           validation_every=2)
    assert len(tr.history["val_loss"]) == 2
    assert tr.history["val_epoch"] == [0, 2]
    assert all(np.isfinite(v) for v in tr.history["val_loss"])


def _sobolev_model():
    return nif_tpu.NIFMultiScale(
        {"input_dim": 1, "output_dim": 1, "units": 8, "nlayers": 1,
         "activation": "sine", "use_resblock": False, "omega_0": 5.0,
         "connectivity": "full", "weight_init_factor": 0.1},
        {"input_dim": 1, "latent_dim": 2, "units": 8, "nlayers": 1,
         "activation": "tanh", "use_resblock": False, "omega_0": 5.0},
    )


def _sobolev_data(G=5, P=32, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((G, 1)).astype(np.float32)
    x = rng.standard_normal((G, P, 1)).astype(np.float32)
    u = rng.standard_normal((G, P, 1)).astype(np.float32)
    ju = rng.standard_normal((G, P, 1, 1)).astype(np.float32)
    return t, x, u, ju


def test_grouped_sobolev_trainer_decreases_loss():
    """GroupedTrainer with target_jac trains the tutorial-8 Sobolev loss
    (value + jacobian MSE) and records the Sobolev path choice."""
    model = _sobolev_model()
    rng = np.random.default_rng(1)
    G, P = 8, 64
    t = np.linspace(-1, 1, G).reshape(G, 1).astype(np.float32)
    x = rng.uniform(-1, 1, (G, P, 1)).astype(np.float32)
    u = np.sin(2.0 * x[..., 0] + t)[..., None].astype(np.float32)
    ju = (2.0 * np.cos(2.0 * x[..., 0] + t))[..., None, None].astype(
        np.float32)
    trainer = GroupedTrainer(model, optax.adam(2e-3), w_jac=0.1)
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, t, x, u, target_jac=ju, epochs=60,
                        group_batch=G, point_batch=P)
    assert trainer.history["loss"][-1] < trainer.history["loss"][0] * 0.7
    assert trainer.history["sobolev_path"] in ("fused", "xla")
    assert "path" not in trainer.history  # MSE mode never ran


def test_grouped_sobolev_tail_loss_exact():
    """Padded tail batches in Sobolev mode: the per-point weight threads
    through BOTH loss terms, so the epoch loss equals the direct full-set
    Sobolev total (sgd(0.0) keeps params frozen)."""
    model = _sobolev_model()
    t, x, u, ju = _sobolev_data()
    trainer = GroupedTrainer(model, optax.sgd(0.0), w_value=1.0, w_jac=0.3)
    state = trainer.init(jax.random.key(0))
    state = trainer.fit(state, t, x, u, target_jac=ju, epochs=1,
                        group_batch=2, point_batch=x.shape[1])
    assert state.step == 3  # 2 + 2 + padded tail of 1
    direct, _terms, _g = model.sobolev_value_and_grad(
        state.params, t, x, u, target_jac=ju, w_value=1.0, w_jac=0.3)
    assert trainer.history["loss"][-1] == pytest.approx(float(direct),
                                                        rel=1e-5)


def test_mesh_grouped_sobolev_matches_single_device():
    """Sobolev training under a data mesh (target_jac sharded through
    shard_map) matches the single-device loss trajectory."""
    mesh = make_mesh()
    model = _sobolev_model()
    t, x, u, ju = _sobolev_data(G=16, P=40, seed=2)

    tr_mesh = GroupedTrainer(model, optax.adam(1e-3), mesh=mesh,
                             w_jac=0.2, seed=5)
    st_m = tr_mesh.init(jax.random.key(0))
    st_m = tr_mesh.fit(st_m, t, x, u, target_jac=ju, epochs=3,
                       group_batch=16, point_batch=40)

    tr_one = GroupedTrainer(model, optax.adam(1e-3), w_jac=0.2, seed=5)
    st_1 = tr_one.init(jax.random.key(0))
    st_1 = tr_one.fit(st_1, t, x, u, target_jac=ju, epochs=3,
                      group_batch=16, point_batch=40)
    np.testing.assert_allclose(tr_mesh.history["loss"],
                               tr_one.history["loss"], rtol=1e-4, atol=1e-6)


def test_fit_resident_sobolev_smoke():
    """Device-resident (scan-chained) training accepts target_jac: the
    Sobolev loss runs inside the scanned step with point subsampling."""
    model = _sobolev_model()
    t, x, u, ju = _sobolev_data(G=4, P=64, seed=3)
    trainer = GroupedTrainer(model, optax.adam(2e-3), w_jac=0.1)
    state = trainer.init(jax.random.key(0))
    state = trainer.fit_resident(state, t, x, u, target_jac=ju, epochs=6,
                                 group_batch=4, point_batch=32)
    assert np.isfinite(trainer.history["loss"][-1])
    assert trainer.history["sobolev_path"] in ("fused", "xla")


def test_sobolev_path_info_reports_reason_off_tpu():
    """sobolev_path_info mirrors fast_path_info for the Sobolev kernels:
    on CPU the path is 'xla' with an explanatory reason."""
    model = _sobolev_model()
    info = model.sobolev_path_info(256, 1)
    assert info["path"] == "xla"
    assert info["reason"]
    # plain NIF generates a vanilla chain too; off-TPU it also reports xla
    plain = nif_tpu.NIF(CFG_S, CFG_P)
    info2 = plain.sobolev_path_info(256, 1)
    assert info2["path"] == "xla"
    assert info2["reason"]
    # an unsupported P yields a config reason, not the backend one
    info3 = model.sobolev_path_info(257, 1)
    assert info3["path"] == "xla"
    assert "257" in info3["reason"]


def test_evaluate_sobolev_matches_loss_terms():
    """evaluate_sobolev: chunked (padded) global per-term metrics equal
    the training loss's terms dict on the full set."""
    model = _sobolev_model()
    t, x, u, ju = _sobolev_data()
    trainer = GroupedTrainer(model, optax.adam(1e-3), w_value=1.0,
                             w_jac=0.3)
    state = trainer.init(jax.random.key(0))
    _total, terms, _g = model.sobolev_value_and_grad(
        state.params, t, x, u, target_jac=ju, w_value=1.0, w_jac=0.3,
        use_reg=False)
    m = trainer.evaluate_sobolev(state, t, x, u, ju, group_batch=2)
    assert m["value_mse"] == pytest.approx(float(terms["value_mse"]),
                                           rel=1e-5)
    assert m["jacobian_mse"] == pytest.approx(float(terms["jacobian_mse"]),
                                              rel=1e-5)
    assert m["total"] == pytest.approx(
        m["value_mse"] + 0.3 * m["jacobian_mse"], rel=1e-6)


def test_evaluate_sobolev_with_hessian_targets():
    """evaluate_sobolev(target_hess=...) (round 5): the second-order
    metric equals the training loss's hessian term, rides its own cached
    chunk fn, and folds w_hess into total. si=1 so the hess target is
    trivially symmetric."""
    model = _sobolev_model()
    t, x, u, ju = _sobolev_data()
    rng = np.random.default_rng(7)
    hu = rng.standard_normal(ju.shape + (1,)).astype(np.float32)
    trainer = GroupedTrainer(model, optax.adam(1e-3), w_value=1.0,
                             w_jac=0.3, w_hess=0.05)
    state = trainer.init(jax.random.key(0))
    _total, terms, _g = model.sobolev_value_and_grad(
        state.params, t, x, u, target_jac=ju, target_hess=hu,
        w_value=1.0, w_jac=0.3, w_hess=0.05, use_reg=False)
    m = trainer.evaluate_sobolev(state, t, x, u, ju, group_batch=2,
                                 target_hess=hu)
    assert m["value_mse"] == pytest.approx(float(terms["value_mse"]),
                                           rel=1e-5)
    assert m["jacobian_mse"] == pytest.approx(float(terms["jacobian_mse"]),
                                              rel=1e-5)
    assert m["hessian_mse"] == pytest.approx(float(terms["hessian_mse"]),
                                             rel=1e-5)
    assert m["total"] == pytest.approx(
        m["value_mse"] + 0.3 * m["jacobian_mse"] + 0.05 * m["hessian_mse"],
        rel=1e-6)
    # first-order path still uses its own cached chunk (no cross-pollution)
    m1 = trainer.evaluate_sobolev(state, t, x, u, ju, group_batch=2)
    assert "hessian_mse" not in m1
    assert hasattr(trainer, "_sobolev_eval_chunk")
    assert hasattr(trainer, "_sobolev_eval_chunk_hess")


def test_step_accepts_list_inputs_and_resident_cache_keys_on_dataset_size():
    """Review fixes: step coerces non-array batches; fit_resident's chunk
    cache keys on (G, P) so a second different-sized dataset gets its own
    compiled chunk (the old key reused a closure over the old G)."""
    model = _sobolev_model()
    trainer = GroupedTrainer(model, optax.adam(1e-3))
    state = trainer.init(jax.random.key(0))
    t = [[0.1], [0.2]]
    x = [[[0.3]] * 4, [[0.4]] * 4]
    u = [[[0.5]] * 4, [[0.6]] * 4]
    state, loss = trainer.step(state, t, x, u)
    assert np.isfinite(float(loss))

    t1, x1, u1, _ = _sobolev_data(G=4, P=32, seed=0)
    t2, x2, u2, _ = _sobolev_data(G=8, P=32, seed=1)
    tr = GroupedTrainer(model, optax.adam(1e-3))
    st = tr.init(jax.random.key(1))
    st = tr.fit_resident(st, t1, x1, u1, epochs=2, group_batch=4,
                         point_batch=32)
    st = tr.fit_resident(st, t2, x2, u2, epochs=2, group_batch=4,
                         point_batch=32)
    keys = list(tr._resident_cache)
    assert len(keys) == 2 and keys[0][1:3] == (4, 32) \
        and keys[1][1:3] == (8, 32)
