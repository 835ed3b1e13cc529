"""Grouped-layout training: the TPU-first fast path as a user-facing loop.

Point-wise training (``Trainer``) matches the reference's semantics exactly
but pays the hypernetwork cost per point. When the data is snapshot-
structured — P coordinate points share each (t, mu), the overwhelmingly
common case — ``GroupedTrainer`` trains on the ``[G, P, ...]`` layout where
the ShapeNet runs as batched MXU matmuls through the fused Pallas kernel.

Batching strategy: each step takes a batch of whole groups and a subsample
of points within each group (fresh random subsample per step, which is the
grouped analog of point-wise minibatch shuffling).
"""
from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import batch_axis_size, put_batch_tuple, put_replicated
from .evaluation import local_params
from .trainer import TrainState

__all__ = ["GroupedTrainer"]


class GroupedTrainer:
    """Trainer over the grouped layout (t: [G, pi], x: [G, P, si], u: [G, P, so]).

    Usage::

        t, x, u = demo_dataset.as_grouped()
        trainer = GroupedTrainer(model, optax.adam(1e-3))
        state = trainer.init(jax.random.key(0))
        state = trainer.fit(state, t, x, u, epochs=100,
                            group_batch=16, point_batch=4096)
    """

    def __init__(self, model, optimizer: optax.GradientTransformation,
                 mesh=None, use_reg: bool = True, seed: int = 0,
                 fused: Optional[bool] = None,
                 shard_model_axis: bool = False,
                 w_value: float = 1.0, w_jac: float = 1.0,
                 w_hess: float = 1.0):
        """``fused=None`` (auto) uses the single-pass fused train kernel on
        TPU via ``model.mse_value_and_grad`` — forward + loss + backward in
        one pallas_call.

        ``shard_model_axis=True`` (mesh with a ``'model'`` axis) shards the
        hypernetwork head kernel + its moments row-parallel over 'model'
        (tensor parallelism for huge po_dim). The shard_map around the
        fused kernel then goes manual over the batch axes ONLY, leaving
        the model axis to GSPMD — the head matmul's partial-sum reduce is
        inserted automatically, and the kernel sees the full weight
        vector per data shard.

        Sobolev training (tutorial-8 semantics — match derivatives, not
        just values): pass ``target_jac [G, P, so, si]`` to ``fit`` /
        ``fit_resident`` / ``step`` and the loss becomes
        ``w_value*value_mse + w_jac*jacobian_mse`` through
        ``model.sobolev_value_and_grad`` (ONE fused Pallas pass on TPU,
        reference nif/layers/gradient.py:207-231 at scale). Second-order
        targets (``target_hess [G, P, so, si, si]``, HessianLayer
        semantics, reference nif/layers/gradient.py:234-261) add
        ``+ w_hess*hessian_mse``."""
        self.model = model
        self.tx = optimizer
        self.mesh = mesh
        self.use_reg = use_reg
        self.w_value = w_value
        self.w_jac = w_jac
        self.w_hess = w_hess
        self.shard_model_axis = shard_model_axis
        if shard_model_axis and (mesh is None or "model" not in mesh.axis_names):
            raise ValueError(
                "shard_model_axis=True needs a mesh with a 'model' axis — "
                "e.g. make_mesh(axis_names=('data', 'model'), "
                "mesh_shape=(n_data, n_model))"
            )
        self._rng = np.random.default_rng(seed)
        self.history: Dict[str, List[float]] = {"epoch": [], "loss": []}

        def local_vag(params, t, x, u, w, rw, ju, hu):
            if ju is None and hu is None:
                return model.mse_value_and_grad(
                    params, t, x, u, weight=w, fused=fused, use_reg=use_reg,
                    reg_weight=rw,
                )
            total, _terms, grads = model.sobolev_value_and_grad(
                params, t, x, u, target_jac=ju, target_hess=hu,
                w_value=self.w_value, w_jac=self.w_jac, w_hess=self.w_hess,
                weight=w, fused=fused, use_reg=use_reg,
                reg_weight=rw,
            )
            return total, grads

        def value_and_grad(params, t, x, u, w, rw, ju=None, hu=None):
            if mesh is None:
                return local_vag(params, t, x, u, w, rw, ju, hu)
            # Pallas kernels are opaque to GSPMD: under a mesh the fused
            # train kernel must run per-shard via shard_map, with the
            # gradient/loss mean over the data axis as explicit pmeans
            # (the collectives ride ICI). The scaled pad weights (MSE) and
            # reg row weights carry a *global* n_target/n_real scale, so
            # per-shard means + pmean recover the exact global means.
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import batch_axes

            # Reduce over exactly the axes the batch shards over (one
            # source of truth with put_batch/batch_axis_size) — a mesh
            # with arbitrary axis names must still get its pmean.
            axes = batch_axes(mesh)
            batch_spec = P(axes)

            def local(params, t, x, u, w, rw, ju, hu):
                loss, grads = local_vag(params, t, x, u, w, rw, ju, hu)
                for ax in axes:
                    loss = jax.lax.pmean(loss, ax)
                    grads = jax.lax.pmean(grads, ax)
                return loss, grads

            # shard_map in_specs can't take None pytrees for absent
            # optionals — pass only the present ones positionally.
            present = [a for a in (w, rw, ju, hu) if a is not None]
            flags = (w is not None, rw is not None, ju is not None,
                     hu is not None)

            def fn(p, t_, x_, u_, *opt):
                it = iter(opt)
                w_ = next(it) if flags[0] else None
                rw_ = next(it) if flags[1] else None
                ju_ = next(it) if flags[2] else None
                hu_ = next(it) if flags[3] else None
                return local(p, t_, x_, u_, w_, rw_, ju_, hu_)

            in_specs = (P(), batch_spec, batch_spec, batch_spec) + tuple(
                batch_spec for _ in present
            )
            kwargs = {}
            if set(axes) != set(mesh.axis_names):
                # go manual over the batch axes ONLY; non-batch axes
                # (e.g. a tensor-parallel 'model' axis) stay under GSPMD,
                # which inserts the head matmul's partial-sum reduce
                kwargs["axis_names"] = set(axes)
            return jax.shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
                # pallas_call out_shapes carry no varying-mesh-axis
                # info; the pmeans above make the outputs replicated.
                check_vma=False, **kwargs,
            )(params, t, x, u, *present)

        self._value_and_grad = value_and_grad

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, t, x, u, w=None, rw=None, ju=None,
                 hu=None):
            loss, grads = value_and_grad(state.params, t, x, u, w, rw, ju,
                                         hu)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._step = step

    def _record_path(self, P: int, si: int = None,
                     sobolev: bool = False, hess: bool = False) -> None:
        """Record (once per mode) which compute path P-point group batches
        take — ``history["path"]``/``history["path_reason"]`` for MSE
        steps, ``history["sobolev_path"]``/``..._reason`` for Sobolev
        steps — and let the model emit its one-time fused/fallback log.
        Round-2 review: the ~6-8x (MSE) / ~3x (Sobolev) XLA fallback must
        be observable from the trainer; the two kernels have different
        support rules, so a mixed-mode trainer records both."""
        key = "sobolev_path" if sobolev else "path"
        if key in self.history:
            return
        if sobolev:
            info = self.model.sobolev_path_info(P, si, hess=hess)
            self.model._announce_sobolev_path(P, si, hess=hess)
        else:
            info = self.model.fast_path_info(P)
            self.model._announce_path(P)
        self.history[key] = info["path"]
        if info["reason"]:
            self.history[key + "_reason"] = info["reason"]

    def step(self, state: TrainState, t, x, u, w=None, rw=None,
             target_jac=None, target_hess=None):
        """One jitted training step on a (t, x, u[, w]) group batch —
        for custom loops (e.g. streaming from GroupedDataset). Batches
        already placed on device (``data.prefetch_to_device``) pass
        through without a host round-trip. ``target_jac [Gb, Pb, so, si]``
        switches the step to the Sobolev loss; ``target_hess
        [Gb, Pb, so, si, si]`` adds the second-order term."""
        if not hasattr(x, "shape"):  # lists/tuples: coerce once, on host
            t, x, u = np.asarray(t), np.asarray(x), np.asarray(u)
        self._record_path(x.shape[1], x.shape[2],
                          target_jac is not None or target_hess is not None,
                          hess=target_hess is not None)
        return self._step(
            state, *self._put(t, x, u, w, rw, target_jac, target_hess))

    def init(self, key) -> TrainState:
        params = self.model.init(key)
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            # place BOTH trees explicitly: checkpoint templates take their
            # shardings from here, and a restore re-places committed
            # host arrays onto them (single-device opt_state next to
            # replicated params would poison the jitted step)
            if self.shard_model_axis:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import (
                    moment_follows_head,
                    put_global,
                    put_params_model_parallel,
                )

                params = put_params_model_parallel(params, self.mesh)
                try:
                    head = tuple(params["pnet"]["last"]["w"].shape)
                except (KeyError, TypeError):
                    head = None
                n_model = self.mesh.shape.get("model", 1)

                def place(leaf):
                    spec = (P("model", None)  # moments follow the kernel
                            if moment_follows_head(leaf, head, n_model)
                            else P())
                    # process-safe (multi-host TP is first-class — r4)
                    return put_global(leaf, NamedSharding(self.mesh, spec))

                opt_state = jax.tree_util.tree_map(place, opt_state)
            else:
                params = put_replicated(params, self.mesh)
                opt_state = put_replicated(opt_state, self.mesh)
        return TrainState(params, opt_state, 0)

    def init_or_restore(self, key, ckpt_dir: str) -> TrainState:
        """Resumable init (same semantics as ``Trainer.init_or_restore``)."""
        from .trainer import restore_or_init_state

        return restore_or_init_state(self, key, ckpt_dir)

    def _put(self, *arrays):
        return put_batch_tuple(arrays, self.mesh)

    def _residual_probs(self, state, t, x, u, alpha, mix):
        """Per-point sampling distribution proportional to the current
        squared residual (mixed with uniform for coverage): [G, P].

        Evaluated in group chunks (~4M points each) so refreshing the
        distribution never needs more device memory than a training step —
        the feature targets datasets far larger than one forward pass.
        """
        G, P = x.shape[0], x.shape[1]
        chunk = max(1, 4_000_000 // max(P, 1))
        r = np.empty((G, P), np.float64)
        for s in range(0, G, chunk):
            sl = slice(s, min(s + chunk, G))
            pred = self.model.apply_grouped(
                state.params, jnp.asarray(t[sl]), jnp.asarray(x[sl])
            )
            r[sl] = np.asarray(
                jnp.mean(
                    jnp.square(pred - jnp.asarray(u[sl], pred.dtype)), axis=-1
                ),
                np.float64,
            )
        r = np.maximum(r, 0.0) ** alpha
        rs = r.sum(axis=1, keepdims=True)
        P = r.shape[1]
        prop = np.where(rs > 0, r / np.maximum(rs, 1e-300), 1.0 / P)
        return mix / P + (1.0 - mix) * prop

    def residual_probs(self, state, t, x, u, alpha: float = 1.0,
                       mix: float = 0.5) -> np.ndarray:
        """Public form of the residual sampling distribution — the
        ``point_sampler`` hook for STREAMED residual sampling (round-4
        review item 6): score each loaded shard window against the current
        params and let ``GroupedDataset.iter_batches(point_sampler=...)``
        hard-point-sample within it. See ``fit(point_sampling="residual")``
        for the in-memory form and the objective caveat."""
        return self._residual_probs(state, np.asarray(t), np.asarray(x),
                                    np.asarray(u), alpha, mix)

    @staticmethod
    def _gumbel_topk(probs: np.ndarray, k: int, rng) -> np.ndarray:
        """Vectorized without-replacement sampling: per-row top-k of
        log p + Gumbel noise (one Gumbel-max draw per kept point)."""
        g = rng.gumbel(size=probs.shape)
        keys = np.log(np.maximum(probs, 1e-300)) + g
        return np.argpartition(-keys, k - 1, axis=1)[:, :k]

    def fit(
        self,
        state: TrainState,
        t: np.ndarray,
        x: np.ndarray,
        u: np.ndarray,
        sample_weight: Optional[np.ndarray] = None,
        target_jac: Optional[np.ndarray] = None,
        target_hess: Optional[np.ndarray] = None,
        epochs: int = 1,
        group_batch: Optional[int] = None,
        point_batch: Optional[int] = None,
        callbacks: Sequence = (),
        verbose_every: int = 0,
        point_sampling: str = "uniform",
        resample_every: int = 10,
        residual_alpha: float = 1.0,
        residual_mix: float = 0.5,
        validation_data=None,
        validation_every: int = 1,
    ) -> TrainState:
        """``point_sampling="residual"`` (opt-in, beyond the reference)
        subsamples points proportionally to the current squared residual
        (refreshed every ``resample_every`` epochs, mixed
        ``residual_mix``-uniform for coverage) — hard-point mining for
        localized features; cf. NTK-guided implicit neural teaching
        (arXiv:2511.15487). Note this optimizes a residual-reweighted
        objective; final metrics should be evaluated on the full set.

        ``target_jac [G, P, so, si]`` switches every step to the Sobolev
        loss (``w_value``/``w_jac`` from the constructor); ``target_hess
        [G, P, so, si, si]`` adds the ``w_hess`` second-order term. The
        residual sampling distribution stays value-MSE-based.
        """
        G, P = x.shape[0], x.shape[1]
        group_batch = min(group_batch or G, G)
        point_batch = min(point_batch or P, P)
        # Mesh divisibility + tail handling on the GROUP axis: round the
        # group batch up and pad short batches with zero-weight copies so
        # no snapshot is silently dropped (see trainer.pad_batch).
        n_div = 1 if self.mesh is None else batch_axis_size(self.mesh)
        group_batch += (-group_batch) % n_div
        needs_pad = (G % group_batch != 0) or sample_weight is not None
        from .trainer import pad_batch, reg_row_weights

        if point_sampling not in ("uniform", "residual"):
            raise ValueError(f"unknown point_sampling {point_sampling!r}")
        probs = None
        self._record_path(point_batch, x.shape[2],
                          target_jac is not None or target_hess is not None,
                          hess=target_hess is not None)

        for cb in callbacks:
            cb.on_train_begin(self)
        for epoch in range(epochs):
            t0 = time.perf_counter()
            if point_sampling == "residual" and epoch % resample_every == 0:
                probs = self._residual_probs(
                    state, t, x, u, residual_alpha, residual_mix
                )
            g_order = self._rng.permutation(G)
            losses, sizes = [], []
            for s in range(0, G, group_batch):
                gsel = g_order[s : s + group_batch]
                b = len(gsel)
                if probs is None:
                    psel = self._rng.choice(P, size=point_batch, replace=False)
                    w = (
                        None
                        if sample_weight is None
                        else sample_weight[gsel][:, psel]
                    )
                    bt, bx, bu = t[gsel], x[gsel][:, psel], u[gsel][:, psel]
                    bju = (None if target_jac is None
                           else target_jac[gsel][:, psel])
                    bhu = (None if target_hess is None
                           else target_hess[gsel][:, psel])
                else:
                    # per-group hard-point subsample: [b, point_batch]
                    psel = self._gumbel_topk(probs[gsel], point_batch,
                                             self._rng)
                    rows = gsel[:, None]
                    w = (
                        None
                        if sample_weight is None
                        else sample_weight[rows, psel]
                    )
                    bt, bx, bu = t[gsel], x[rows, psel], u[rows, psel]
                    bju = (None if target_jac is None
                           else target_jac[rows, psel])
                    bhu = (None if target_hess is None
                           else target_hess[rows, psel])
                rw = None
                if needs_pad:
                    # per-group weights: scale/zero whole rows of [Gb, Pb]
                    opts = [a for a in (bju, bhu) if a is not None]
                    arrs = (bt, bx, bu) + tuple(opts)
                    arrs, w_rows = pad_batch(arrs, None, b, group_batch)
                    bt, bx, bu = arrs[:3]
                    it = iter(arrs[3:])
                    if bju is not None:
                        bju = next(it)
                    if bhu is not None:
                        bhu = next(it)
                    w_full = (
                        np.broadcast_to(w_rows[:, None],
                                        (group_batch, point_batch))
                        if w is None
                        else np.concatenate(
                            [w, np.zeros((group_batch - b, point_batch),
                                         w.dtype)]
                        ) * w_rows[:, None]
                    )
                    w = np.ascontiguousarray(w_full, dtype=np.float32)
                    if self.use_reg:
                        rw = reg_row_weights(b, group_batch)
                bt, bx, bu, bw, brw, bju, bhu = self._put(
                    bt, bx, bu, w, rw, bju, bhu)
                state, loss = self._step(state, bt, bx, bu, bw, brw, bju,
                                         bhu)
                losses.append(loss)
                sizes.append(b)
            epoch_loss = (
                float(np.average(jax.device_get(losses), weights=sizes))
                if losses else float("nan")
            )
            self.history["epoch"].append(epoch)
            self.history["loss"].append(epoch_loss)
            logs = {"loss": epoch_loss, "epoch": epoch,
                    "time": time.perf_counter() - t0}
            if validation_data is not None and epoch % validation_every == 0:
                vt, vx, vu = validation_data
                logs["val_loss"] = self.evaluate(state, vt, vx, vu)
                self.history.setdefault("val_loss", []).append(logs["val_loss"])
                self.history.setdefault("val_epoch", []).append(epoch)
            if verbose_every and epoch % verbose_every == 0:
                print(f"epoch {epoch:5d}  loss {epoch_loss:.6e}  ({logs['time']:.3f}s)")
            for cb in callbacks:
                cb.on_epoch_end(self, state, epoch, logs)
        for cb in callbacks:
            cb.on_train_end(self, state)
        return state

    def _eval_sums(self, state: TrainState, t, x, u, sample_weight=None,
                   group_batch: Optional[int] = None):
        """LOCAL (sse, sst, n_el) accumulated in fixed-shape group chunks.

        One jitted executable (tails pad with zero-weight filler); under a
        single-process mesh the chunk shards over the batch axes and XLA
        inserts the cross-device psum for the sums. Multi-process callers
        reduce the returned partial sums with
        :func:`nif_tpu.training.evaluation.global_sums`.
        """
        t, x, u = np.asarray(t), np.asarray(x), np.asarray(u)
        G, P = x.shape[0], x.shape[1]
        gb = min(group_batch or max(1, 4_000_000 // max(P, 1)), G)
        use_mesh = self.mesh is not None and jax.process_count() == 1
        # multi-controller: host-local jit needs host-local params
        params = (state.params if use_mesh or self.mesh is None
                  else local_params(state.params))
        if use_mesh:
            gb += (-gb) % batch_axis_size(self.mesh)

        chunk_sums = getattr(self, "_eval_chunk_sums", None)
        if chunk_sums is None:
            # see evaluate_sobolev: pallas_call is not GSPMD-partitionable,
            # so >1-device mesh'd eval chunks pin the XLA forward path
            fused = (None if (self.mesh is None or not use_mesh
                              or self.mesh.size == 1) else False)

            @jax.jit
            def chunk_sums(params, tc, xc, uc, w, m):
                pred = self.model.apply_grouped(params, tc, xc, fused=fused)
                uc = uc.astype(pred.dtype)
                err = jnp.square(pred - uc) * w[..., None].astype(pred.dtype)
                sse = jnp.sum(err.astype(jnp.float32))
                sst = jnp.sum(
                    (jnp.square(uc) * m[..., None].astype(uc.dtype))
                    .astype(jnp.float32)
                )
                return sse, sst

            self._eval_chunk_sums = chunk_sums

        sse = sst = 0.0
        for s in range(0, G, gb):
            sl = slice(s, min(s + gb, G))
            bt, bx, bu = t[sl], x[sl], u[sl]
            b = bt.shape[0]
            w = (np.ones((b, P), np.float32) if sample_weight is None
                 else np.asarray(sample_weight[sl], np.float32))
            m = np.ones((b, P), np.float32)
            if b < gb:  # zero-weight pad keeps one executable shape
                pad = gb - b
                bt = np.concatenate(
                    [bt, np.broadcast_to(bt[:1], (pad,) + bt.shape[1:])])
                bx = np.concatenate(
                    [bx, np.broadcast_to(bx[:1], (pad,) + bx.shape[1:])])
                bu = np.concatenate(
                    [bu, np.broadcast_to(bu[:1], (pad,) + bu.shape[1:])])
                w = np.concatenate([w, np.zeros((pad, P), np.float32)])
                m = np.concatenate([m, np.zeros((pad, P), np.float32)])
            if use_mesh:
                bt, bx, bu, w, m = self._put(bt, bx, bu, w, m)
            cs, ct = chunk_sums(params, bt, bx, bu, w, m)
            sse += float(cs)
            sst += float(ct)
        return sse, sst, float(G * P * u.shape[-1])

    def fit_resident(
        self,
        state: TrainState,
        t: np.ndarray,
        x: np.ndarray,
        u: np.ndarray,
        sample_weight: Optional[np.ndarray] = None,
        target_jac: Optional[np.ndarray] = None,
        target_hess: Optional[np.ndarray] = None,
        epochs: int = 1,
        group_batch: Optional[int] = None,
        point_batch: Optional[int] = None,
        callbacks: Sequence = (),
        verbose_every: int = 0,
        seed: Optional[int] = None,
        validation_data=None,
        validation_every: int = 1,
        point_sampling: str = "uniform",
        resample_every: int = 10,
        residual_alpha: float = 1.0,
        residual_mix: float = 0.5,
    ) -> TrainState:
        """Device-resident training: stage the WHOLE grouped dataset on
        the device/mesh once and subsample group/point batches ON device
        inside the jitted step — zero per-step host-to-device traffic.

        This is the TPU-first layout for datasets that fit in HBM (e.g.
        the 16.7M-point paper workload is ~250 MB): ``fit`` moves the
        subsampled batch across PCIe/relay every step, which can dominate
        the ~ms step itself. Sampling differences vs ``fit``: points are
        drawn iid WITH replacement (an unbiased SGD subsample; avoids a
        [G, P] top-k per step), groups without replacement via a fresh
        permutation prefix. Under a mesh, t/x/u shard over the group axis
        and the gather stays shard-local.

        ``point_sampling="residual"`` (VERDICT r3 item 8 — feature parity
        with ``fit``): points draw from a per-point categorical
        proportional to the current squared residual (mixed
        ``residual_mix``-uniform, exponent ``residual_alpha``), sampled ON
        device inside the scanned step from a resident ``[G, P]`` logits
        array refreshed every ``resample_every`` epochs. Like ``fit``'s
        variant this optimizes a residual-reweighted objective; evaluate
        final metrics on the full set.
        """
        t, x, u = np.asarray(t), np.asarray(x), np.asarray(u)
        G, P = x.shape[0], x.shape[1]
        group_batch = min(group_batch or G, G)
        point_batch = min(point_batch or P, P)
        n_div = 1 if self.mesh is None else batch_axis_size(self.mesh)
        if G % n_div:
            raise ValueError(
                f"fit_resident: G={G} groups must divide the mesh batch "
                f"axes ({n_div}) — the dataset itself is sharded over them"
            )
        if point_sampling not in ("uniform", "residual"):
            raise ValueError(f"unknown point_sampling {point_sampling!r}")
        residual = point_sampling == "residual"
        group_batch += (-group_batch) % n_div
        group_batch = min(group_batch, G)
        self._record_path(point_batch, x.shape[2],
                          target_jac is not None or target_hess is not None,
                          hess=target_hess is not None)

        td, xd, ud, wd, jud, hud = self._put(
            t, x, u, sample_weight, target_jac, target_hess)
        steps_per_epoch = max(G // group_batch, 1)

        def refresh_logits(state):
            # host-chunked residual pass (shared with fit), then resident
            # placement sharded like the data — refreshes are infrequent
            # (every resample_every epochs), steps stay all-device
            probs = self._residual_probs(state, t, x, u, residual_alpha,
                                         residual_mix)
            lg = np.log(np.maximum(probs, 1e-300)).astype(np.float32)
            return self._put(lg)[0]

        def step_body(state: TrainState, key, td, xd, ud, wd, jud, hud,
                      lgd):
            kg, kp = jax.random.split(key)
            if group_batch < G:
                gsel = jax.random.permutation(kg, G)[:group_batch]
                tb = jnp.take(td, gsel, axis=0)
                xg = jnp.take(xd, gsel, axis=0)
                ug = jnp.take(ud, gsel, axis=0)
                wg = None if wd is None else jnp.take(wd, gsel, axis=0)
                jg = None if jud is None else jnp.take(jud, gsel, axis=0)
                hg = None if hud is None else jnp.take(hud, gsel, axis=0)
                lgg = None if lgd is None else jnp.take(lgd, gsel, axis=0)
            else:
                tb, xg, ug, wg, jg, hg, lgg = td, xd, ud, wd, jud, hud, lgd
            if point_batch < P or lgg is not None:
                if lgg is None:
                    idx = jax.random.randint(
                        kp, (group_batch, point_batch), 0, P
                    )
                else:
                    # categorical per group row proportional to residual^a
                    idx = jax.random.categorical(
                        kp, lgg, shape=(point_batch, group_batch)
                    ).T
                xb = jnp.take_along_axis(xg, idx[..., None], axis=1)
                ub = jnp.take_along_axis(ug, idx[..., None], axis=1)
                wb = (None if wg is None
                      else jnp.take_along_axis(wg, idx, axis=1))
                jb = (None if jg is None
                      else jnp.take_along_axis(jg, idx[..., None, None],
                                               axis=1))
                hb = (None if hg is None
                      else jnp.take_along_axis(
                          hg, idx[..., None, None, None], axis=1))
            else:
                xb, ub, wb, jb, hb = xg, ug, wg, jg, hg
            loss, grads = self._value_and_grad(
                state.params, tb, xb, ub, wb, None, jb, hb
            )
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        def get_chunk_fn(n_steps: int):
            # G/P belong in the key: step_body closes over them (sampling
            # bounds), so a same-batch-shape call on a different-sized
            # dataset must not reuse the compiled chunk.
            key_cache = ("_resident_chunk", G, P, group_batch, point_batch,
                         wd is not None, jud is not None, hud is not None,
                         residual, n_steps)
            fn = getattr(self, "_resident_cache", {}).get(key_cache)
            if fn is None:
                # Steps are scan-chained ON DEVICE: dispatching one jitted
                # step per Python iteration pays the host/relay round-trip
                # every step (~100 ms over the axon relay vs the ~1 ms step
                # itself — the round-3 paper run spent 98% of wall-clock on
                # dispatch). One dispatch now covers a whole chunk of
                # epochs; per-step keys are folded from the root inside the
                # scan, so the sampled batches are IDENTICAL to the
                # step-at-a-time schedule.
                has_w, has_j = wd is not None, jud is not None
                has_h = hud is not None

                @functools.partial(jax.jit, donate_argnums=(0,))
                def fn(state: TrainState, root, start, td, xd, ud, *opt):
                    it = iter(opt)
                    wd_ = next(it) if has_w else None
                    jud_ = next(it) if has_j else None
                    hud_ = next(it) if has_h else None
                    lgd_ = next(it) if residual else None

                    def body(c, i):
                        return step_body(c, jax.random.fold_in(root, i),
                                         td, xd, ud, wd_, jud_, hud_, lgd_)
                    return jax.lax.scan(
                        body, state, start + jnp.arange(n_steps)
                    )

                self.__dict__.setdefault("_resident_cache", {})[key_cache] = fn
            return fn

        # Chunk boundaries align with every host-side obligation: callbacks
        # need end-of-epoch state (chunk = 1 epoch), validation needs state
        # at its cadence (chunks end exactly on validation epochs), residual
        # refresh needs state every resample_every epochs, and the cap
        # bounds compiled scan length + per-chunk loss readback.
        chunk_cap = max(1, min(epochs, -(-4096 // steps_per_epoch)))
        if callbacks:
            chunk_cap = 1
        if residual:
            chunk_cap = min(chunk_cap, max(1, resample_every))

        base = self._rng.integers(2**63) if seed is None else seed
        root = jax.random.key(base)
        for cb in callbacks:
            cb.on_train_begin(self)
        step_i = 0
        epoch = 0
        lgd = None
        while epoch < epochs:
            n_ep = min(chunk_cap, epochs - epoch)
            if validation_data is not None:
                nv = epoch + (-epoch) % validation_every
                if nv < epoch + n_ep:
                    n_ep = nv - epoch + 1
            if residual:
                if epoch % resample_every == 0 or lgd is None:
                    lgd = refresh_logits(state)
                # chunks must not cross a refresh boundary
                nr = epoch + (-epoch) % resample_every
                if nr == epoch:
                    nr += resample_every
                n_ep = min(n_ep, nr - epoch)
            t0 = time.perf_counter()
            run = get_chunk_fn(n_ep * steps_per_epoch)
            args = (state, root, step_i, td, xd, ud) + tuple(
                a for a in (wd, jud, hud) if a is not None
            ) + ((lgd,) if residual else ())
            state, losses = run(*args)
            losses = np.asarray(
                jax.device_get(losses), np.float64
            ).reshape(n_ep, steps_per_epoch)
            dt = (time.perf_counter() - t0) / n_ep
            step_i += n_ep * steps_per_epoch
            for j in range(n_ep):
                e = epoch + j
                epoch_loss = float(losses[j].mean())
                self.history["epoch"].append(e)
                self.history["loss"].append(epoch_loss)
                logs = {"loss": epoch_loss, "epoch": e, "time": dt}
                if (validation_data is not None and j == n_ep - 1
                        and e % validation_every == 0):
                    vt, vx, vu = validation_data
                    logs["val_loss"] = self.evaluate(state, vt, vx, vu)
                    self.history.setdefault("val_loss", []).append(
                        logs["val_loss"])
                    self.history.setdefault("val_epoch", []).append(e)
                if verbose_every and e % verbose_every == 0:
                    print(f"epoch {e:5d}  loss {epoch_loss:.6e}  "
                          f"({dt:.3f}s)")
                for cb in callbacks:
                    cb.on_epoch_end(self, state, e, logs)
            epoch += n_ep
        for cb in callbacks:
            cb.on_train_end(self, state)
        return state

    def evaluate(self, state: TrainState, t, x, u, sample_weight=None,
                 group_batch: Optional[int] = None) -> float:
        """GLOBAL mean (weighted) MSE over the full grouped dataset —
        identical on every process of a multi-host run (partial sums are
        allgather-reduced; every process must call this in lockstep)."""
        from .evaluation import global_sums

        sse, _sst, n_el = self._eval_sums(state, t, x, u, sample_weight,
                                          group_batch)
        sse, n_el = global_sums(sse, n_el)
        return sse / max(n_el, 1.0)

    def evaluate_metrics(self, state: TrainState, t, x, u,
                         sample_weight=None,
                         group_batch: Optional[int] = None) -> Dict[str, float]:
        """Global ``{"mse", "rel_l2"}`` — the north-star metrics, computable
        on a striped multi-host dataset (round-2 review item 3)."""
        from .evaluation import global_sums, metrics_from_sums

        sse, sst, n_el = self._eval_sums(state, t, x, u, sample_weight,
                                         group_batch)
        sse, sst, n_el = global_sums(sse, sst, n_el)
        return metrics_from_sums(sse, sst, n_el)

    def evaluate_sobolev(self, state: TrainState, t, x, u, target_jac,
                         sample_weight=None,
                         group_batch: Optional[int] = None,
                         target_hess=None) -> Dict[str, float]:
        """Global ``{"value_mse", "jacobian_mse", "total"}`` on the full
        grouped dataset — the per-term monitoring the reference surfaces
        as Keras metrics in Sobolev training (nif/layers/gradient.py use
        in tutorial 8). Evaluated in fixed-size group chunks through the
        fused (y, dy/dx) kernel on TPU; ``total`` combines the terms with
        the trainer's ``w_value``/``w_jac``. ``target_hess
        [G, P, so, si, si]`` adds a ``"hessian_mse"`` term (and its
        ``w_hess`` share of ``total``), evaluated through the fused
        forward-over-forward kernel (``shapenet_fwd_hess``) on TPU —
        evaluation needs no VJP, so second-order metrics run at kernel
        speed even though second-order TRAINING rides its own fused
        train kernel. Multi-host collective like :meth:`evaluate`
        (partial sums allgather-reduced)."""
        from .evaluation import global_sums

        t, x = np.asarray(t), np.asarray(x)
        u, ju = np.asarray(u), np.asarray(target_jac)
        hu = None if target_hess is None else np.asarray(target_hess)
        G, P = x.shape[0], x.shape[1]
        # same default chunking as _eval_sums: never a full-dataset pass
        gb = min(group_batch or max(1, 4_000_000 // max(P, 1)), G)
        # Multi-host: each process evaluates its own stripe host-locally
        # (no mesh staging — that would make every chunk a collective and
        # double-count the sums); only the final scalars reduce globally.
        use_mesh = self.mesh is not None and jax.process_count() == 1
        if use_mesh:
            from ..parallel import batch_axis_size

            gb += (-gb) % batch_axis_size(self.mesh)
        params = (state.params if use_mesh or self.mesh is None
                  else local_params(state.params))

        cache_key = ("_sobolev_eval_chunk" if hu is None
                     else "_sobolev_eval_chunk_hess")
        chunk = getattr(self, cache_key, None)
        if chunk is None:
            from ..ops.derivatives import (
                output_and_jacobian_grouped,
                output_jacobian_hessian_grouped,
            )

            # GSPMD cannot partition a pallas_call: on a >1-device mesh
            # the eval chunk pins the XLA derivative path (the fused
            # kernels' mesh story is shard_map, used by step/fit_resident);
            # single-chip (or host-local multi-controller) keeps the
            # kernel auto-routing.
            fused = (None if (self.mesh is None or not use_mesh
                              or self.mesh.size == 1) else False)

            if hu is None:
                @jax.jit
                def chunk(params, tc, xc, uc, jc, w):
                    y, jac = output_and_jacobian_grouped(
                        self.model, params, tc, xc, fused=fused)
                    ey = jnp.square(y.astype(jnp.float32)
                                    - uc.astype(jnp.float32))
                    ej = jnp.square(jac.astype(jnp.float32)
                                    - jc.astype(jnp.float32))
                    w32 = w.astype(jnp.float32)
                    return (jnp.sum(ey * w32[..., None]),
                            jnp.sum(ej * w32[..., None, None]))
            else:
                @jax.jit
                def chunk(params, tc, xc, uc, jc, hc, w):
                    y, jac, hess = output_jacobian_hessian_grouped(
                        self.model, params, tc, xc, fused=fused)
                    ey = jnp.square(y.astype(jnp.float32)
                                    - uc.astype(jnp.float32))
                    ej = jnp.square(jac.astype(jnp.float32)
                                    - jc.astype(jnp.float32))
                    eh = jnp.square(hess.astype(jnp.float32)
                                    - hc.astype(jnp.float32))
                    w32 = w.astype(jnp.float32)
                    return (jnp.sum(ey * w32[..., None]),
                            jnp.sum(ej * w32[..., None, None]),
                            jnp.sum(eh * w32[..., None, None, None]))

            setattr(self, cache_key, chunk)

        se_y = se_j = se_h = 0.0
        for s in range(0, G, gb):
            sl = slice(s, min(s + gb, G))
            bt, bx, bu, bj = t[sl], x[sl], u[sl], ju[sl]
            bh = None if hu is None else hu[sl]
            b = bt.shape[0]
            w = (np.ones((b, P), np.float32) if sample_weight is None
                 else np.asarray(sample_weight[sl], np.float32))
            if b < gb:  # zero-weight pad keeps one executable shape
                pad = gb - b
                rep = lambda a: np.concatenate(
                    [a, np.broadcast_to(a[:1], (pad,) + a.shape[1:])])
                bt, bx, bu, bj = rep(bt), rep(bx), rep(bu), rep(bj)
                bh = None if bh is None else rep(bh)
                w = np.concatenate([w, np.zeros((pad, P), np.float32)])
            batch = ((bt, bx, bu, bj, w) if bh is None
                     else (bt, bx, bu, bj, bh, w))
            if use_mesh:
                batch = self._put(*batch)
            sums = chunk(params, *batch)
            se_y += float(sums[0])
            se_j += float(sums[1])
            if hu is not None:
                se_h += float(sums[2])
        n_y = float(G * P * u.shape[-1])
        n_j = float(G * P * ju.shape[-2] * ju.shape[-1])
        se_y, se_j, n_y, n_j = global_sums(se_y, se_j, n_y, n_j)
        value_mse = se_y / max(n_y, 1.0)
        jac_mse = se_j / max(n_j, 1.0)
        out = {"value_mse": value_mse, "jacobian_mse": jac_mse,
               "total": self.w_value * value_mse + self.w_jac * jac_mse}
        if hu is not None:
            n_h = float(G * P * hu.shape[-3] * hu.shape[-2] * hu.shape[-1])
            se_h, n_h = global_sums(se_h, n_h)
            hess_mse = se_h / max(n_h, 1.0)
            out["hessian_mse"] = hess_mse
            out["total"] += self.w_hess * hess_mse
        return out
