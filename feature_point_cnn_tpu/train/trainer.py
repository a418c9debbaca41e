"""Training driver: epoch loop, data-parallel dispatch, checkpoint/resume,
metrics — the TPU-native counterpart of
`/root/reference/python/src/basetrainer.py` + `trainwrapper.py` +
`magicpointtrainer.py` + `superpointtrainer.py`.

Differences by design:

* the whole inner step (labels, augmentation, forward, loss, update) is ONE
  jitted XLA program with donated state — no AMP scaler, no host-side
  augmentation workers;
* data parallelism over a `jax.sharding.Mesh` (batch sharded, state
  replicated); the same code path drives 1 chip or a slice;
* orbax step-indexed checkpoints with auto-resume
  (`basetrainer.py:229-236`), MagicPoint -> SuperPoint partial-restore
  hand-off (`superpointtrainer.py:15-20`).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import numpy as np

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.data.datasets import BatchLoader
from feature_point_cnn_tpu.models.superpoint import init_superpoint
from feature_point_cnn_tpu.parallel.mesh import (
    make_mesh,
    replicate_state,
    shard_batch,
)
from feature_point_cnn_tpu.train import steps as S
from feature_point_cnn_tpu.train.optimizer import make_optimizer
from feature_point_cnn_tpu.utils import checkpoint as ckpt
from feature_point_cnn_tpu.utils.summary import MetricWriter


class Trainer:
    """Phase-agnostic trainer; ``phase`` is ``"magicpoint"`` or
    ``"superpoint"``."""

    def __init__(
        self,
        config: SuperPointConfig,
        phase: str,
        train_loader: BatchLoader,
        test_loader: Optional[BatchLoader],
        checkpoint_dir: str,
        magicpoint_checkpoint_dir: Optional[str] = None,
        homo_config: HomographyConfig = HomographyConfig(),
        seed: int = 0,
        n_devices: Optional[int] = None,
        write_statistics: bool = True,
        log_every: int = 50,
        snapshot_path: Optional[str] = None,
    ):
        assert phase in ("magicpoint", "superpoint"), phase
        self.config = config
        self.phase = phase
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.homo_config = homo_config
        self.base_key = jax.random.PRNGKey(seed)
        self.log_every = log_every
        self.snapshot_path = snapshot_path

        self.mesh = make_mesh(n_devices, batch_size=train_loader.batch_size)
        self.model, variables = init_superpoint(
            jax.random.fold_in(self.base_key, 17), config
        )
        frozen = "descriptor" if phase == "magicpoint" else None
        total_steps = len(train_loader) * config.epochs
        from feature_point_cnn_tpu.train.optimizer import make_schedule

        self._schedule = make_schedule(config, total_steps)
        self.tx = make_optimizer(
            config, variables["params"], frozen_subtree=frozen,
            total_steps=total_steps,
        )
        state = S.create_train_state(variables, self.tx)

        # resume / phase hand-off
        self.manager = ckpt.checkpoint_manager(checkpoint_dir)
        self.start_epoch = 0
        try:
            restored_epoch, state = ckpt.restore_latest(self.manager, state)
        except Exception as e:
            # optimizer-layout changes make old opt_states structurally
            # unrestorable; salvage params/batch_stats and restart the
            # optimizer instead of refusing to resume
            restored_epoch, raw = ckpt.restore_latest_raw(self.manager)
            if restored_epoch is None:
                raise
            state = state.replace(
                params=raw["params"], batch_stats=raw["batch_stats"]
            )
            print(
                f"[trainer] WARNING: checkpoint opt_state layout mismatch "
                f"({type(e).__name__}); restored params/stats only, fresh "
                f"optimizer"
            )
        if restored_epoch is not None:
            self.start_epoch = restored_epoch + 1
            print(f"[trainer] resumed epoch {restored_epoch} from {checkpoint_dir}")
        elif phase == "superpoint" and magicpoint_checkpoint_dir:
            if str(magicpoint_checkpoint_dir).endswith(".npz"):
                # portable snapshot graft: the committed `.npz` is the only
                # artifact that survives an environment reset (the orbax dir
                # is gitignored), so `--magic-point-weights X.npz` must work
                from feature_point_cnn_tpu.utils import weights as wsnap

                mp_epoch, mp_raw = 0, wsnap.load_weights(
                    magicpoint_checkpoint_dir
                )
            else:
                mp_manager = ckpt.checkpoint_manager(magicpoint_checkpoint_dir)
                # raw restore: the MagicPoint optimizer state (frozen
                # descriptor) has a different structure than ours; only
                # params/stats matter
                mp_epoch, mp_raw = ckpt.restore_latest_raw(mp_manager)
            if mp_epoch is not None:
                params, stats = ckpt.graft_pretrained(
                    state.params, state.batch_stats,
                    mp_raw["params"], mp_raw["batch_stats"],
                )
                state = state.replace(params=params, batch_stats=stats)
                print(
                    f"[trainer] grafted MagicPoint weights (epoch {mp_epoch}) "
                    f"from {magicpoint_checkpoint_dir}; descriptor head fresh"
                )
            else:
                print("[trainer] WARNING: no MagicPoint checkpoint found")

        self.state = replicate_state(state, self.mesh)
        self.writer = MetricWriter(
            f"{checkpoint_dir}/runs" if write_statistics else None
        )
        self._graph_written = False

        if phase == "magicpoint":
            train_fn = functools.partial(
                S.magicpoint_train_step, model=self.model, tx=self.tx, config=config
            )
            eval_fn = functools.partial(
                S.magicpoint_eval_step, model=self.model, config=config
            )
        else:
            train_fn = functools.partial(
                S.superpoint_train_step,
                model=self.model, tx=self.tx, config=config, homo_config=homo_config,
            )
            eval_fn = functools.partial(
                S.superpoint_eval_step,
                model=self.model, config=config, homo_config=homo_config,
            )
        from feature_point_cnn_tpu.data.device_store import DeviceBatchLoader

        self._fused_loader = isinstance(train_loader, DeviceBatchLoader)
        if self._fused_loader:
            # fuse the batch gather INTO the jitted step: one dispatch and
            # one XLA program per step instead of two serialized device
            # executions (profiler-measured: the standalone gather cost
            # ~10 ms/step at batch 64 against a 16 ms train step)
            from feature_point_cnn_tpu.parallel.mesh import batch_sharding

            gather = train_loader.gather_fn()
            bshard = batch_sharding(self.mesh)

            def fused_fn(state, images, points, counts, idx, key):
                batch = gather(images, points, counts, idx)
                batch = jax.lax.with_sharding_constraint(
                    batch, {k: bshard for k in batch}
                )
                return train_fn(state, batch, key)

            self._train_step = jax.jit(fused_fn, donate_argnums=(0,))

            # chain k steps per dispatch (config.train_steps_per_call):
            # `lax.scan` over stacked per-step (idx, key) pairs with the
            # HBM-resident arrays closed over as scan-invariants — one
            # host->device dispatch and one metrics fetch per k optimizer
            # steps instead of per step.  Metrics come back stacked (k,...)
            def scanned_fn(state, images, points, counts, idxs, keys):
                def body(st, x):
                    idx, key = x
                    return fused_fn(st, images, points, counts, idx, key)

                return jax.lax.scan(body, state, (idxs, keys))

            self._train_scan = jax.jit(scanned_fn, donate_argnums=(0,))
        else:
            self._train_step = jax.jit(train_fn, donate_argnums=(0,))
            self._train_scan = None
        self._eval_step = jax.jit(eval_fn)
        self._prob_fn = jax.jit(
            lambda params, stats, img: self.model.apply(
                {"params": params, "batch_stats": stats}, img, train=False,
                enable_descriptor=False,
            )[0]
        )

    # ------------------------------------------------------------------

    def _write_model_graph(self, step_args) -> None:
        """Model-graph summary at train start — the reference writes the
        torch graph via `add_graph` (`basetrainer.py:53-59`); the TPU-native
        analog is (a) the flax module table (layers, shapes, param counts)
        and (b) the jitted train step's lowered StableHLO, the program XLA
        actually compiles."""
        if self._graph_written:
            return
        self._graph_written = True
        import jax.numpy as jnp

        h, w = self.config.train_image_size
        img = jnp.zeros((1, h, w, self.config.image_channels), jnp.float32)
        table = self.model.tabulate(
            jax.random.PRNGKey(0), img, train=False,
            console_kwargs={"width": 120, "force_terminal": False},
        )
        self.writer.text(f"model/{self.phase}_table", table)
        hlo = self._train_step.lower(*step_args).as_text()
        self.writer.text(f"model/{self.phase}_train_step_stablehlo", hlo)

    def _write_param_histograms(self, step: int) -> None:
        """Parameter histograms, BN excluded (`basetrainer.py:265-274`)."""
        import numpy as np

        flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "bn" in name.lower():
                continue
            self.writer.histogram(f"params/{name}", np.asarray(leaf), step)

    def _write_image_summary(self, batch, step: int) -> None:
        """Keypoint-overlay image summary (pred red / label green), the
        equivalent of `basetrainer.py:76-94,276-283`."""
        import numpy as np

        from feature_point_cnn_tpu.ops.detection import extract_keypoints
        from feature_point_cnn_tpu.ops.labels import make_points_labels_batch, make_prob_map_from_labels
        from feature_point_cnn_tpu.utils.summary import keypoint_overlay

        img = S._prep_images(jax.numpy.asarray(batch["image"][:1]), self.config)
        prob = self._prob_fn(self.state.params, self.state.batch_stats, img)
        kp = extract_keypoints(prob, self.config)
        v = np.asarray(kp.valid[0])
        pred = np.stack(
            [np.asarray(kp.y[0])[v], np.asarray(kp.x[0])[v]], -1
        )
        labels = make_points_labels_batch(
            jax.numpy.asarray(batch["points"][:1]),
            jax.numpy.asarray(batch["points_valid"][:1]),
            self._key(999, step), img.shape[1], img.shape[2], self.config.cell,
        )
        true_prob = make_prob_map_from_labels(labels, self.config.cell)
        tkp = extract_keypoints(true_prob, self.config.replace(confidence_thresh=0.5))
        tv = np.asarray(tkp.valid[0])
        true = np.stack(
            [np.asarray(tkp.y[0])[tv], np.asarray(tkp.x[0])[tv]], -1
        )
        vis = keypoint_overlay(np.asarray(img[0]), pred, true)
        self.writer.image(f"detector/{self.phase}", vis, step)

    def _key(self, tag: int, index: int) -> jax.Array:
        return jax.random.fold_in(jax.random.fold_in(self.base_key, tag), index)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        import os

        from feature_point_cnn_tpu.utils import profiling

        logged = []
        t0 = time.time()
        # FPC_PROFILE_DIR=<dir> captures a device trace of steps 5-15 of the
        # first epoch (post-compile), viewable in TensorBoard / Perfetto.
        trace_window = profiling.StepTraceWindow(
            os.environ.get("FPC_PROFILE_DIR", "") if epoch == 0 else ""
        )
        iterator = (
            self.train_loader.epoch_index_arrays(epoch)
            if self._fused_loader
            else self.train_loader.epoch(epoch)
        )
        k_scan = getattr(self.config, "train_steps_per_call", 1)
        if self._fused_loader and self._train_scan is not None and k_scan > 1:
            out = self._train_epoch_scanned(
                epoch, k_scan, iterator, trace_window, t0
            )
            trace_window.close()
            return out
        for i, item in enumerate(iterator):
            trace_window.tick(i)
            if self._fused_loader:
                L = self.train_loader
                step_args = (
                    self.state, L.images, L.points, L.counts, item,
                    self._key(epoch, i),
                )
            else:
                batch = shard_batch(item, self.mesh)
                step_args = (self.state, batch, self._key(epoch, i))
            if not self._graph_written and self.writer._dir is not None:
                try:  # summaries must never kill training
                    self._write_model_graph(step_args)
                except Exception as e:
                    self._graph_written = True
                    print(f"[trainer] model-graph summary failed: {e}")
            with profiling.annotate(f"{self.phase}_train_step"):
                self.state, metrics = self._train_step(*step_args)
            # fetch metrics (a device sync) only at logging points
            if (i + 1) % self.log_every == 0 or i == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logged.append(m)
                step = int(self.state.step)
                m["lr"] = (
                    float(self._schedule(step))
                    if callable(self._schedule) else float(self._schedule)
                )
                for k, v in m.items():
                    self.writer.scalar(f"train/{k}", v, step)
                if (i + 1) % (self.log_every * 4) == 0:
                    try:
                        batch = (
                            self.train_loader.materialize(item)
                            if self._fused_loader else batch
                        )
                        self._write_image_summary(batch, step)
                        self._write_param_histograms(step)
                    except Exception as e:  # summaries must never kill training
                        print(f"[trainer] summary failed: {e}")
                rate = (i + 1) * self.train_loader.batch_size / (time.time() - t0)
                print(
                    f"[{self.phase}] epoch {epoch} step {i + 1}/"
                    f"{len(self.train_loader)} loss {m['loss']:.4f} "
                    f"({rate:.1f} img/s)"
                )
        trace_window.close()
        if not logged:
            return {}
        return {
            k: float(np.mean([m[k] for m in logged])) for k in logged[0]
        }

    def _train_epoch_scanned(
        self, epoch: int, k: int, iterator, trace_window, t0
    ) -> Dict[str, float]:
        """Epoch loop at `train_steps_per_call` granularity: k optimizer
        steps run inside ONE jitted `lax.scan` dispatch (device-resident
        data only).  Through a network relay each dispatch + metrics fetch
        round trip is tens of ms — at k=1 that overhead is paid per step;
        here it amortizes k-fold.  A tail of fewer than k index arrays
        falls back to the single-step program (already compiled)."""
        import jax.numpy as jnp

        from feature_point_cnn_tpu.utils import profiling

        L = self.train_loader
        logged = []
        import time

        pending_i, pending_keys = [], []
        steps_done = 0
        n_total = len(L)

        def log_from(metrics, sub=None):
            # metrics either per-step dict or stacked (k,...) from scan
            take = (lambda v: v[sub]) if sub is not None else (lambda v: v)
            m = {key: float(take(v)) for key, v in metrics.items()}
            logged.append(m)
            step = int(self.state.step)
            m["lr"] = (
                float(self._schedule(step))
                if callable(self._schedule) else float(self._schedule)
            )
            for key, v in m.items():
                self.writer.scalar(f"train/{key}", v, step)
            rate = steps_done * L.batch_size / (time.time() - t0)
            print(
                f"[{self.phase}] epoch {epoch} step {steps_done}/{n_total} "
                f"loss {m['loss']:.4f} ({rate:.1f} img/s)"
            )

        def flush():
            nonlocal steps_done
            if not pending_i:
                return
            if len(pending_i) == k:
                idxs = jnp.stack(pending_i)
                keys = jnp.stack(pending_keys)
                with profiling.annotate(f"{self.phase}_train_scan"):
                    self.state, metrics = self._train_scan(
                        self.state, L.images, L.points, L.counts, idxs, keys
                    )
                steps_done += k
                if steps_done % self.log_every < k or steps_done == k:
                    log_from(metrics, sub=-1)
            else:  # tail: single-step program
                for idx, key in zip(pending_i, pending_keys):
                    self.state, metrics = self._train_step(
                        self.state, L.images, L.points, L.counts, idx, key
                    )
                    steps_done += 1
                log_from(metrics)
            pending_i.clear()
            pending_keys.clear()

        for i, item in enumerate(iterator):
            trace_window.tick(i)
            pending_i.append(item)
            pending_keys.append(self._key(epoch, i))
            if len(pending_i) == k:
                flush()
        flush()
        if not logged:
            return {}
        import numpy as np

        return {
            key: float(np.mean([m[key] for m in logged])) for key in logged[0]
        }

    def evaluate(self, epoch: int) -> Dict[str, float]:
        if self.test_loader is None:
            return {}
        sums: Dict[str, float] = {}
        n = 0
        # Cap eval items per epoch like the reference's test-split cap —
        # which applies ONLY to the SuperPoint phase
        # (`superpointtrainer.py:11` limits its test split to 1000 items);
        # the reference's MagicPoint eval runs the full synthetic test split,
        # so the cap is not applied for that phase.
        max_batches = 0
        if self.config.eval_max_items and self.phase == "superpoint":
            max_batches = -(-self.config.eval_max_items // self.config.batch_size)
        for i, batch in enumerate(self.test_loader.epoch(0)):
            if max_batches and i >= max_batches:
                break
            batch = shard_batch(batch, self.mesh)
            metrics = self._eval_step(self.state, batch, self._key(10_000 + epoch, i))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        out = {k: v / max(n, 1) for k, v in sums.items()}
        for k, v in out.items():
            self.writer.scalar(f"test/{k}", v, epoch)
        return out

    def save(self, epoch: int) -> None:
        host_state = jax.device_get(self.state)
        ckpt.save_state(self.manager, epoch, host_state)
        if self.snapshot_path:
            # portable, git-committable single-file snapshot refreshed every
            # epoch — environment resets destroy orbax checkpoint dirs, so a
            # snapshot inside the repo is the durable artifact (RESULTS.md
            # "Artifact persistence")
            from feature_point_cnn_tpu.utils.weights import save_weights

            save_weights(
                self.snapshot_path,
                {
                    "params": host_state.params,
                    "batch_stats": host_state.batch_stats,
                },
            )

    def train(self, epochs: Optional[int] = None) -> None:
        """Train up to ``epochs`` TOTAL epochs (counting restored ones) —
        re-running the same command after an interruption converges on the
        same total, matching the reference's resume semantics
        (`basetrainer.py:229-236`)."""
        epochs = epochs or self.config.epochs
        end = max(self.start_epoch, epochs)
        if end == self.start_epoch:
            print(
                f"[trainer] nothing to do: resumed epoch {self.start_epoch - 1}"
                f" >= target {epochs}"
            )
        for epoch in range(self.start_epoch, end):
            print(f"=== {self.phase} epoch {epoch} ===")
            self.train_epoch(epoch)
            test = self.evaluate(epoch)
            if test:
                print(
                    f"[{self.phase}] epoch {epoch} test "
                    + " ".join(f"{k}={v:.4f}" for k, v in test.items())
                )
            self.save(epoch)
        self.writer.close()
