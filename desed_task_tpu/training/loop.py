"""Generic training loop: epochs, validation cadence, checkpointing,
early stopping — the engine under every recipe entry point.

Replaces the pl.Trainer wiring of the reference (train_pretrained.py:560-581:
EarlyStopping + ModelCheckpoint on val/obj_metric, validation every N epochs,
gradient accumulation) with an explicit loop around the jitted mean-teacher
step. Host-side data feeding overlaps device execution naturally through
JAX's async dispatch; batches are device_put with the mesh sharding up front.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from ..obs.checkpoint import CheckpointManager
from ..obs.energy import EnergyTracker
from ..obs.logging import MetricsLogger
from ..obs.watchdog import StallWatchdog
from ..parallel import shard_batch


class TrainLoop:
    def __init__(
        self,
        step_fn: Callable,  # (state, batch, rng) -> (state, metrics)
        state,
        batcher,  # data.MultiSourceBatcher
        n_epochs: int,
        logger: MetricsLogger,
        ckpt: Optional[CheckpointManager] = None,
        validate_fn: Optional[Callable] = None,  # (state, epoch) -> (obj, scalars)
        validation_interval: int = 10,
        early_stop_patience: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
        log_every: int = 50,
        energy: Optional[EnergyTracker] = None,
        accumulate_batches: int = 1,
        index_cache=None,  # data.device_cache.DeviceResidentData (uploaded)
        watchdog: Optional[StallWatchdog] = None,
        checkpoint_interval: Optional[int] = None,
    ):
        self.step_fn = step_fn
        self.state = state
        self.batcher = batcher
        self.n_epochs = n_epochs
        self.logger = logger
        self.ckpt = ckpt
        self.validate_fn = validate_fn
        self.validation_interval = validation_interval
        self.early_stop_patience = early_stop_patience
        self.rng = rng if rng is not None else jax.random.key(0)
        self.mesh = mesh
        self.log_every = log_every
        self.energy = energy
        self.accumulate_batches = accumulate_batches
        self.index_cache = index_cache
        self.watchdog = watchdog
        # "last"-checkpoint cadence in epochs. None = validation cadence
        # (matching the reference's ModelCheckpoint, which only fires on
        # validation, train_pretrained.py:560-581), or every epoch when not
        # validating. A full orbax save costs seconds through the tunneled
        # TPU (state fetch + atomic rewrite), which dominates sub-second
        # device-cached epochs if done unconditionally.
        self.checkpoint_interval = checkpoint_interval
        self.best_obj = -np.inf
        self.epochs_since_best = 0
        self.start_epoch = 0

    def _put(self, batch, batch_axis: int = 0):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh, batch_axis=batch_axis)
        return jax.device_put(batch)

    def _batches(self):
        """Yield step batches: raw batcher batches, or — with gradient
        accumulation — groups of `accumulate_batches` consecutive batches
        stacked on a new leading axis. The incomplete tail group is dropped,
        matching the reference's epoch length
        `len(ds) // (batch_size * accumulate_batches)`
        (train_pretrained.py:457-466)."""
        if self.index_cache is not None:
            # device-resident data: steps consume int32 store-row vectors
            # (~240 bytes/step through the interconnect instead of ~85 MB)
            import jax.numpy as jnp

            if self.accumulate_batches <= 1:
                for idx in self.batcher.epoch_indices():
                    yield jnp.asarray(self.index_cache.flat_index(idx))
                return
            group = []
            for idx in self.batcher.epoch_indices():
                group.append(self.index_cache.flat_index(idx))
                if len(group) == self.accumulate_batches:
                    yield jnp.asarray(np.stack(group))
                    group = []
            return
        if self.accumulate_batches <= 1:
            for batch in self.batcher.epoch():
                yield self._put(batch)
            return
        group = []
        for batch in self.batcher.epoch():
            group.append(batch)
            if len(group) == self.accumulate_batches:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs, 0), *group
                )
                group = []
                yield self._put(stacked, batch_axis=1)

    def resume(self, name: str = "last"):
        """Restore state + loop counters from a checkpoint if present."""
        if self.ckpt is not None and self.ckpt.exists(name):
            self.state = self.ckpt.restore(name, template=self.state)
            meta = self.ckpt.metadata(name)
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.best_obj = float(meta.get("best_obj", -np.inf))
            return True
        return False

    def run(self):
        if self.energy:
            self.energy.start()
        wd = self.watchdog
        if wd is not None:
            wd.start()
        step_count = 0
        for epoch in range(self.start_epoch, self.n_epochs):
            t0 = time.monotonic()
            metrics = {}
            step_busy = 0.0
            if wd is not None:
                # armed only while steps are issued: validation/test device
                # work has no regular heartbeat and must not trip the probe
                wd.arm()
            for batch in self._batches():
                ts = time.monotonic()
                self.state, metrics = self.step_fn(self.state, batch, self.rng)
                step_count += 1
                if step_count % self.log_every == 0:
                    host = {f"train/{k}": float(v) for k, v in metrics.items()}
                    self.logger.log_scalars(step_count, host)
                else:
                    # bound async dispatch runahead: one scalar fetch per
                    # step (~1 ms) keeps the host from enqueueing unbounded
                    # in-flight executions/transfers on fast devices.
                    # (Note: the tunneled-TPU client additionally retains a
                    # host mirror per transferred batch regardless of syncs
                    # or .delete() — for multi-hour runs on that backend,
                    # restart the process periodically via checkpoint
                    # resume; see docs/performance.md.)
                    float(next(iter(metrics.values())))
                # the per-step sync above makes dispatch->fetch bracket the
                # device execution, so this window (NOT the whole epoch,
                # which includes host data stalls) is the device-busy bound
                step_busy += time.monotonic() - ts
                if wd is not None:
                    wd.beat()
            if wd is not None:
                wd.disarm()
            dt = time.monotonic() - t0
            if self.energy:
                self.energy.record_busy(step_busy)
            steps = max(self.batcher.steps_per_epoch // self.accumulate_batches, 1)
            self.logger.log_scalars(
                step_count,
                {
                    "train/epoch": epoch,
                    "train/epoch_seconds": dt,
                    "train/steps_per_sec": steps / dt,
                },
            )

            is_val_epoch = (epoch + 1) % self.validation_interval == 0
            stop = False
            if self.validate_fn is not None and is_val_epoch:
                obj, scalars = self.validate_fn(self.state, epoch)
                scalars = dict(scalars)
                scalars["val/obj_metric"] = obj
                self.logger.log_scalars(step_count, scalars)
                if self.ckpt is not None:
                    self.ckpt.save_if_best(
                        self.state, obj, {"epoch": epoch, "best_obj": float(obj)}
                    )
                if obj > self.best_obj:
                    self.best_obj = obj
                    self.epochs_since_best = 0
                else:
                    self.epochs_since_best += self.validation_interval
                stop = (
                    self.early_stop_patience is not None
                    and self.epochs_since_best >= self.early_stop_patience
                )
            k = self.checkpoint_interval
            if k is None:
                k = self.validation_interval if self.validate_fn else 1
            if self.ckpt is not None and (
                (epoch + 1) % k == 0 or epoch == self.n_epochs - 1 or stop
            ):
                self.ckpt.save(
                    self.state,
                    {"epoch": epoch, "best_obj": float(self.best_obj)},
                    name="last",
                )
            if stop:
                break
        if self.energy:
            kwh = self.energy.stop()
            self.logger.log_scalars(step_count, {"train/energy_kwh_estimate": kwh})
        if wd is not None:
            wd.stop()
            if wd.stalls:
                self.logger.log_scalars(
                    step_count,
                    {f"train/watchdog_{k}": float(v)
                     for k, v in wd.stats().items()},
                )
        return self.state
