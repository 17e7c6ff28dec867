"""Profiling helpers (SURVEY.md §5: the reference has no profiler at all,
only startup MAC counting).

- `trace(log_dir)`: context manager around jax.profiler.trace — produces an
  xplane trace viewable in TensorBoard / Perfetto.
- `StepTimer`: cheap per-step wall-clock stats with device synchronization
  via a host fetch (block_until_ready is unreliable on tunneled backends).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.times: list[float] = []
        self._t0 = None
        self._steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        return self

    def step(self, sync_value=None):
        """Call once per train step; pass a device scalar to force sync at
        the sync cadence."""
        self._steps += 1
        if self._steps % self.sync_every == 0 and sync_value is not None:
            float(jax.device_get(sync_value))
            now = time.perf_counter()
            self.times.append((now - self._t0) / self._steps)
            self._t0 = now
            self._steps = 0

    @property
    def stats(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.median(arr)),
            "step_time_last_s": float(arr[-1]),
        }
