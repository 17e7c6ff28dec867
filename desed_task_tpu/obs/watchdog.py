"""Device-stall watchdog: detect a wedged device fetch and poke it loose.

The reference has no failure-detection subsystem at all (SURVEY §5 — crash
recovery is manual ``--resume_from_checkpoint``).  This goes further: a
daemon thread watches a per-step heartbeat from the training loop and, when
no step completes within ``timeout_s``, launches a tiny independent device
probe in a subprocess.  On the tunneled-TPU backend this is the documented
recovery for a wedged relay (a second process issuing any device call
unblocks the first — observed and applied manually in the round-3 300-epoch
rehearsal, docs/scale_run.md); on healthy backends the probe is harmless.

The watchdog is armed only while train steps are being issued (the loop
disarms it around validation/test phases, whose device work has no regular
heartbeat).  All stall events are counted and timed so runs can report
``stalls``/``stalled_seconds`` alongside their step-time telemetry.
"""

from __future__ import annotations

import subprocess
import sys
import threading
import time
from typing import Optional

_PROBE_SNIPPET = (
    "import jax, jax.numpy as jnp; "
    "print(float(jnp.sum(jnp.ones((128, 128)))))"
)


def _default_enabled() -> bool:
    """Auto-enable on real accelerators only; CPU runs cannot wedge."""
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - jax always importable here
        return False


class StallWatchdog:
    """Heartbeat monitor with a subprocess device probe as the unwedger.

    Usage::

        wd = StallWatchdog(timeout_s=180)
        wd.start()
        wd.arm()
        for batch in batches:
            ...  # step + per-step sync
            wd.beat()
        wd.disarm()
        wd.stop()

    ``probe_cmd`` is the argv of the probe subprocess (default: this Python
    running a 128x128 device matmul).  Tests inject a stub command.
    """

    def __init__(
        self,
        timeout_s: float = 180.0,
        probe_interval_s: float = 60.0,
        probe_timeout_s: float = 150.0,
        probe_cmd: Optional[list] = None,
        enabled: Optional[bool] = None,
        check_interval_s: float = 5.0,
    ):
        self.timeout_s = timeout_s
        self.probe_interval_s = probe_interval_s
        self.probe_timeout_s = probe_timeout_s
        self.probe_cmd = probe_cmd or [sys.executable, "-c", _PROBE_SNIPPET]
        self.enabled = _default_enabled() if enabled is None else enabled
        self.check_interval_s = check_interval_s
        self.stalls = 0
        self.stalled_seconds = 0.0
        self.probes_launched = 0
        self._armed = False
        self._last_beat = time.monotonic()
        self._stall_started: Optional[float] = None
        self._last_probe = 0.0
        self._stop_evt = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    # -- loop-facing API ---------------------------------------------------
    def start(self):
        if not self.enabled or self._thread is not None:
            return self
        self._stop_evt.clear()
        self._thread = threading.Thread(
            target=self._watch, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._stop_evt.set()
        if self._thread is not None:
            # the thread may be blocked in a probe wait; give it a moment,
            # but never block shutdown on a hung probe (daemon thread)
            self._thread.join(timeout=max(self.check_interval_s * 3, 2.0))
            self._thread = None

    def arm(self):
        with self._lock:
            self._last_beat = time.monotonic()
            self._armed = True

    def disarm(self):
        with self._lock:
            self._armed = False
            self._note_recovered_locked()

    def beat(self):
        with self._lock:
            self._last_beat = time.monotonic()
            self._note_recovered_locked()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def stats(self) -> dict:
        return {
            "stalls": self.stalls,
            "stalled_seconds": round(self.stalled_seconds, 3),
            "probes_launched": self.probes_launched,
        }

    # -- internals ---------------------------------------------------------
    def _note_recovered_locked(self):
        if self._stall_started is not None:
            self.stalled_seconds += time.monotonic() - self._stall_started
            self._stall_started = None

    def _watch(self):
        while not self._stop_evt.wait(self.check_interval_s):
            with self._lock:
                armed = self._armed
                waited = time.monotonic() - self._last_beat
                stalled = self._stall_started is not None
            if not armed or waited < self.timeout_s:
                continue
            now = time.monotonic()
            if not stalled:
                with self._lock:
                    self._stall_started = now
                    self.stalls += 1
                print(
                    f"[watchdog] no step heartbeat for {waited:.0f}s - "
                    "launching device probe to unwedge",
                    flush=True,
                )
            if now - self._last_probe >= self.probe_interval_s:
                self._last_probe = now
                self._probe()

    def _probe(self):
        self.probes_launched += 1
        try:
            proc = subprocess.Popen(
                self.probe_cmd,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        except OSError as e:  # probe binary missing — report, keep watching
            print(f"[watchdog] probe launch failed: {e}", flush=True)
            return
        try:
            proc.wait(timeout=self.probe_timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()  # exact-pid kill of our own child only
            proc.wait()
