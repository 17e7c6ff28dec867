"""StallWatchdog: heartbeat-gap detection + subprocess probe + loop wiring.

The reference has no failure-detection subsystem (SURVEY §5); this covers the
rebuild's automated recovery for the documented tunneled-TPU wedge
(docs/scale_run.md: a second process issuing a device call unblocks a stalled
fetch in the first).
"""

import sys
import time

from desed_task_tpu.obs.logging import MetricsLogger
from desed_task_tpu.obs.watchdog import StallWatchdog
from desed_task_tpu.training.loop import TrainLoop


def _stub_probe(tmp_path):
    marker = tmp_path / "probe_ran"
    return marker, [
        sys.executable,
        "-c",
        f"open({str(marker)!r}, 'a').write('x')",
    ]


def _wait_for(predicate, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.02)
    return predicate()


def test_stall_detected_and_probe_launched(tmp_path):
    marker, cmd = _stub_probe(tmp_path)
    wd = StallWatchdog(
        timeout_s=0.15,
        probe_interval_s=0.1,
        check_interval_s=0.03,
        probe_cmd=cmd,
        enabled=True,
    )
    wd.start()
    wd.arm()
    try:
        assert _wait_for(lambda: wd.stalls >= 1 and marker.exists())
        assert wd.probes_launched >= 1
        wd.beat()  # recovery: the stall window closes and is accounted
        assert wd.stats()["stalled_seconds"] > 0
    finally:
        wd.stop()


def test_no_stall_while_beating(tmp_path):
    marker, cmd = _stub_probe(tmp_path)
    wd = StallWatchdog(
        timeout_s=0.3, check_interval_s=0.03, probe_cmd=cmd, enabled=True
    )
    wd.start()
    wd.arm()
    try:
        for _ in range(10):
            time.sleep(0.05)
            wd.beat()
        assert wd.stalls == 0
        assert not marker.exists()
    finally:
        wd.stop()


def test_disarmed_gaps_do_not_trip(tmp_path):
    marker, cmd = _stub_probe(tmp_path)
    wd = StallWatchdog(
        timeout_s=0.1, check_interval_s=0.03, probe_cmd=cmd, enabled=True
    )
    wd.start()
    wd.disarm()  # e.g. validation phase
    try:
        time.sleep(0.4)
        assert wd.stalls == 0 and not marker.exists()
    finally:
        wd.stop()


def test_disabled_watchdog_is_inert():
    wd = StallWatchdog(enabled=False, timeout_s=0.01)
    wd.start()
    wd.arm()
    time.sleep(0.05)
    assert wd._thread is None and wd.stalls == 0
    wd.stop()


class _TwoBatchBatcher:
    steps_per_epoch = 2

    def epoch(self):
        import numpy as np

        for _ in range(2):
            yield {"x": np.zeros(2, np.float32)}


def test_train_loop_reports_watchdog_stats(tmp_path):
    marker, cmd = _stub_probe(tmp_path)
    wd = StallWatchdog(
        timeout_s=0.1,
        probe_interval_s=0.05,
        check_interval_s=0.02,
        probe_cmd=cmd,
        enabled=True,
    )

    def slow_step(state, batch, rng):
        time.sleep(0.3)  # beat gap > timeout -> one stall per step
        return state, {"loss": 0.5}

    logger = MetricsLogger(tmp_path / "log")
    loop = TrainLoop(
        slow_step,
        state=None,
        batcher=_TwoBatchBatcher(),
        n_epochs=1,
        logger=logger,
        rng=0,
        watchdog=wd,
    )
    loop.run()
    assert wd.stalls >= 1
    # the probe subprocess may still be starting on a loaded host
    assert _wait_for(marker.exists, timeout=10.0)
    csv = (tmp_path / "log" / "metrics.csv").read_text()
    assert "train/watchdog_stalls" in csv
