"""Energy accounting (replacement for CodeCarbon's OfflineEmissionsTracker).

The reference reports training/inference kWh as a first-class DCASE metric
(sed_trainer_pretrained.py:171-181, 1332-1363). CodeCarbon is not available
here and cannot measure TPUs anyway, so this tracker integrates wall-clock
device-busy time against a configurable board power model and clearly labels
the result as a model-based estimate.

Default power model: TPU v5e chip ~200 W board power + host share ~100 W.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class EnergyTracker:
    def __init__(
        self,
        name: str = "train",
        device_watts: float = 200.0,
        host_watts: float = 100.0,
        n_devices: int = 1,
        out_dir=None,
    ):
        self.name = name
        self.device_watts = device_watts
        self.host_watts = host_watts
        self.n_devices = n_devices
        self.out_dir = Path(out_dir) if out_dir else None
        self._start = None
        self._elapsed = 0.0

    def start(self):
        self._start = time.monotonic()
        return self

    def stop(self) -> float:
        """Returns estimated kWh; also writes a json report if out_dir set."""
        if self._start is not None:
            self._elapsed += time.monotonic() - self._start
            self._start = None
        kwh = self.energy_kwh
        if self.out_dir:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            (self.out_dir / f"energy_{self.name}.json").write_text(
                json.dumps(
                    {
                        "name": self.name,
                        "elapsed_s": self._elapsed,
                        "device_watts": self.device_watts,
                        "host_watts": self.host_watts,
                        "n_devices": self.n_devices,
                        "estimated_kwh": kwh,
                        "note": "model-based estimate (wall-clock x power model)",
                    }
                )
            )
        return kwh

    @property
    def energy_kwh(self) -> float:
        elapsed = self._elapsed
        if self._start is not None:
            elapsed += time.monotonic() - self._start
        watts = self.device_watts * self.n_devices + self.host_watts
        return elapsed * watts / 3600.0 / 1000.0
