#!/usr/bin/env python
"""DCASE 2022 Task 4 baseline: CRNN mean-teacher over synthetic + weak +
unlabeled DESED (TPU-native). CLI parity with the reference
recipes/dcase2022_task4_baseline/train_sed.py (incl. --strong_real :300-305
and --eval_from_checkpoint :329-342)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.utils.cli import train_cli  # noqa: E402

if __name__ == "__main__":
    train_cli(
        "Training a SED system for DESED Task",
        default_conf="./confs/default.yaml",
        default_log_dir="./exp/2022_baseline",
        strong_real=True,
    )
