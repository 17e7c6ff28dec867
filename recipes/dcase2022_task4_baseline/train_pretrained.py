#!/usr/bin/env python
"""DCASE 2022 Task 4 baseline with frozen pretrained embeddings (PANNs/AST):
CRNN mean-teacher over synthetic + weak + unlabeled DESED (TPU-native).
CLI parity with the reference
recipes/dcase2022_task4_baseline/train_pretrained.py (incl.
--eval_from_checkpoint)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.utils.cli import train_cli  # noqa: E402

if __name__ == "__main__":
    train_cli(
        "Training a SED system for DESED Task",
        default_conf="./confs/pretrained_panns.yaml",
        default_log_dir="./exp/2022_baseline",
    )
