#!/usr/bin/env python
"""DCASE 2024 Task 4 baseline: CRNN + frozen BEATs embeddings, mean-teacher
over DESED + MAESTRO (TPU-native).

CLI parity with the reference entry point
(recipes/dcase2024_task4_baseline/train_pretrained.py:595-659):

    python train_pretrained.py --conf_file confs/pretrained.yaml \
        --log_dir ./exp/2024_baseline [--fast_dev_run] \
        [--resume_from_checkpoint] [--test_from_checkpoint DIR] \
        [--eval_from_checkpoint DIR]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.utils.cli import train_cli  # noqa: E402

if __name__ == "__main__":
    train_cli(
        "Training a SED system for DESED + MAESTRO",
        default_conf="./confs/pretrained.yaml",
        default_log_dir="./exp/2024_baseline",
    )
