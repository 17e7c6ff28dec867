#!/usr/bin/env python
"""DCASE 2021 Task 4 baseline: CRNN mean-teacher over synthetic + weak +
unlabeled DESED (TPU-native). CLI parity with the reference
recipes/dcase2021_task4_baseline/train_sed.py."""

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.training.single_run import single_run  # noqa: E402


def main():
    parser = argparse.ArgumentParser("Training a SED system for DESED Task")
    parser.add_argument("--conf_file", default="./confs/sed.yaml")
    parser.add_argument("--log_dir", default="./exp/2021_baseline")
    parser.add_argument("--resume_from_checkpoint", action="store_true")
    parser.add_argument("--test_from_checkpoint", default=None)
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--no_fast_math", action="store_true")
    args = parser.parse_args()
    with open(args.conf_file) as f:
        config = yaml.safe_load(f)
    state, results = single_run(
        config,
        args.log_dir,
        checkpoint_resume=args.resume_from_checkpoint,
        test_from_checkpoint=args.test_from_checkpoint,
        fast_dev_run=args.fast_dev_run,
        fast=not args.no_fast_math,
    )
    if results is not None:
        print("==== dev-test results ====")
        for k, v in results.items():
            if isinstance(v, float):
                print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
