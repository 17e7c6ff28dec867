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

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.training.single_run import single_run  # noqa: E402


def main():
    parser = argparse.ArgumentParser("Training a SED system for DESED + MAESTRO")
    parser.add_argument("--conf_file", default="./confs/pretrained.yaml")
    parser.add_argument("--log_dir", default="./exp/2024_baseline")
    parser.add_argument("--resume_from_checkpoint", action="store_true")
    parser.add_argument("--test_from_checkpoint", default=None,
                        help="checkpoint dir to test (no training)")
    parser.add_argument("--eval_from_checkpoint", default=None,
                        help="checkpoint dir for label-free eval score dump")
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--no_fast_math", action="store_true",
                        help="disable bf16 MXU compute (fp32 reference parity)")
    args = parser.parse_args()

    with open(args.conf_file) as f:
        config = yaml.safe_load(f)

    evaluation = args.eval_from_checkpoint is not None
    test_ckpt = args.test_from_checkpoint or args.eval_from_checkpoint
    state, results = single_run(
        config,
        args.log_dir,
        checkpoint_resume=args.resume_from_checkpoint,
        test_from_checkpoint=test_ckpt,
        fast_dev_run=args.fast_dev_run,
        evaluation=evaluation,
        fast=not args.no_fast_math,
    )
    if results is not None:
        print("==== dev-test results ====")
        for k, v in results.items():
            if isinstance(v, float):
                print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
