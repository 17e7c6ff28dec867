"""Shared argument surface for the per-year train CLIs.

Every reference train entry point exposes the same contract
(e.g. recipes/dcase2022_task4_baseline/train_sed.py:285-345):
--conf_file/--log_dir/--resume_from_checkpoint/--test_from_checkpoint/
--eval_from_checkpoint/--fast_dev_run, plus --strong_real where AudioSet
strong real data is optional. The recipes delegate here so the contract
stays identical across years.
"""

from __future__ import annotations

import argparse

import yaml


def train_cli(
    description: str,
    default_conf: str,
    default_log_dir: str,
    strong_real: bool = False,
    argv=None,
):
    """Parse the shared train-CLI args and run single_run. Returns results."""
    parser = argparse.ArgumentParser(description)
    parser.add_argument("--conf_file", default=default_conf)
    parser.add_argument("--log_dir", default=default_log_dir)
    parser.add_argument("--resume_from_checkpoint", action="store_true")
    parser.add_argument("--test_from_checkpoint", default=None,
                        help="checkpoint dir to test (no training)")
    parser.add_argument("--eval_from_checkpoint", default=None,
                        help="checkpoint dir for label-free eval score dump")
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--no_fast_math", action="store_true",
                        help="disable bf16 MXU compute (fp32 reference parity)")
    if strong_real:
        parser.add_argument(
            "--strong_real", action="store_true", default=False,
            help="include the AudioSet strong annotations in training",
        )
    args = parser.parse_args(argv)

    with open(args.conf_file) as f:
        config = yaml.safe_load(f)

    from ..training.single_run import single_run

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
        strong_real=getattr(args, "strong_real", False),
    )
    if results is not None:
        print("==== dev-test results ====")
        for k, v in results.items():
            if isinstance(v, float):
                print(f"  {k}: {v:.4f}")
    return state, results
