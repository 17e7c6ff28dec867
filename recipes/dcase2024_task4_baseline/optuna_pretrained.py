#!/usr/bin/env python
"""HPO entry point (parity with the reference optuna_pretrained.py): search
training hyperparameters or per-class median-filter windows, maximizing the
validation objective metric."""

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.tools.hpo import run_study  # noqa: E402
from desed_task_tpu.training.single_run import single_run  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf_file", default="./confs/pretrained.yaml")
    parser.add_argument("--log_dir", default="./exp/hpo")
    parser.add_argument("--n_trials", type=int, default=20)
    parser.add_argument("--mode", choices=["train", "eval"], default="train")
    parser.add_argument("--fast_dev_run", action="store_true")
    args = parser.parse_args()

    with open(args.conf_file) as f:
        config = yaml.safe_load(f)

    trial_idx = [0]

    def objective(trial_config):
        trial_idx[0] += 1
        log_dir = f"{args.log_dir}/trial_{trial_idx[0]}"
        state, results = single_run(
            trial_config, log_dir, fast_dev_run=args.fast_dev_run
        )
        # objective: PSDS1 + intersection F1 on dev-test (results of best ckpt)
        if results is None:
            return 0.0
        return results["psds1"] + results["intersection_f1_macro"]

    best = run_study(
        config, objective, args.n_trials, args.log_dir, mode=args.mode
    )
    print("best trial:", best)


if __name__ == "__main__":
    main()
