#!/usr/bin/env python
"""Fine-tune the separation ensemble (parity with the reference
finetune_on_separated.py:24-387): a multisrc CRNN over separated sources
blended with a frozen monaural CRNN via the learned scalar q.

Requires a trained 2021 SED checkpoint (--sed_checkpoint, from train_sed.py)
and separated source files produced by run_separation.py
(<folder>_separated/X_src{i}.wav, or explicit data.*_folder_sep conf keys).
"""

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf_file", default="./confs/sep+sed.yaml")
    parser.add_argument("--sed_checkpoint", required=True,
                        help="checkpoint dir of the trained monaural 2021 CRNN")
    parser.add_argument("--sed_model", default="student",
                        choices=["student", "teacher"],
                        help="which branch of the SED checkpoint seeds the ensemble")
    parser.add_argument("--log_dir", default="./exp/2021_separation_ensemble")
    parser.add_argument("--n_src", type=int, default=4)
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--test_from_checkpoint", default=None)
    args = parser.parse_args()

    from desed_task_tpu.training.sepsed_run import sepsed_single_run

    with open(args.conf_file) as f:
        config = yaml.safe_load(f)
    state, results = sepsed_single_run(
        config,
        args.log_dir,
        sed_checkpoint=args.sed_checkpoint,
        sed_model=args.sed_model,
        n_src=args.n_src,
        fast_dev_run=args.fast_dev_run,
        test_from_checkpoint=args.test_from_checkpoint,
    )
    if results is not None:
        print("==== dev-test results (separation ensemble) ====")
        for k, v in results.items():
            if isinstance(v, float):
                print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
