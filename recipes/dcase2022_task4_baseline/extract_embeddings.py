#!/usr/bin/env python
"""Extract frozen pretrained embeddings (BEATs/PANNs/AST) for all dataset
splits into HDF5 stores consumed by training (parity with the reference
recipes/dcase2024_task4_baseline/extract_embeddings.py)."""

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.tools.embeddings import extract_splits  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf_file", default="./confs/pretrained.yaml")
    parser.add_argument("--pretrained_model", default="beats",
                        choices=["beats", "panns", "ast"])
    parser.add_argument("--checkpoint", default=None,
                        help="torch checkpoint for weight conversion (BEATs)")
    parser.add_argument("--output_dir", default="./embeddings")
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args()

    with open(args.conf_file) as f:
        config = yaml.safe_load(f)
    data = config["data"]
    splits = {
        "synth_train": data.get("synth_folder"),
        "strong_train": data.get("strong_folder"),
        "weak_train": data.get("weak_folder"),
        "unlabeled_train": data.get("unlabeled_folder"),
        "maestro_real_train": data.get("real_maestro_train_folder"),
        "maestro_real_val": data.get("real_maestro_val_folder"),
        "synth_val": data.get("synth_val_folder"),
        "devtest": data.get("test_folder"),
        "eval": data.get("eval_folder"),
    }
    splits = {k: v for k, v in splits.items() if v and Path(v).exists()}
    extract_splits(
        args.pretrained_model,
        args.checkpoint,
        splits,
        args.output_dir,
        fs=data["fs"],
        audio_len=data["audio_max_len"],
        batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
