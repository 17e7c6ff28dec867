#!/usr/bin/env python
"""Offline source separation of all dataset folders with the MixIT TDCN++
model (parity with recipes/dcase2021_task4_baseline/run_separation.py).
Requires the downloaded TF1 checkpoint; see the DCASE 2021 instructions."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.tools.separation import SeparationModel  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True,
                        help="TF1 checkpoint prefix (e.g. .../baseline_model)")
    parser.add_argument("--metagraph", required=True,
                        help="path to inference.meta")
    parser.add_argument("--folders", nargs="+", required=True,
                        help="wav folders to separate")
    parser.add_argument("--out_suffix", default="_separated")
    args = parser.parse_args()
    model = SeparationModel(args.checkpoint, args.metagraph)
    for folder in args.folders:
        out = folder.rstrip("/") + args.out_suffix
        n = model.separate_folder(folder, out)
        print(f"separated {n} files: {folder} -> {out}")


if __name__ == "__main__":
    main()
