#!/usr/bin/env python
"""Offline source separation of all dataset folders with the MixIT TDCN++
model (parity with recipes/dcase2021_task4_baseline/run_separation.py).
Requires the downloaded TF1 checkpoint; see the DCASE 2021 instructions."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.tools.separation import (  # noqa: E402
    JaxSeparationModel,
    SeparationModel,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", choices=["tf1", "jax"], default="tf1",
                        help="tf1 = Google's frozen MixIT metagraph; "
                             "jax = in-framework TDCN++ (models/tdcn.py)")
    parser.add_argument("--checkpoint", default=None,
                        help="TF1 checkpoint prefix, or msgpack params for jax")
    parser.add_argument("--metagraph", default=None,
                        help="path to inference.meta (tf1 backend)")
    parser.add_argument("--folders", nargs="+", required=True,
                        help="wav folders to separate")
    parser.add_argument("--out_suffix", default="_separated")
    args = parser.parse_args()
    if args.backend == "jax":
        model = JaxSeparationModel(args.checkpoint)
    else:
        assert args.checkpoint and args.metagraph, "tf1 backend needs --checkpoint/--metagraph"
        model = SeparationModel(args.checkpoint, args.metagraph)
    for folder in args.folders:
        out = folder.rstrip("/") + args.out_suffix
        n = model.separate_folder(folder, out)
        print(f"separated {n} files: {folder} -> {out}")


if __name__ == "__main__":
    main()
