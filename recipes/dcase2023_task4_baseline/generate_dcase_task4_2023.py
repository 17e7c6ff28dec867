#!/usr/bin/env python
"""DCASE 2023 Task 4 dataset acquisition & layout (parity with the
reference generate_dcase_task4_2023.py:1-211): DESED real + AudioSet
strong + pre-generated synthetic soundscapes, symlinked into the dataset
layout, with missing-download bookkeeping. The staged logic is shared in
desed_task_tpu.tools.dataset_setup (the 2022 and 2023 reference scripts are
identical up to the year string)."""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--basedir", default="../../data",
                        help="base data folder for the datasets")
    parser.add_argument("--out_dir", default=None,
                        help="output folder for the assembled 2023 dataset")
    parser.add_argument("--only_real", action="store_true")
    parser.add_argument("--only_synth", action="store_true")
    parser.add_argument("--only_strong", action="store_true")
    args = parser.parse_args()

    from desed_task_tpu.tools.dataset_setup import generate_dcase_staged

    t = time.time()
    generate_dcase_staged(
        args.basedir, args.out_dir,
        only_real=args.only_real,
        only_synth=args.only_synth,
        only_strong=args.only_strong,
    )
    print(f"done in {time.time() - t:.1f} s")


if __name__ == "__main__":
    main()
