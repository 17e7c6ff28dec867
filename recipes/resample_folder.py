#!/usr/bin/env python
"""Resample a folder of wavs (44.1 kHz -> 16 kHz typically), multiprocessing
with skip-if-done caching (parity with recipes/*/local/resample_folder.py)."""

import argparse
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _resample_one(args):
    in_path, out_path, target_fs = args
    from desed_task_tpu.data.audio_io import read_wav, resample, to_mono, write_wav

    audio, fs = read_wav(in_path)
    audio = to_mono(audio)
    if fs != target_fs:
        audio = resample(audio, fs, target_fs)
    write_wav(out_path, audio, target_fs)
    return out_path


def resample_folder(in_dir, out_dir, target_fs=16000, regex="*.wav", workers=10):
    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(in_dir.rglob(regex))
    # skip-if-counts-match caching (resample_folder.py:37-59)
    if len(list(out_dir.rglob(regex))) == len(files) and files:
        print(f"{out_dir} already resampled ({len(files)} files), skipping")
        return 0
    jobs = [(str(f), str(out_dir / f.name), target_fs) for f in files]
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for i, _ in enumerate(pool.map(_resample_one, jobs)):
            if (i + 1) % 500 == 0:
                print(f"  {i + 1}/{len(jobs)}")
    return len(jobs)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--in_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--target_fs", type=int, default=16000)
    parser.add_argument("--regex", default="*.wav")
    args = parser.parse_args()
    n = resample_folder(args.in_dir, args.out_dir, args.target_fs, args.regex)
    print(f"resampled {n} files")
