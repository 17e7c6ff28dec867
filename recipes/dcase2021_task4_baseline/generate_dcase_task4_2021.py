#!/usr/bin/env python
"""DCASE 2021 dataset generation (parity with the reference
generate_dcase_task4_2021.py): DESED real download (desed-gated) + synthetic
soundscape generation from the soundbank with SNR 6-30 dB and ref -50 dB
(scaper-equivalent generator in desed_task_tpu.tools.soundscapes; pitch
shift is not applied — see PARITY.md #14)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--basedir", default="../../data/dcase/dataset")
    parser.add_argument("--soundbank", default=None,
                        help="folder with foreground/<class>/*.wav + background/*.wav")
    parser.add_argument("--n_train", type=int, default=10000)
    parser.add_argument("--n_val", type=int, default=2500)
    parser.add_argument("--snr_min", type=float, default=6.0)
    parser.add_argument("--snr_max", type=float, default=30.0)
    parser.add_argument("--ref_db", type=float, default=-50.0)
    parser.add_argument("--seed", type=int, default=2021)
    args = parser.parse_args()

    try:
        import desed

        desed.download_desed(args.basedir, weak=True, unlabel_in_domain=True,
                             validation=True)
    except ImportError:
        print("[real] `desed` unavailable; download DESED real data manually")

    if args.soundbank is None:
        print("[synth] pass --soundbank to generate synthetic soundscapes")
        return
    from desed_task_tpu.tools.soundscapes import SoundscapeConfig, SoundscapeGenerator

    cfg = SoundscapeConfig(snr_range=(args.snr_min, args.snr_max), ref_db=args.ref_db)
    base = Path(args.basedir)
    for split, n, seed_off in [("train", args.n_train, 0), ("validation", args.n_val, 1)]:
        gen = SoundscapeGenerator(
            Path(args.soundbank) / "foreground", Path(args.soundbank) / "background",
            cfg, seed=args.seed + seed_off,
        )
        out_audio = base / f"audio/{split}/synthetic21_{split}/soundscapes_16k"
        out_tsv = base / f"metadata/{split}/synthetic21_{split}/soundscapes.tsv"
        gen.generate(n, out_audio, out_tsv)
        print(f"[synth] {split}: {n} soundscapes -> {out_audio}")


if __name__ == "__main__":
    main()
