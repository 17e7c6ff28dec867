#!/usr/bin/env python
"""Re-render synthetic soundscape subsets with modified parameters (parity
with the reference generate_dcase_subset.py:137-414, which re-renders jams
with modified SNR or target-class-only sources). Works from a soundbank with
the scaper-equivalent generator; supports SNR overrides and restricting the
foreground to a target class."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--soundbank", required=True)
    parser.add_argument("--out_audio", required=True)
    parser.add_argument("--out_tsv", required=True)
    parser.add_argument("--n_soundscapes", type=int, default=1000)
    parser.add_argument("--snr_min", type=float, default=6.0)
    parser.add_argument("--snr_max", type=float, default=30.0)
    parser.add_argument("--target_class", default=None,
                        help="restrict foreground events to one class")
    parser.add_argument("--no_background", action="store_true",
                        help="target-events-only rendering")
    parser.add_argument("--seed", type=int, default=2021)
    args = parser.parse_args()

    import shutil
    import tempfile

    from desed_task_tpu.tools.soundscapes import SoundscapeConfig, SoundscapeGenerator

    fg = Path(args.soundbank) / "foreground"
    bg = None if args.no_background else Path(args.soundbank) / "background"
    if args.target_class:
        # materialize a foreground view with only the target class
        tmp = Path(tempfile.mkdtemp(prefix="subset_fg_"))
        src = fg / args.target_class
        if not src.exists():
            raise SystemExit(f"class folder not found: {src}")
        shutil.copytree(src, tmp / args.target_class)
        fg = tmp
    cfg = SoundscapeConfig(snr_range=(args.snr_min, args.snr_max))
    gen = SoundscapeGenerator(fg, bg, cfg, seed=args.seed)
    df = gen.generate(args.n_soundscapes, args.out_audio, args.out_tsv)
    print(f"rendered {args.n_soundscapes} soundscapes "
          f"({len(df.dropna())} events) -> {args.out_audio}")


if __name__ == "__main__":
    main()
