#!/usr/bin/env python
"""Re-render synthetic soundscape subsets from STORED per-soundscape
metadata (parity with the reference generate_dcase_subset.py:137-414, which
re-renders jams with modified SNR or target-class-only sources).

The generator writes a jams-equivalent JSON next to each wav; this CLI
re-renders those with non-target SNRs decreased (--db_decrease), non-target
events dropped (--drop_nontarget), and/or the background removed
(--no_background). Event tables are identical to the originals up to
dropped rows — only gains change."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta_folder", required=True,
                        help="folder with the generator's *.json metadata")
    parser.add_argument("--soundbank", required=True)
    parser.add_argument("--out_audio", required=True)
    parser.add_argument("--out_tsv", required=True)
    parser.add_argument("--db_decrease", type=float, default=0.0,
                        help="dB to subtract from non-target event SNRs")
    parser.add_argument("--target_class", action="append", default=None,
                        help="target class(es); repeatable")
    parser.add_argument("--drop_nontarget", action="store_true",
                        help="remove non-target events instead of attenuating")
    parser.add_argument("--no_background", action="store_true")
    args = parser.parse_args()

    from desed_task_tpu.tools.soundscapes import SoundscapeConfig, rerender_subset

    fg = Path(args.soundbank) / "foreground"
    bg = None if args.no_background else Path(args.soundbank) / "background"
    df = rerender_subset(
        args.meta_folder, fg, bg, args.out_audio, args.out_tsv,
        cfg=SoundscapeConfig(),
        db_decrease=args.db_decrease,
        target_labels=args.target_class,
        drop_nontarget=args.drop_nontarget,
        keep_background=not args.no_background,
    )
    print(f"re-rendered {df['filename'].nunique()} soundscapes "
          f"({len(df.dropna())} events) -> {args.out_audio}")


if __name__ == "__main__":
    main()
