#!/usr/bin/env python
"""MixIT-pretrain the TDCN++ separator on unlabeled in-domain audio.

The reference's 2021 SSep recipe depends on a separator checkpoint Google
trained out-of-repo (local/apply_separation_model.py just applies it). This
CLI reproduces that stage in-framework: unsupervised MixIT on the dataset's
own unlabeled_in_domain folder, validated by SI-SNRi on synthetic two-source
mixtures from a held-out folder. The resulting msgpack plugs straight into
  python run_separation.py --backend jax --checkpoint <out>/tdcn_mixit_best.msgpack
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from desed_task_tpu.training.separation_pretrain import (  # noqa: E402
    MixITPretrainConfig,
    pretrain_separator,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_folders", nargs="+", required=True,
                   help="unlabeled wav folders (e.g. unlabel_in_domain)")
    p.add_argument("--val_folders", nargs="+", required=True,
                   help="held-out wavs paired into synthetic eval mixtures")
    p.add_argument("--log_dir", required=True)
    p.add_argument("--n_src", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--batch_mixtures", type=int, default=16)
    p.add_argument("--segment_seconds", type=float, default=4.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--limit_clips", type=int, default=None,
                   help="cap clips loaded per pool (smoke runs)")
    args = p.parse_args()

    cfg = MixITPretrainConfig(
        n_src=args.n_src,
        n_epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        batch_mixtures=args.batch_mixtures,
        segment_len=int(args.segment_seconds * 16000),
        lr=args.lr,
    )
    _, best = pretrain_separator(
        args.train_folders, args.val_folders, args.log_dir, cfg,
        limit_clips=args.limit_clips,
    )
    print(f"[mixit] best checkpoint: {best}")


if __name__ == "__main__":
    main()
