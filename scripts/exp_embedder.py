#!/usr/bin/env python
"""Embedder-pretraining experiment: train a supervised (or SSL-init) BEATs
variant on the scale corpus's weak labels and report a 10-class linear-probe
accuracy on held-out weak clips.

Findings drive examples/scale_run_2024.py phase_pretrain. Observed here
(see docs/scale_run.md round-4 notes): with deep_norm=True (the released
checkpoint's config, residual alpha=(2L)^(1/4)=2.21) the 12-layer encoder
is untrainable in a few thousand steps — BCE pins at the base rate and the
probe stays at chance; alpha=1 (deep_norm=False) lets the same budget reach
a high probe accuracy.

    python scripts/exp_embedder.py --workdir /root/scale_data \
        --deep_norm false --lr 8e-4 --steps 3000 \
        --out /root/scale_data/embeddings/beats_sup.msgpack
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def weak_label_table(root: Path):
    import pandas as pd

    weak_df = pd.read_csv(root / "meta" / "weak.tsv", sep="\t")
    weak_map = {
        r.filename: set(str(r.event_labels).split(","))
        for r in weak_df.itertuples()
    }
    mae_df = pd.read_csv(root / "meta" / "maestro_train.tsv", sep="\t")
    if "confidence" in mae_df.columns:
        mae_df = mae_df[mae_df.confidence > 0.5]
    mae_map = {}
    for r in mae_df.dropna(subset=["event_label"]).itertuples():
        mae_map.setdefault(r.filename, set()).add(r.event_label)
    classes = sorted(set().union(*weak_map.values(), *mae_map.values()))
    cindex = {c: i for i, c in enumerate(classes)}
    files, labels = [], []
    for folder, mapping in (("weak", weak_map), ("maestro_train", mae_map)):
        for fname, labs in mapping.items():
            path = root / "audio" / folder / fname
            if not path.exists():
                continue
            y = np.zeros(len(classes), np.float32)
            for lab in labs:
                y[cindex[lab]] = 1.0
            files.append(path)
            labels.append(y)
    return files, np.stack(labels), classes


def linear_probe(root: Path, ckpt: str, n_per_class: int = 30) -> float:
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from desed_task_tpu.data.audio_io import read_audio
    from desed_task_tpu.tools.embeddings import build_embedder

    weak = pd.read_csv(root / "meta" / "weak.tsv", sep="\t")
    weak["first"] = weak.event_labels.str.split(",").str[0]
    weak = weak.groupby("first").head(n_per_class)
    files = weak.filename.tolist()
    labels = weak["first"].astype("category").cat.codes.to_numpy()
    audio = np.stack([
        read_audio(str(root / "audio" / "weak" / f), pad_to=160000, test=True)[0]
        for f in files
    ])
    model, variables = build_embedder("beats", ckpt)
    fwd = jax.jit(lambda v, a: model.apply(v, a)["global"])
    embs = []
    for i in range(0, len(audio), 25):
        b = audio[i:i + 25]
        if len(b) < 25:
            b = np.concatenate(
                [b, np.zeros((25 - len(b), 160000), np.float32)]
            )
        embs.append(np.asarray(fwd(variables, jnp.asarray(b)))[
            : min(25, len(audio) - i)])
    X = np.concatenate(embs)
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(X))
    tr, te = idx[: len(X) // 2], idx[len(X) // 2:]
    mu, sd = X[tr].mean(0), X[tr].std(0) + 1e-6
    Xn = (X - mu) / sd
    Y = np.eye(int(labels.max()) + 1)[labels]
    A = Xn[tr]
    W = np.linalg.solve(A.T @ A + 1e-1 * np.eye(A.shape[1]), A.T @ Y[tr])
    return float(((Xn[te] @ W).argmax(1) == labels[te]).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/root/scale_data")
    p.add_argument("--out", required=True)
    p.add_argument("--deep_norm", default="false",
                   choices=["true", "false"])
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--lr", type=float, default=8e-4)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--init", default=None,
                   help="optional msgpack to init from (SSL stage)")
    p.add_argument("--probe_only", action="store_true")
    args = p.parse_args()
    root = Path(args.workdir)

    if not args.probe_only:
        from desed_task_tpu.models.beats import BEATsConfig
        from desed_task_tpu.training.beats_pretrain import (
            BEATsPretrainConfig, finetune_beats_weak,
        )

        files, labels, classes = weak_label_table(root)
        print(f"[exp] {len(files)} labeled clips, {len(classes)} classes")
        cfg = BEATsPretrainConfig(
            beats=BEATsConfig(
                deep_norm=(args.deep_norm == "true"),
                encoder_layers=args.layers,
            ),
            steps=args.steps, lr=args.lr, warmup_steps=200,
            compute_dtype=args.dtype,
        )
        finetune_beats_weak(files, labels, args.out,
                            init_params_path=args.init, cfg=cfg)
    acc = linear_probe(root, args.out)
    print(f"[exp] linear-probe acc ({args.out}): {acc:.3f}")


if __name__ == "__main__":
    main()
