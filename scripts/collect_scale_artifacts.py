#!/usr/bin/env python
"""Collect learning-at-scale run artifacts into docs/scale_run/.

Reads the experiment dir produced by examples/scale_run_2024.py --phase train
(metrics.csv, figures/, test_results.json) and writes:
  docs/scale_run/curves.png        objective + component metrics vs epoch
  docs/scale_run/train_loss.png    train losses vs step
  docs/scale_run/PSDS_scenario{1,2}_roc.png (copied)
  docs/scale_run/test_results.json (copied)
  docs/scale_run/metrics.csv       (copied)
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="/root/scale_data/exp")
    p.add_argument("--out", default="docs/scale_run")
    args = p.parse_args()
    exp, out = Path(args.exp), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(exp / "metrics.csv").sort_values("time", kind="stable")
    # per-process step counters restart on checkpoint-resume (the tunneled
    # TPU needs periodic restarts, docs/performance.md); rebuild a global
    # monotone step from the time-ordered rows
    offset, last, gsteps = 0, -1, []
    for s in df["step"]:
        if s < last:
            offset += last
        last = s
        gsteps.append(s + offset)
    df["gstep"] = gsteps
    piv = df.pivot_table(index="gstep", columns="name", values="value",
                         aggfunc="last")

    # validation curves vs epoch
    epochs = piv["train/epoch"].dropna() if "train/epoch" in piv else None
    val_cols = [
        ("val/obj_metric", "objective (weak F1 + synth inter-F1 + mpAUC)"),
        ("val/weak/student/macro_F1", "weak clip-level macro F1"),
        ("val/synth/student/intersection_f1_macro", "synth intersection F1"),
        ("val/maestro/student/segment_mpauc", "MAESTRO segment mpAUC"),
        ("val/teacher/obj_metric", "objective (teacher)"),
    ]
    fig, ax = plt.subplots(figsize=(8, 5))

    def to_epoch(idx):
        if epochs is None or not len(epochs):
            return idx
        pos = min(epochs.index.searchsorted(idx), len(epochs) - 1)
        return float(epochs.iloc[pos])

    for col, label in val_cols:
        if col in piv:
            s = piv[col].dropna()
            x = [to_epoch(i) for i in s.index]
            ax.plot(x, s.values, marker="o", ms=3, label=label)
    ax.set_xlabel("epoch" if epochs is not None else "step")
    ax.set_ylabel("metric")
    ax.set_title("2024-config rehearsal on generated soundscapes (validation)")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.savefig(out / "curves.png", dpi=130, bbox_inches="tight")
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(8, 4))
    for col, label in [
        ("train/loss", "total"),
        ("train/loss_strong", "strong BCE"),
        ("train/loss_weak", "weak BCE"),
        ("train/tot_self_loss", "consistency (weighted)"),
    ]:
        if col in piv:
            s = piv[col].dropna()
            ax.plot(s.index, s.values, label=label, lw=1)
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.set_title("train losses")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.savefig(out / "train_loss.png", dpi=130, bbox_inches="tight")
    plt.close(fig)

    for name in ("PSDS_scenario1_roc.png", "PSDS_scenario2_roc.png"):
        src = exp / "figures" / name
        if src.exists():
            shutil.copy(src, out / name)
    for name in ("test_results.json", "metrics.csv", "energy_train.json"):
        src = exp / name
        if src.exists():
            shutil.copy(src, out / name)
    if (exp / "test_results.json").exists():
        print(json.dumps(json.loads((exp / "test_results.json").read_text()),
                         indent=2))
    print(f"artifacts -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
