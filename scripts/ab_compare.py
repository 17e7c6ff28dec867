#!/usr/bin/env python
"""Collect the reference-torch vs repo A/B artifacts into docs/ab_parity/.

Reads /root/ab_data/exp/{torch,jax}_seed*/metrics.csv + test_results.json,
plots the validation trajectories side by side, and writes a summary table.

    python scripts/ab_compare.py [--root /root/ab_data/exp] [--out docs/ab_parity]
"""

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd

VAL_KEYS = [
    "val/obj_metric",
    "val/weak/student/macro_F1",
    "val/synth/student/intersection_f1_macro",
]


def load_run(d: Path):
    df = pd.read_csv(d / "metrics.csv")
    out = {}
    for key in VAL_KEYS:
        rows = df[df.name == key]
        out[key] = (rows.step.to_numpy(), rows.value.to_numpy())
    epochs = df[df.name == "train/epoch"]
    steps_per_epoch = None
    if len(epochs) > 1:
        d_steps = np.diff(epochs.step.to_numpy())
        steps_per_epoch = int(np.median(d_steps)) or None
    test = {}
    tj = d / "test_results.json"
    if tj.exists():
        test = json.loads(tj.read_text())
    return out, test, steps_per_epoch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/ab_data/exp")
    p.add_argument("--out", default="docs/ab_parity")
    args = p.parse_args()
    root = Path(args.root)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    runs = {}
    for d in sorted(root.glob("*_seed*")):
        if (d / "metrics.csv").exists():
            runs[d.name] = load_run(d)
    if not runs:
        raise SystemExit(f"no runs under {root}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(VAL_KEYS), figsize=(5 * len(VAL_KEYS), 4))
    colors = {"torch": "#d62728", "jax": "#1f77b4", "jaxfast": "#2ca02c"}
    for ax, key in zip(np.atleast_1d(axes), VAL_KEYS):
        for name, (curves, _, spe) in sorted(runs.items()):
            steps, vals = curves[key]
            if not len(steps):
                continue
            fw = name.split("_")[0]
            x = steps / (spe or 1)
            ax.plot(x, vals, marker="o", ms=3, lw=1.2,
                    color=colors.get(fw, "gray"),
                    alpha=0.8, label=name)
        ax.set_title(key.replace("val/", ""), fontsize=10)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.25)
    handles, labels = np.atleast_1d(axes)[0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="lower center",
               ncol=max(len(runs), 1), fontsize=8, frameon=False)
    fig.suptitle("Reference (torch, red) vs this repo (jax, blue) — "
                 "identical corpus/config/seeds, shared metric stack")
    fig.tight_layout(rect=[0, 0.08, 1, 1])
    fig.savefig(out / "curves.png", dpi=130)

    # summary table
    lines = ["| run | final obj | best obj | test psds1 | test psds2 | "
             "test intersection-F1 | test event-F1 |",
             "|---|---|---|---|---|---|---|"]
    for name, (curves, test, _) in sorted(runs.items()):
        _, vals = curves["val/obj_metric"]
        fo = f"{vals[-1]:.4f}" if len(vals) else "-"
        bo = f"{vals.max():.4f}" if len(vals) else "-"
        lines.append(
            f"| {name} | {fo} | {bo} | "
            f"{test.get('psds1', float('nan')):.4f} | "
            f"{test.get('psds2', float('nan')):.4f} | "
            f"{test.get('intersection_f1_macro', float('nan')):.4f} | "
            f"{test.get('event_f1_macro', float('nan')):.4f} |"
        )
    (out / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}/curves.png and {out}/summary.md")


if __name__ == "__main__":
    main()
