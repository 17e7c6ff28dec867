#!/usr/bin/env python
"""Collect the reference-torch vs repo A/B artifacts into docs/ab_parity/.

Reads /root/ab_data/exp/{torch,jax,jaxfast}_seed*/metrics.csv +
test_results.json, plots the validation trajectories side by side (per-run
lines + per-framework seed envelopes), and writes a summary table with
breakout epochs and the full test battery.

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
    # trajectory metrics (logged when trajectory_psds > 0): the
    # system-level parity evidence — PSDS1 over 8 operating points and
    # collar event-F1 on synth_val at every validation, both arms
    "val/synth/student/psds1",
    "val/synth/student/event_f1_macro",
]
TEST_KEYS = [
    "psds1", "psds2", "psds1_sed_scores_eval",
    "intersection_f1_macro", "event_f1_macro",
]
BREAKOUT = 0.1  # first epoch with obj above this

# torch_seed42 (round 4, 600 epochs): the raw run dir was lost when its host
# was reclaimed, so it cannot be re-scored on the round-5 enlarged (400-clip)
# test split; its committed final battery below is on the ORIGINAL 31-clip
# split (docs/ab_parity history, commit 3602413) and is therefore marked *
# in the table — trajectory-comparable rounds are in the r4 figures.
HISTORICAL_ROWS = [
    "| torch_seed42 (r4)* | 600 | 0.805 | 0.730 | 100 | 0.0222 | 0.0333 "
    "| 0.0278 | 0.3943 | 0.3003 |",
]
HISTORICAL_NOTE = (
    "\n\\* torch_seed42's battery is on the round-4 31-clip test split "
    "(checkpoints lost to host reclamation — not re-scorable on the "
    "400-clip split the other rows use); its trajectories are in the "
    "round-4 figures (git history of this directory).\n"
)


LOSS_KEYS = {  # torch-mirror name -> jax name (same quantity)
    "loss_strong": ("train/student/loss_strong", "train/loss_strong"),
    "loss_weak": ("train/student/loss_weak", "train/loss_weak"),
}


def load_run(d: Path):
    df = pd.read_csv(d / "metrics.csv")
    # a crashed-then-resumed run (or an overlapping stale process) can log
    # the same (step, name) twice; keep the latest row per key
    df = df.sort_values("time").drop_duplicates(
        subset=["step", "name"], keep="last"
    ).sort_values("step")
    out = {}
    for key in VAL_KEYS:
        rows = df[df.name == key]
        out[key] = (rows.step.to_numpy(), rows.value.to_numpy())
    for key, (tname, jname) in LOSS_KEYS.items():
        rows = df[df.name.isin((tname, jname))]
        out[key] = (rows.step.to_numpy(), rows.value.to_numpy())
    epochs = df[df.name == "train/epoch"]
    steps_per_epoch = None
    n_epochs = int(epochs.value.max()) + 1 if len(epochs) else 0
    if len(epochs) > 1:
        d_steps = np.diff(epochs.step.to_numpy())
        steps_per_epoch = int(np.median(d_steps)) or None
    test = {}
    tj = d / "test_results.json"
    if tj.exists():
        test = json.loads(tj.read_text())
    return out, test, steps_per_epoch, n_epochs


def summary_row(name: str, run) -> str:
    """One summary-table row; shared with ab_snapshot_run.py so single-row
    in-place updates can never drift from the full table's columns."""
    curves, test, spe, n_epochs = run
    steps, vals = curves["val/obj_metric"]
    epochs = steps / (spe or 1)
    bo = f"{vals.max():.3f}" if len(vals) else "-"
    fo = f"{vals[-1]:.3f}" if len(vals) else "-"
    above = epochs[vals > BREAKOUT] if len(vals) else []
    brk = f"{above[0]:.0f}" if len(above) else "-"
    cells = [f"{test[k]:.4f}" if k in test else "-" for k in TEST_KEYS]
    return (f"| {name} | {n_epochs} | {bo} | {fo} | {brk} | "
            + " | ".join(cells) + " |")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/ab_data/exp")
    p.add_argument("--out", default="docs/ab_parity")
    p.add_argument("--skip", nargs="*", default=[],
                   help="run dirs to exclude (e.g. smoke runs)")
    args = p.parse_args()
    root = Path(args.root)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    runs = {}
    for d in sorted(root.glob("*_seed*")):
        if d.name in args.skip:
            continue
        # a run without test_results.json (still training / no final battery)
        # still contributes its validation trajectory — the primary evidence
        if (d / "metrics.csv").exists():
            runs[d.name] = load_run(d)
    if not runs:
        raise SystemExit(f"no completed runs under {root}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = {"torch": "#d62728", "jax": "#1f77b4", "jaxfast": "#2ca02c",
              "jaxshared": "#9467bd"}
    fig, axes = plt.subplots(1, len(VAL_KEYS), figsize=(5 * len(VAL_KEYS), 4))
    for ax, key in zip(np.atleast_1d(axes), VAL_KEYS):
        by_fw: dict[str, list] = {}
        for name, (curves, _, spe, _) in sorted(runs.items()):
            steps, vals = curves[key]
            if not len(steps):
                continue
            fw = name.split("_")[0]
            x = steps / (spe or 1)
            ax.plot(x, vals, marker="o", ms=3, lw=1.0,
                    color=colors.get(fw, "gray"), alpha=0.75, label=name)
            by_fw.setdefault(fw, []).append((x, vals))
        # per-framework min/max envelope across seeds (>=2 seeds only)
        for fw, series in by_fw.items():
            if len(series) < 2:
                continue
            grid = series[0][0]
            mat = np.stack([
                np.interp(grid, x, v) for x, v in series
            ])
            ax.fill_between(grid, mat.min(0), mat.max(0),
                            color=colors.get(fw, "gray"), alpha=0.12, lw=0)
        ax.set_title(key.replace("val/", ""), fontsize=10)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.25)
    handles, labels = np.atleast_1d(axes)[0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="lower center",
               ncol=max(len(runs), 1), fontsize=8, frameon=False)
    fig.suptitle(
        "Reference (torch, red) vs this repo (jax fp32, blue; bf16+Pallas "
        "fast path, green) — identical corpus/config/seed budget, shared "
        "metric stack; shaded = across-seed min/max envelope"
    )
    fig.tight_layout(rect=[0, 0.1, 1, 1])
    fig.savefig(out / "curves.png", dpi=130)

    # per-epoch training losses, torch vs jax — the most directly comparable
    # signal (same objective math on the same batch stream)
    figl, axesl = plt.subplots(1, len(LOSS_KEYS), figsize=(6 * len(LOSS_KEYS), 4))
    for ax, key in zip(np.atleast_1d(axesl), LOSS_KEYS):
        for name, (curves, _, spe, _) in sorted(runs.items()):
            steps, vals = curves[key]
            if not len(steps):
                continue
            fw = name.split("_")[0]
            # smooth with a short rolling mean for readability
            k = max(len(vals) // 100, 1)
            sm = pd.Series(vals).rolling(k, min_periods=1).mean().to_numpy()
            ax.plot(steps / (spe or 1), sm, lw=1.0,
                    color=colors.get(fw, "gray"), alpha=0.8, label=name)
        ax.set_title(f"train {key}", fontsize=10)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.25)
        ax.legend(fontsize=7)
    figl.suptitle("Per-epoch training losses, reference torch (red) vs "
                  "this repo (fp32 blue, bf16 fast green)")
    figl.tight_layout()
    figl.savefig(out / "losses.png", dpi=130)

    header = (
        "| run | epochs | best obj | final obj | breakout ep | "
        + " | ".join(k.replace("_macro", "") for k in TEST_KEYS) + " |"
    )
    lines = [header, "|" + "---|" * (5 + len(TEST_KEYS))]
    for name, run in sorted(runs.items()):
        lines.append(summary_row(name, run))
    lines.extend(HISTORICAL_ROWS)
    lines.append(HISTORICAL_NOTE)
    (out / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}/curves.png and {out}/summary.md")


if __name__ == "__main__":
    main()
