#!/usr/bin/env python
"""Collect the fp32-vs-bf16 convergence A/B (VERDICT r3 #2) into
docs/precision_ab/.

Reads /root/scale_ab/exp*[_s<seed>]/{metrics.csv,test_results.json} pairs
(exp* = bf16 + fused Pallas fast path, exp_fp32* = the golden fp32/XLA
reference-parity path; same corpus, schedule and seed per pair) and writes
a final-battery table plus matched-step objective curves.

    python scripts/precision_ab.py [--root /root/scale_ab] [--out docs/precision_ab]
"""

import argparse
import json
import re
from pathlib import Path

import pandas as pd

TEST_KEYS = [
    "psds1", "psds2", "psds1_sed_scores_eval", "psds2_sed_scores_eval",
    "intersection_f1_macro", "event_f1_macro",
    "maestro_segment_mauc", "maestro_segment_mpauc",
]

# Round-4 matched pairs (200-epoch runs on the same seeded generator corpus;
# batteries as committed in docs/precision_ab/summary.md at round 4). The
# host those runs lived on was reclaimed; the corpus regenerates
# bit-identically from its seeds, so their fast-fp32 deltas pool with the
# fresh seeds below for the mean/CI.
HISTORICAL = {
    ("bf16_fast", 42): dict(zip(TEST_KEYS, [
        0.3567, 0.4548, 0.3645, 0.4689, 0.6878, 0.4554, 0.9239, 0.8460])),
    ("bf16_fast", 43): dict(zip(TEST_KEYS, [
        0.3708, 0.5440, 0.3775, 0.5527, 0.6678, 0.4359, 0.9208, 0.8458])),
    ("fp32", 42): dict(zip(TEST_KEYS, [
        0.3887, 0.4838, 0.3982, 0.4988, 0.6782, 0.4340, 0.9283, 0.8486])),
    ("fp32", 43): dict(zip(TEST_KEYS, [
        0.3636, 0.5417, 0.3694, 0.5504, 0.6647, 0.4330, 0.9230, 0.8457])),
}

# two-sided 95% t critical values for n-1 dof (n = number of seed pairs)
T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
       7: 2.365, 8: 2.306, 9: 2.262}


def load(d: Path):
    df = pd.read_csv(d / "metrics.csv")
    df = df.sort_values("time").drop_duplicates(
        subset=["step", "name"], keep="last"
    )
    obj = df[df.name == "val/obj_metric"].sort_values("step")
    test = json.loads((d / "test_results.json").read_text())
    return (obj.step.to_numpy(), obj.value.to_numpy()), test


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/scale_ab")
    p.add_argument("--out", default="docs/precision_ab")
    args = p.parse_args()
    root, out = Path(args.root), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    runs = {}
    for d in sorted(root.glob("exp*")):
        if not (d / "test_results.json").exists():
            continue
        m = re.fullmatch(r"exp(_fp32)?(?:_s(\d+))?", d.name)
        if not m:
            continue
        arm = "fp32" if m.group(1) else "bf16_fast"
        seed = int(m.group(2) or 42)
        runs[(arm, seed)] = load(d)
    if runs:
        # trajectory figure only when fresh run dirs exist (HISTORICAL holds
        # final batteries, not curves — the r4 curves.png stays committed)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4.5))
        colors = {"bf16_fast": "#2ca02c", "fp32": "#1f77b4"}
        for (arm, seed), ((steps, vals), _) in sorted(runs.items()):
            ax.plot(steps, vals, lw=1.2, marker="o", ms=2.5,
                    color=colors[arm], alpha=0.8,
                    ls="-" if seed == 42 else "--",
                    label=f"{arm} seed{seed}")
        ax.set_xlabel("train step")
        ax.set_ylabel("val objective (weak F1 + intersection F1 + maestro)")
        ax.grid(alpha=0.25)
        ax.legend(fontsize=8)
        ax.set_title("fp32 (golden path) vs bf16+fused-Pallas (fast path), "
                     "matched corpus/schedule/seed")
        fig.tight_layout()
        fig.savefig(out / "curves.png", dpi=130)

    lines = [
        "| arm | seed | " + " | ".join(
            k.replace("_macro", "").replace("maestro_segment_", "m")
            for k in TEST_KEYS) + " |",
        "|" + "---|" * (2 + len(TEST_KEYS)),
    ]
    # battery rows: historical r4 pairs render alongside fresh runs (marked)
    # unless the same (arm, seed) was re-run fresh
    batteries = dict(HISTORICAL)
    batteries.update({k: t for k, (_, t) in runs.items()})
    for (arm, seed), test in sorted(batteries.items()):
        src = "" if (arm, seed) in runs else " (r4)"
        cells = [f"{test.get(k, float('nan')):.4f}" for k in TEST_KEYS]
        lines.append(f"| {arm}{src} | {seed} | " + " | ".join(cells) + " |")
    # per-seed deltas (fast - fp32)
    hist_only = sorted(s for a, s in HISTORICAL if (a, s) not in runs)
    seeds = sorted({s for _, s in batteries})
    deltas = {}
    for s in seeds:
        if ("bf16_fast", s) in batteries and ("fp32", s) in batteries:
            tf = batteries[("bf16_fast", s)]
            t3 = batteries[("fp32", s)]
            deltas[s] = {k: tf.get(k, 0) - t3.get(k, 0) for k in TEST_KEYS}
            src = " (r4)" if s in hist_only else ""
            cells = [f"{deltas[s][k]:+.4f}" for k in TEST_KEYS]
            lines.append(f"| delta (fast-fp32){src} | {s} | "
                         + " | ".join(cells) + " |")
    n = len(deltas)
    if n >= 2:
        import numpy as np

        mat = np.array([[deltas[s][k] for k in TEST_KEYS]
                        for s in sorted(deltas)])
        mean = mat.mean(0)
        half = T95[n - 1] * mat.std(0, ddof=1) / np.sqrt(n)
        lines.append(f"| mean delta (n={n}) | all | " + " | ".join(
            f"{m:+.4f}" for m in mean) + " |")
        lines.append("| 95% CI half-width | all | " + " | ".join(
            f"{h:.4f}" for h in half) + " |")
    (out / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
