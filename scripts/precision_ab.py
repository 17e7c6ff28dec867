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
    if not runs:
        raise SystemExit(f"no finished runs under {root}")

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
    for (arm, seed), (_, test) in sorted(runs.items()):
        cells = [f"{test.get(k, float('nan')):.4f}" for k in TEST_KEYS]
        lines.append(f"| {arm} | {seed} | " + " | ".join(cells) + " |")
    # per-seed deltas (fast - fp32)
    seeds = sorted({s for _, s in runs})
    for s in seeds:
        if ("bf16_fast", s) in runs and ("fp32", s) in runs:
            tf = runs[("bf16_fast", s)][1]
            t3 = runs[("fp32", s)][1]
            cells = [f"{tf.get(k, 0) - t3.get(k, 0):+.4f}" for k in TEST_KEYS]
            lines.append(f"| delta (fast-fp32) | {s} | "
                         + " | ".join(cells) + " |")
    (out / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
