#!/usr/bin/env python
"""Snapshot ONE A/B run into the committed docs/ab_parity artifact.

The full-table renderer (scripts/ab_compare.py) rebuilds summary.md from
every run dir under --root; but /root/ab_data is wiped between sessions, so
once earlier run dirs are gone a full rebuild would clobber their committed
rows. This tool updates (or appends) a SINGLE run's row in summary.md in
place and copies its raw logs into docs/ab_parity/runs/<name>/ so the
evidence survives host reclamation.

    python scripts/ab_snapshot_run.py /root/ab_data/exp/torch_seed43 \
        [--out docs/ab_parity]
"""

import argparse
import shutil
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ab_compare import load_run, summary_row  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--out", default="docs/ab_parity")
    args = p.parse_args()
    run_dir = Path(args.run_dir)
    out = Path(args.out)
    name = run_dir.name

    if not (run_dir / "metrics.csv").exists():
        raise SystemExit(f"no metrics.csv under {run_dir} — not a run dir")
    row = summary_row(name, load_run(run_dir))
    summary = out / "summary.md"
    lines = summary.read_text().splitlines()
    key = f"| {name} |"
    hit = [i for i, ln in enumerate(lines) if ln.startswith(key)]
    if hit:
        lines[hit[0]] = row
    else:
        lines.append(row)
    summary.write_text("\n".join(lines) + "\n")

    keep = out / "runs" / name
    keep.mkdir(parents=True, exist_ok=True)
    for fname in ("metrics.csv", "test_results.json"):
        src = run_dir / fname
        if src.exists():
            shutil.copy2(src, keep / fname)
    print(row)
    print(f"raw logs -> {keep}")


if __name__ == "__main__":
    main()
