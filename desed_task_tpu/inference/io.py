"""Score/prediction artifact I/O.

Replaces the sed_scores_eval.io functions the reference uses for eval-mode
score dumps (sed_trainer_pretrained.py:929-971: write_sed_scores trees for
student/teacher raw + postprocessed scores) and the prediction tsv writers
(evaluation_measures.py:231-253).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd


def write_sed_scores(scores: dict, out_dir) -> int:
    """{clip_id: score DataFrame(onset, offset, class...)} -> one tsv per clip."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for clip_id, df in scores.items():
        df.to_csv(out_dir / f"{clip_id}.tsv", sep="\t", index=False)
    return len(scores)


def read_sed_scores(in_dir) -> dict:
    in_dir = Path(in_dir)
    return {
        p.stem: pd.read_csv(p, sep="\t") for p in sorted(in_dir.glob("*.tsv"))
    }


def write_predictions(prediction_dfs: dict, out_dir, prefix: str = "predictions_th") -> list:
    """{threshold: event DataFrame} -> predictions_th_<th>.tsv files (the
    operating-point layout of PSDS_Eval/meta/metrics_test)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for th, df in prediction_dfs.items():
        path = out_dir / f"{prefix}_{th:.2f}.tsv"
        df.to_csv(path, sep="\t", index=False)
        written.append(path)
    return written


def read_ground_truth_events(tsv: pd.DataFrame) -> dict:
    """DataFrame(filename, onset, offset, event_label) ->
    {clip_stem: [(onset, offset, label), ...]} (sed_scores_eval.io layout)."""
    out: dict = {}
    for fname, on, off, lab in zip(
        tsv["filename"], tsv["onset"], tsv["offset"], tsv["event_label"]
    ):
        stem = str(Path(fname).stem)
        if lab == lab and lab is not None:
            out.setdefault(stem, []).append((float(on), float(off), str(lab)))
        else:
            out.setdefault(stem, [])
    return out
