"""Threshold-free (score-based) metric tests: exact change-point PSDS against
a fully hand-computed case, and equivalence with brute-force thresholding at
every distinct score value through the fixture-validated PSDSEval path."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from desed_task_tpu.inference.decode import create_score_dataframe
from desed_task_tpu.metrics.psds import PSDSEval
from desed_task_tpu.metrics.scores import (
    _clip_class_step_counts,
    collar_fscore_from_scores,
    compute_psds_from_scores,
    intersection_fscore_from_scores,
    scores_to_event_df,
)

META = Path("/root/reference/PSDS_Eval/meta")


def test_exact_psds_hand_computed():
    """One 10 s clip, classes Dog/Cat, every change point worked by hand.

    Dog gt [2,5] + [8.5,9.5]; scores .1,.2,.8,.8,.7,.1,.1,.6,.1,.1 on a 1 s
    grid. Thresholds {-inf,.1,.2,.6,.7,.8}:
      tau=-inf: one whole-clip detection, DTC 4/10 < .5 -> FP=1, TP=0
      tau=.1:  runs [1,5) (DTC 3/4 ok, covers gt1 fully -> TP=1) and
               [7,8) (DTC 0 -> FP=1)
      tau=.2:  runs [2,5) (TP=1) and [7,8) (FP=1)
      tau=.6:  run [2,5) only (s[7]=.6 is not > .6) -> TP=1, FP=0
      tau=.7:  run [2,4) -> DTC ok, GTC 2/3 >= .5 -> TP=1, FP=0
      tau=.8:  empty -> 0,0
    Dog TPR support: 0.5 at eFPR 0 (n_gt=2). Cat gt [6,8]; scores
    .1*6,.9,.4,.1,.1 -> TPR 1.0 at eFPR 0. PSDS(alpha_st=0) = mean(0.5, 1.0)
    = 0.75; alpha_st=1: 0.75 - std(=0.25) = 0.5."""
    ts = np.arange(11.0)
    dog = np.array([0.1, 0.2, 0.8, 0.8, 0.7, 0.1, 0.1, 0.6, 0.1, 0.1])
    cat = np.array([0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.9, 0.4, 0.1, 0.1])
    scores = {"clipA": create_score_dataframe(
        np.stack([cat, dog], 1), ts, ["Cat", "Dog"]
    )}
    gt = pd.DataFrame(
        [("clipA.wav", 2.0, 5.0, "Dog"), ("clipA.wav", 8.5, 9.5, "Dog"),
         ("clipA.wav", 6.0, 8.0, "Cat")],
        columns=["filename", "onset", "offset", "event_label"],
    )
    dur = pd.DataFrame([("clipA.wav", 10.0)], columns=["filename", "duration"])

    # per-threshold Dog counts, exactly as worked above
    taus, tp, fp, ct = _clip_class_step_counts(
        ts, dog,
        np.array([[2.0, 5.0], [8.5, 9.5]]),
        [(0, np.array([[6.0, 8.0]]))], 2, 0.5, 0.5, 0.3,
    )
    np.testing.assert_array_equal(taus, [-np.inf, 0.1, 0.2, 0.6, 0.7, 0.8])
    np.testing.assert_array_equal(tp, [0, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(fp, [1, 1, 1, 0, 0, 0])
    # cross-trigger: the failing [7,8) run at tau=.1/.2 overlaps Cat's gt
    # fully (ratio 1 >= .3); the whole-clip det overlaps 2/10 = .2 < .3
    np.testing.assert_array_equal(ct[:, 0], [0, 1, 1, 0, 0, 0])

    val = compute_psds_from_scores(scores, gt, dur, max_efpr=100.0)
    assert val == pytest.approx(0.75, abs=1e-12)
    val_st = compute_psds_from_scores(scores, gt, dur, alpha_st=1.0)
    assert val_st == pytest.approx(0.5, abs=1e-12)


@pytest.mark.parametrize("alpha_ct,cttc", [(0.0, None), (0.5, 0.3)])
def test_exact_psds_equals_bruteforce_all_thresholds(alpha_ct, cttc):
    """The exact change-point PSDS must equal brute-force evaluation of the
    fixture-validated PSDSEval over event tables thresholded at EVERY
    distinct score value (plus one below the minimum). Same detection
    convention (score > tau) on both paths -> identical PSD-ROC support."""
    rng = np.random.default_rng(0)
    classes = ["Cat", "Dog", "Speech"]
    scores, gt_rows, dur_rows = {}, [], []
    for k in range(8):
        n = int(rng.integers(6, 15))
        ts = np.round(np.cumsum(np.concatenate([[0.0], rng.uniform(0.3, 1.2, n)])), 3)
        arr = np.round(rng.random((n, 3)), 2)  # coarse -> many tied values
        scores[f"clip{k}"] = create_score_dataframe(arr, ts, classes)
        dur_rows.append((f"clip{k}.wav", float(ts[-1])))
        for c in classes:
            for _ in range(int(rng.integers(0, 3))):
                a = rng.uniform(0, ts[-1] * 0.8)
                b = a + rng.uniform(0.2, ts[-1] - a)
                gt_rows.append((f"clip{k}.wav", round(a, 2), round(b, 2), c))
    gt = pd.DataFrame(gt_rows, columns=["filename", "onset", "offset", "event_label"])
    dur = pd.DataFrame(dur_rows, columns=["filename", "duration"])

    exact = compute_psds_from_scores(
        scores, gt, dur, cttc_threshold=cttc, alpha_ct=alpha_ct, max_efpr=40.0
    )

    allv = np.unique(np.concatenate(
        [df[classes].to_numpy().ravel() for df in scores.values()]
    ))
    thresholds = np.concatenate([[allv[0] - 1.0], allv])
    ops = [scores_to_event_df(scores, float(th)) for th in thresholds]
    ev = PSDSEval(gt, dur, cttc_threshold=cttc)
    brute = ev.psds(ops, alpha_ct=alpha_ct, max_efpr=40.0)
    assert exact == pytest.approx(brute, abs=1e-12)


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
