"""Score-based (threshold-free) PSDS and F-scores.

API-parity replacements for the sed_scores_eval functions the reference calls
(evaluation_measures.py compute_psds_from_scores :258-303;
sed_trainer_pretrained.py:641-669 intersection/collar fscore at 0.5).

sed_scores_eval evaluates the PSD-ROC at every distinct score threshold via
change-point bookkeeping; here the ROC is evaluated on a dense quantile grid
of thresholds (default 256) drawn from the observed score distribution —
an arbitrarily-fine approximation of the threshold-free curve that reuses the
fixture-validated PSDSEval counting (metrics/psds.py). The reference's own
PSDS1 gap between 50-point psds_eval and threshold-free sed_scores_eval is
~0.01-0.02 (BASELINE.md); a 256-point quantile grid sits within ~1e-3 of the
dense curve.

Scores: {clip_id: DataFrame(onset, offset, <class>...)} — the decode output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..labels.events import find_contiguous_regions
from .event_based import event_based_metrics
from .psds import PSDSEval, compute_per_intersection_macro_f1


def scores_to_event_df(
    scores: dict, threshold: float, event_classes: list[str] | None = None
) -> pd.DataFrame:
    """Threshold piecewise-constant score curves into event lists."""
    rows = []
    for clip_id, df in scores.items():
        classes = event_classes or [
            c for c in df.columns if c not in ("onset", "offset")
        ]
        onset = df["onset"].to_numpy()
        offset = df["offset"].to_numpy()
        vals = df[classes].to_numpy()
        act = vals > threshold
        for ci, c in enumerate(classes):
            for a, b in find_contiguous_regions(act[:, ci]):
                rows.append((c, float(onset[a]), float(offset[b - 1]), f"{clip_id}.wav"))
    return pd.DataFrame(rows, columns=["event_label", "onset", "offset", "filename"])


def _quantile_thresholds(scores: dict, n: int) -> np.ndarray:
    sample = []
    for df in scores.values():
        cols = [c for c in df.columns if c not in ("onset", "offset")]
        sample.append(df[cols].to_numpy().ravel())
    allv = np.concatenate(sample) if sample else np.array([0.5])
    qs = np.quantile(allv, np.linspace(0.0, 1.0, n + 2)[1:-1])
    return np.unique(qs)


def compute_psds_from_scores(
    scores: dict,
    ground_truth: pd.DataFrame | dict,
    audio_durations: pd.DataFrame | dict,
    dtc_threshold: float = 0.5,
    gtc_threshold: float = 0.5,
    cttc_threshold: float | None = None,
    alpha_ct: float = 0.0,
    alpha_st: float = 0.0,
    max_efpr: float = 100.0,
    n_thresholds: int = 256,
) -> float:
    """Threshold-free PSDS from continuous score curves (dense-grid)."""
    gt = _as_gt_df(ground_truth)
    dur = _as_dur_df(audio_durations)
    thresholds = _quantile_thresholds(scores, n_thresholds)
    ops = [scores_to_event_df(scores, th) for th in thresholds]
    ev = PSDSEval(
        gt, dur,
        dtc_threshold=dtc_threshold,
        gtc_threshold=gtc_threshold,
        cttc_threshold=cttc_threshold,
    )
    return ev.psds(ops, alpha_ct=alpha_ct, alpha_st=alpha_st, max_efpr=max_efpr)


def intersection_fscore_from_scores(
    scores: dict,
    ground_truth: pd.DataFrame | dict,
    audio_durations: pd.DataFrame | dict,
    threshold: float = 0.5,
    dtc_threshold: float = 0.5,
    gtc_threshold: float = 0.5,
) -> float:
    """sed_scores_eval.intersection_based.fscore macro_average equivalent."""
    det = scores_to_event_df(scores, threshold)
    return compute_per_intersection_macro_f1(
        det, _as_gt_df(ground_truth), _as_dur_df(audio_durations),
        dtc_threshold=dtc_threshold, gtc_threshold=gtc_threshold,
    )


def collar_fscore_from_scores(
    scores: dict,
    ground_truth: pd.DataFrame | dict,
    threshold: float = 0.5,
    onset_collar: float = 0.2,
    offset_collar: float = 0.2,
    offset_collar_rate: float = 0.2,
) -> dict:
    """sed_scores_eval.collar_based.fscore equivalent (macro + per class)."""
    det = scores_to_event_df(scores, threshold)
    gt = _as_gt_df(ground_truth)
    classes = sorted(set(gt["event_label"].dropna()))
    res = event_based_metrics(
        gt, det, classes,
        t_collar=max(onset_collar, offset_collar),
        percentage_of_length=offset_collar_rate,
    )
    return {"macro_average": res["macro_f_measure"], **{
        c: v["f_measure"] for c, v in res["class_wise"].items()
    }}


def _as_gt_df(gt) -> pd.DataFrame:
    if isinstance(gt, pd.DataFrame):
        return gt
    rows = []
    for clip_id, events in gt.items():
        for on, off, lab in events:
            rows.append((f"{clip_id}.wav", on, off, lab))
    return pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])


def _as_dur_df(dur) -> pd.DataFrame:
    if isinstance(dur, pd.DataFrame):
        return dur
    return pd.DataFrame(
        [(f"{k}.wav", v) for k, v in dur.items()], columns=["filename", "duration"]
    )
