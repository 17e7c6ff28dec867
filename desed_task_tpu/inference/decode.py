"""Prediction decoding: frame scores -> score DataFrames + event lists.

Re-designs the reference's per-clip/threshold pandas loop
(recipes/*/local/utils.py batched_decode_preds :34-92 — the eval-time CPU
bottleneck, SURVEY.md §3.1) as a vectorized pipeline:

  * median filtering is one numpy pass over the whole batch
    (ops/median.classwise_median_filter_np — same scipy-'reflect'
    semantics as the on-device op, without a device round trip);
  * event extraction for ALL clips/classes/thresholds is one padded
    np.diff + argwhere per threshold — no per-clip Python loops;
  * score curves can stay numpy end-to-end (``as_arrays=True``) for
    consumers like the MAESTRO overlap-add that convert DataFrames
    straight back to arrays.

Outputs mirror the reference contract: (scores_raw, scores_postprocessed,
prediction_dfs) with sed_scores_eval-style score DataFrames keyed by clip
stem and one event DataFrame per threshold.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import numpy as np
import pandas as pd

from ..labels.encoder import ManyHotEncoder
from ..labels.events import find_contiguous_regions
from ..ops.median import classwise_median_filter_np

EVENT_COLUMNS = ["event_label", "onset", "offset", "filename"]


class ScoreCurve(NamedTuple):
    """Numpy-native piecewise-constant score curve (the ``as_arrays=True``
    twin of a sed_scores_eval score DataFrame)."""

    timestamps: np.ndarray  # [T+1]
    values: np.ndarray  # [T, C]
    classes: tuple  # class name per column

    def select(self, event_classes) -> np.ndarray:
        """[T, len(event_classes)] values in the requested column order."""
        if tuple(event_classes) == tuple(self.classes):
            return self.values
        idx = [self.classes.index(c) for c in event_classes]
        return self.values[:, idx]

    def to_dataframe(self) -> pd.DataFrame:
        return create_score_dataframe(self.values, self.timestamps, self.classes)


def create_score_dataframe(scores, timestamps, event_classes) -> pd.DataFrame:
    """[T, C] scores + [T+1] timestamps -> DataFrame(onset, offset, classes)."""
    scores = np.asarray(scores)
    timestamps = np.asarray(timestamps)
    data = {"onset": timestamps[:-1], "offset": timestamps[1:]}
    for i, c in enumerate(event_classes):
        data[c] = scores[:, i]
    return pd.DataFrame(data)


def validate_score_dataframe(df: pd.DataFrame):
    classes = [c for c in df.columns if c not in ("onset", "offset")]
    timestamps = np.r_[df["onset"].to_numpy(), df["offset"].to_numpy()[-1]]
    return timestamps, classes


def as_score_curve(curve) -> ScoreCurve:
    """Normalize a DataFrame or ScoreCurve to a ScoreCurve (one conversion)."""
    if isinstance(curve, ScoreCurve):
        return curve
    ts, classes = validate_score_dataframe(curve)
    return ScoreCurve(ts, curve[classes].to_numpy(), tuple(classes))


def _events_from_activity(act: np.ndarray, encoder: ManyHotEncoder, filename: str):
    """[T, C] bool -> rows (event_label, onset, offset, filename).

    Kept for single-clip callers; the batched path below vectorizes this."""
    rows = []
    for c in range(act.shape[1]):
        regions = find_contiguous_regions(act[:, c])
        for a, b in regions:
            rows.append(
                (
                    encoder.labels[c],
                    float(encoder._frame_to_time(a)),
                    float(encoder._frame_to_time(b)),
                    filename,
                )
            )
    return rows


def _batched_events(
    post: np.ndarray,  # [B, C, T] scores
    threshold: float,
    encoder: ManyHotEncoder,
    filenames: list[str],
    true_lens: np.ndarray | None,
) -> pd.DataFrame:
    """Vectorized event extraction: one diff/argwhere for the whole batch.

    Row order matches the per-clip loop (clip-major, class-major, time)."""
    B, C, T = post.shape
    act = post > threshold
    if true_lens is not None:
        act &= np.arange(T)[None, None, :] < true_lens[:, None, None]
    padded = np.zeros((B, C, T + 2), np.int8)
    padded[:, :, 1:-1] = act
    d = np.diff(padded, axis=2)  # [B, C, T+1]; +1 at starts, -1 after ends
    starts = np.argwhere(d == 1)  # lexicographic (b, c, t) — clip/class-major
    ends = np.argwhere(d == -1)
    if not len(starts):
        return pd.DataFrame(columns=EVENT_COLUMNS)
    labels = np.asarray(encoder.labels, dtype=object)[starts[:, 1]]
    names = np.asarray(filenames, dtype=object)[starts[:, 0]]
    return pd.DataFrame(
        {
            "event_label": labels,
            "onset": encoder._frame_to_time(starts[:, 2]),
            "offset": encoder._frame_to_time(ends[:, 2]),
            "filename": names,
        }
    )


def batched_decode_preds(
    strong_preds,
    filenames,
    encoder: ManyHotEncoder,
    thresholds=(0.5,),
    median_filter=None,
    pad_indx=None,
    want_raw: bool = True,
    want_post: bool = True,
    as_arrays: bool = False,
    post_preds=None,
):
    """strong_preds: [B, C, T] scores (np or jax array).

    median_filter: None | per-class window list | callable([T, C])->[T, C].
    Returns (scores_raw, scores_postprocessed, prediction_dfs).

    ``want_raw``/``want_post`` gate the per-clip score-curve materialization
    — pure waste for callers that only consume event lists (e.g. the
    validation objective). ``as_arrays=True`` returns score curves as
    ScoreCurve numpy tuples instead of DataFrames (the overlap-add/
    segment-metric consumers take either). ``post_preds`` supplies already-
    postprocessed scores (e.g. median-filtered on device inside the predict
    dispatch) — median_filter is then ignored.
    """
    preds = np.asarray(strong_preds, np.float32)
    B, C, T = preds.shape
    if post_preds is not None:
        post_all = np.asarray(post_preds, np.float32)
    elif isinstance(median_filter, (list, tuple, np.ndarray)):
        post_all = classwise_median_filter_np(
            preds, median_filter, class_axis=-2, time_axis=-1
        )
    elif callable(median_filter):
        post_all = np.stack([median_filter(preds[j].T).T for j in range(B)])
    else:
        post_all = preds

    thresholds = list(thresholds)
    true_lens = None
    if pad_indx is not None:
        true_lens = np.asarray(
            [int(T * float(p)) for p in pad_indx], dtype=np.int64
        )

    audio_ids = [Path(f).stem for f in filenames]
    event_names = [aid + ".wav" for aid in audio_ids]

    scores_raw = {}
    scores_postprocessed = {}
    if want_raw or want_post:
        classes = tuple(encoder.labels)
        full_ts = encoder._frame_to_time(np.arange(T + 1))
        for j in range(B):
            t_len = T if true_lens is None else int(true_lens[j])
            ts = full_ts[: t_len + 1]
            if want_raw:
                scores_raw[audio_ids[j]] = (
                    ScoreCurve(ts, preds[j].T[:t_len].copy(), classes)
                    if as_arrays
                    else create_score_dataframe(
                        preds[j].T[:t_len], ts, encoder.labels
                    )
                )
            if want_post:
                scores_postprocessed[audio_ids[j]] = (
                    ScoreCurve(ts, post_all[j].T[:t_len].copy(), classes)
                    if as_arrays
                    else create_score_dataframe(
                        post_all[j].T[:t_len], ts, encoder.labels
                    )
                )

    prediction_dfs = {
        th: _batched_events(post_all, th, encoder, event_names, true_lens)
        for th in thresholds
    }
    return scores_raw, scores_postprocessed, prediction_dfs
