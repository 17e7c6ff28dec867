"""Label codec: seconds <-> frame-grid multi-hot matrices.

Capability-parity re-design of desed_task/utils/encoder.py (ManyHotEncoder
:11-231, CatManyHotEncoder :234-275) without the dcase_util / pandas-heavy
inner loops: strong encoding is vectorized over all events of a clip at once,
and decoding uses the vectorized run-length pass in labels/events.py.

Frame math being preserved exactly (encoder.py:39-40, 71-78):
    n_frames      = int(int(audio_len * fs / frame_hop) / net_pooling)
    time_to_frame = clip(time * fs / frame_hop / net_pooling, 0, n_frames)
    frame_to_time = clip(frame * net_pooling * frame_hop / fs, 0, audio_len)
Event rows fill y[int(t2f(onset)) : int(ceil(t2f(offset))), class] = conf.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Iterable, Sequence

import numpy as np


class ManyHotEncoder:
    def __init__(
        self,
        labels: Sequence[str],
        audio_len: float,
        frame_len: int,
        frame_hop: int,
        net_pooling: int = 1,
        fs: int = 16000,
    ):
        if isinstance(labels, np.ndarray):
            labels = labels.tolist()
        elif isinstance(labels, (dict, OrderedDict)):
            labels = list(labels.keys())
        self.labels = list(labels)
        self.audio_len = audio_len
        self.frame_len = frame_len
        self.frame_hop = frame_hop
        self.fs = fs
        self.net_pooling = net_pooling
        n_samples = self.audio_len * self.fs
        self.n_frames = int(int(n_samples / self.frame_hop) / self.net_pooling)
        self._index = {l: i for i, l in enumerate(self.labels)}

    # --- frame math -------------------------------------------------------
    def _time_to_frame(self, time):
        frame = np.asarray(time, dtype=np.float64) * self.fs / self.frame_hop
        return np.clip(frame / self.net_pooling, a_min=0, a_max=self.n_frames)

    def _frame_to_time(self, frame):
        t = np.asarray(frame, dtype=np.float64) * self.net_pooling * self.frame_hop / self.fs
        return np.clip(t, a_min=0, a_max=self.audio_len)

    # --- weak labels ------------------------------------------------------
    def encode_weak(self, labels) -> np.ndarray:
        """List of class names (or comma-joined string) -> multi-hot [C].

        The sentinel string "empty" returns all -1 (used by unlabeled data),
        matching encoder.py:54-57.
        """
        if isinstance(labels, str):
            if labels == "empty":
                return np.zeros(len(self.labels)) - 1
            labels = labels.split(",")
        y = np.zeros(len(self.labels))
        for label in labels:
            if label is not None and label == label and label != "":  # skips NaN
                y[self._index[label]] = 1
        return y

    def decode_weak(self, y) -> list[str]:
        return [self.labels[i] for i, v in enumerate(np.asarray(y)) if v == 1]

    # --- strong labels ----------------------------------------------------
    def encode_strong(
        self, events: Iterable, confidences: Iterable | None = None
    ) -> np.ndarray:
        """Encode events -> [n_frames, C].

        `events` may be:
          * the string "empty"  -> all -1 (unlabeled sentinel)
          * an iterable of (label, onset_sec, offset_sec[, confidence]) tuples
          * an iterable of bare label strings -> active on all frames
          * a pandas DataFrame with event_label/onset/offset[/confidence] cols
        """
        y = np.zeros((self.n_frames, len(self.labels)), dtype=np.float64)
        if isinstance(events, str):
            if events == "empty":
                return y - 1
            raise ValueError(f"unknown sentinel {events!r}")
        rows = self._normalize_events(events, confidences)
        for label, onset, offset, conf in rows:
            i = self._index[label]
            a = int(self._time_to_frame(onset))
            b = int(np.ceil(self._time_to_frame(offset)))
            y[a:b, i] = conf
        return y

    # Back-compat alias mirroring the reference API name.
    def encode_strong_df(self, label_df) -> np.ndarray:
        return self.encode_strong(label_df)

    def _normalize_events(self, events, confidences):
        rows = []
        if _is_dataframe(events):
            df = events
            has_conf = "confidence" in df.columns
            if {"onset", "offset", "event_label"}.issubset(df.columns):
                labs = df["event_label"].to_numpy()
                ons = df["onset"].to_numpy()
                offs = df["offset"].to_numpy()
                confs = df["confidence"].to_numpy() if has_conf else np.ones(len(df))
                for l, a, b, c in zip(labs, ons, offs, confs):
                    if l == l and l is not None:  # NaN-safe
                        rows.append((l, float(a), float(b), float(c)))
                return rows
            raise ValueError("DataFrame must have onset/offset/event_label")
        for ev in events:
            if isinstance(ev, str):
                if ev != "":
                    rows.append((ev, 0.0, self.audio_len, 1.0))
            elif len(ev) == 3:
                if ev[0] != "":
                    rows.append((ev[0], float(ev[1]), float(ev[2]), 1.0))
            elif len(ev) == 4:
                if ev[0] != "":
                    rows.append((ev[0], float(ev[1]), float(ev[2]), float(ev[3])))
            else:
                raise NotImplementedError(f"cannot encode event {ev!r}")
        return rows

    def decode_strong(self, y: np.ndarray) -> list[list]:
        """[n_frames, C] (or [C, n_frames] like reference's labels.T walk is
        handled by the caller) -> [[label, onset_sec, offset_sec], ...]."""
        from .events import decode_strong_array

        return decode_strong_array(
            np.asarray(y), self.labels, frame_to_time=lambda f: self._frame_to_time(f)
        )

    # --- persistence ------------------------------------------------------
    def state_dict(self):
        return {
            "labels": self.labels,
            "audio_len": self.audio_len,
            "frame_len": self.frame_len,
            "frame_hop": self.frame_hop,
            "net_pooling": self.net_pooling,
            "fs": self.fs,
        }

    @classmethod
    def load_state_dict(cls, state):
        return cls(
            state["labels"],
            state["audio_len"],
            state["frame_len"],
            state["frame_hop"],
            state["net_pooling"],
            state["fs"],
        )


class CatManyHotEncoder(ManyHotEncoder):
    """Concatenation of encoders over disjoint-or-overlapping label spaces.

    Duplicated labels are deduplicated keeping first occurrence order, exactly
    like the reference (encoder.py:249-263). All encoders must agree on the
    frame-grid parameters.
    """

    def __init__(self, encoders: Sequence[ManyHotEncoder], allow_same_classes=True):
        assert len(encoders) > 0, "encoders list must not be empty."
        first = encoders[0]
        for enc in encoders:
            for attr in ("audio_len", "frame_len", "frame_hop", "net_pooling", "fs"):
                assert getattr(first, attr) == getattr(enc, attr), (
                    "Encoders must share frame-grid args (fs, hop, ...)"
                )
        total = []
        seen = set()
        dup = False
        for enc in encoders:
            for label in enc.labels:
                if label in seen:
                    dup = True
                    continue
                seen.add(label)
                total.append(label)
        if dup and not allow_same_classes:
            raise RuntimeError("Encoders must not have classes in common.")
        super().__init__(
            total,
            first.audio_len,
            first.frame_len,
            first.frame_hop,
            first.net_pooling,
            first.fs,
        )


def _is_dataframe(obj) -> bool:
    return type(obj).__name__ == "DataFrame" and hasattr(obj, "columns")
