"""Synthetic soundscape generation (scaper-equivalent, host-side).

Re-designs the reference's scaper-based DESED synthesis
(recipes/dcase2021_task4_baseline/generate_dcase_task4_2021.py:275-600):
foreground events from a class-organized soundbank are placed over
backgrounds with truncated-normal event counts, uniform onsets, uniform
SNR in [6, 30] dB against a reference level, then the mixture is
peak-protected and strong labels are emitted as a DESED-style tsv.

Documented simplifications vs scaper (which is not installable here):
  * loudness is RMS-dB based rather than LUFS;
  * pitch/time-stretch augmentations are not applied (scaper shells out to
    rubberband; the reference uses ±3 semitones).
The output format (wav + filename/onset/offset/event_label tsv) is exactly
what the data layer consumes, so generated data drops into training.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np
import pandas as pd


@dataclasses.dataclass
class SoundscapeConfig:
    duration: float = 10.0
    fs: int = 16000
    ref_db: float = -50.0
    snr_range: tuple[float, float] = (6.0, 30.0)
    event_count_mean: float = 3.0
    event_count_std: float = 2.0
    max_events: int = 5
    min_event_dur: float = 0.25


def _rms_db(x: np.ndarray) -> float:
    rms = np.sqrt(np.mean(np.square(x)) + 1e-12)
    return 20.0 * np.log10(rms + 1e-12)


def _scale_to_db(x: np.ndarray, target_db: float) -> np.ndarray:
    gain = 10.0 ** ((target_db - _rms_db(x)) / 20.0)
    return x * gain


class SoundscapeGenerator:
    """fg_folder: class-named subfolders of event wavs; bg_folder: wavs."""

    def __init__(self, fg_folder, bg_folder, cfg: SoundscapeConfig = SoundscapeConfig(), seed=42):
        from ..data.audio_io import read_wav, to_mono

        self._read = read_wav
        self._mono = to_mono
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.fg: dict[str, list[Path]] = {}
        for class_dir in sorted(Path(fg_folder).iterdir()):
            if class_dir.is_dir():
                wavs = sorted(class_dir.glob("*.wav"))
                if wavs:
                    self.fg[class_dir.name] = wavs
        self.bg = (
            sorted(Path(bg_folder).glob("*.wav")) if bg_folder is not None else []
        )
        if not self.fg:
            raise ValueError(f"no foreground classes found under {fg_folder}")

    def _load(self, path) -> np.ndarray:
        audio, fs = self._read(path)
        audio = self._mono(audio)
        if fs != self.cfg.fs:
            from ..data.audio_io import resample

            audio = resample(audio, fs, self.cfg.fs)
        return audio.astype(np.float32)

    def _background(self, n: int) -> np.ndarray:
        if not self.bg:
            return np.zeros(n, np.float32)
        bg = self._load(self.rng.choice(self.bg))
        if len(bg) < n:  # loop
            reps = int(np.ceil(n / len(bg)))
            bg = np.tile(bg, reps)
        start = self.rng.integers(0, max(len(bg) - n, 1))
        return _scale_to_db(bg[start : start + n], self.cfg.ref_db)

    def _n_events(self) -> int:
        # truncated normal on [0, max_events] (generate_dcase_task4_2021.py)
        v = self.rng.normal(self.cfg.event_count_mean, self.cfg.event_count_std)
        return int(np.clip(round(v), 0, self.cfg.max_events))

    def generate_one(self, name: str):
        cfg = self.cfg
        n = int(cfg.duration * cfg.fs)
        mix = self._background(n)
        bg_db = _rms_db(mix) if self.bg else cfg.ref_db
        events = []
        for _ in range(self._n_events()):
            label = self.rng.choice(list(self.fg.keys()))
            src = self._load(self.rng.choice(self.fg[label]))
            if len(src) < int(cfg.min_event_dur * cfg.fs):
                continue
            max_len = min(len(src), n)
            seg_len = self.rng.integers(int(cfg.min_event_dur * cfg.fs), max_len + 1)
            s0 = self.rng.integers(0, len(src) - seg_len + 1)
            seg = src[s0 : s0 + seg_len]
            snr = self.rng.uniform(*cfg.snr_range)
            seg = _scale_to_db(seg, bg_db + snr)
            onset = int(self.rng.integers(0, n - seg_len + 1))
            mix[onset : onset + seg_len] += seg
            events.append(
                {
                    "filename": f"{name}.wav",
                    "onset": round(onset / cfg.fs, 3),
                    "offset": round((onset + seg_len) / cfg.fs, 3),
                    "event_label": label,
                }
            )
        peak = np.abs(mix).max()
        if peak > 0.99:  # peak protection
            mix = mix * (0.99 / peak)
        return mix, events

    def generate(self, n_soundscapes: int, out_audio_folder, out_tsv):
        from ..data.audio_io import write_wav

        out_audio_folder = Path(out_audio_folder)
        out_audio_folder.mkdir(parents=True, exist_ok=True)
        all_events = []
        for i in range(n_soundscapes):
            name = f"soundscape_{i:05d}"
            mix, events = self.generate_one(name)
            write_wav(out_audio_folder / f"{name}.wav", mix, self.cfg.fs)
            if events:
                all_events.extend(events)
            else:  # empty soundscape still gets a row with NaN label
                all_events.append(
                    {"filename": f"{name}.wav", "onset": np.nan, "offset": np.nan,
                     "event_label": np.nan}
                )
        df = pd.DataFrame(all_events, columns=["filename", "onset", "offset", "event_label"])
        Path(out_tsv).parent.mkdir(parents=True, exist_ok=True)
        df.to_csv(out_tsv, sep="\t", index=False)
        return df
