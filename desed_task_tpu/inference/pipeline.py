"""High-throughput SED inference pipeline.

The serving-shaped path of BASELINE.json ("streaming eval set -> mel ->
CRNN(+BEATs) -> median filter -> PSDS scoring"): wav decode runs in the
native C++ batch loader (or a thread pool) overlapping the TPU, the jitted
forward fuses mel + model + per-class median filter + the FULL threshold
sweep on device, and only the boolean activity tensor crosses to host where
events are materialized with vectorized run-length extraction. Static batch
shapes: the final partial batch is zero-padded.

Outputs match batched_decode_preds' contract (per-threshold event DataFrames
+ score curves) so the PSDS battery consumes them directly.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..labels.encoder import ManyHotEncoder
from ..labels.events import find_contiguous_regions
from ..ops.frontend import MelConfig, amplitude_to_db, mel_spectrogram
from ..ops.median import classwise_median_filter
from ..ops.scaler import ScalerConfig, apply_scaler


class InferencePipeline:
    def __init__(
        self,
        model,
        variables: dict,
        encoder: ManyHotEncoder,
        mel_cfg: MelConfig = MelConfig(),
        scaler_cfg: ScalerConfig = ScalerConfig(),
        scaler_state=None,
        median_filter=None,  # per-class window list
        thresholds=(0.5,),
        batch_size: int = 64,
        embedder=None,  # optional (apply_fn, variables) in-graph frozen embedder
        num_workers: int = 8,
    ):
        self.model = model
        self.variables = variables
        self.encoder = encoder
        self.mel_cfg = mel_cfg
        self.scaler_cfg = scaler_cfg
        self.scaler_state = scaler_state
        self.median = (
            tuple(int(m) for m in median_filter) if median_filter is not None else None
        )
        self.thresholds = tuple(float(t) for t in thresholds)
        self.batch_size = batch_size
        self.embedder = embedder
        self.num_workers = num_workers
        self.pad_to = int(encoder.audio_len * encoder.fs)
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, audio, embeddings=None):
        x = amplitude_to_db(mel_spectrogram(audio, self.mel_cfg), self.mel_cfg)
        x = apply_scaler(x, self.scaler_cfg, self.scaler_state)
        kwargs = {}
        if self.embedder is not None and embeddings is None:
            e_apply, e_vars = self.embedder
            kwargs["embeddings"] = e_apply(e_vars, audio)["frame"]
        elif embeddings is not None:
            kwargs["embeddings"] = embeddings
        strong, weak = self.model.apply(self.variables, x, train=False, **kwargs)
        if self.median is not None:
            strong = classwise_median_filter(
                strong, self.median, class_axis=-2, time_axis=-1
            )
        ths = jnp.asarray(self.thresholds, strong.dtype)
        # [n_th, B, C, T] boolean activity for the whole sweep, on device
        activity = strong[None] > ths[:, None, None, None]
        return strong, weak, activity

    def _load_batch(self, paths):
        from ..data import native
        from ..data.audio_io import read_audio

        if native.available():
            try:
                audio, _ = native.decode_batch(paths, self.pad_to, test_mode=True)
                return audio
            except (ValueError, RuntimeError):
                pass
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            rows = list(
                pool.map(
                    lambda p: read_audio(p, pad_to=self.pad_to, test=True)[0], paths
                )
            )
        return np.stack(rows)

    def run(self, wav_files, embeddings_lookup=None):
        """Process files -> (scores dict, weak dict, {threshold: event df}).

        embeddings_lookup: optional callable(stems) -> np [b, E, T_e] for
        precomputed-embedding models.
        """
        wav_files = [str(p) for p in wav_files]
        rows_per_th: dict[float, list] = {t: [] for t in self.thresholds}
        scores = {}
        weak_out = {}
        B = self.batch_size
        # simple software pipeline: decode batch k+1 on host threads while
        # batch k computes on device
        with ThreadPoolExecutor(max_workers=1) as loader:
            future = loader.submit(self._load_batch, wav_files[:B])
            for start in range(0, len(wav_files), B):
                chunk = wav_files[start : start + B]
                audio = future.result()
                if start + B < len(wav_files):
                    future = loader.submit(
                        self._load_batch, wav_files[start + B : start + 2 * B]
                    )
                if len(chunk) < B:  # pad final batch to the static shape
                    audio = np.concatenate(
                        [audio, np.zeros((B - len(chunk), self.pad_to), np.float32)]
                    )
                kwargs = {}
                if embeddings_lookup is not None:
                    stems = [Path(p).stem for p in chunk]
                    emb = embeddings_lookup(stems)
                    if len(chunk) < B:
                        emb = np.concatenate(
                            [emb, np.zeros((B - len(chunk), *emb.shape[1:]), emb.dtype)]
                        )
                    kwargs["embeddings"] = jnp.asarray(emb)
                strong, weak, activity = self._forward(jnp.asarray(audio), **kwargs)
                act = np.asarray(activity)[:, : len(chunk)]  # [n_th, b, C, T]
                strong_np = np.asarray(strong)[: len(chunk)]
                weak_np = np.asarray(weak)[: len(chunk)]
                for j, path in enumerate(chunk):
                    stem = Path(path).stem
                    scores[stem] = strong_np[j]
                    weak_out[stem] = weak_np[j]
                    for ti, th in enumerate(self.thresholds):
                        for c in range(act.shape[2]):
                            for a, b in find_contiguous_regions(act[ti, j, c]):
                                rows_per_th[th].append(
                                    (
                                        self.encoder.labels[c],
                                        float(self.encoder._frame_to_time(a)),
                                        float(self.encoder._frame_to_time(b)),
                                        stem + ".wav",
                                    )
                                )
        dfs = {
            th: pd.DataFrame(
                rows, columns=["event_label", "onset", "offset", "filename"]
            )
            for th, rows in rows_per_th.items()
        }
        return scores, weak_out, dfs
