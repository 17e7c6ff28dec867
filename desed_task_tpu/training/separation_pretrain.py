"""MixIT pretraining loop for the TDCN++ separator on unlabeled audio.

The reference ships separation as a frozen Google TF1 checkpoint
(recipes/dcase2021_task4_baseline/local/apply_separation_model.py) — the
MixIT training that produced it happened outside the repo. This module makes
that stage reproducible in-framework: unsupervised mixture-invariant training
(training/mixit.py objective) of models/tdcn.py on any folder of unlabeled
wavs, with a supervised-free validation signal (SI-SNRi on synthetic
two-source mixtures built from held-out clips, metrics/separation.py).

TPU shape discipline: clips are cropped host-side to one fixed segment
length, so the jitted train step compiles once; the mixture-of-mixtures
pairing, the 2^M assignment search, gradients, and Adam all run in a single
XLA program per step.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax.serialization import msgpack_serialize

from ..data.audio_io import read_audio
from ..metrics.separation import si_snr_improvement
from ..models.tdcn import TDCNPP
from ..obs.logging import MetricsLogger
from .mixit import mixit_loss, mixture_of_mixtures


@dataclasses.dataclass(frozen=True)
class MixITPretrainConfig:
    n_src: int = 4
    segment_len: int = 64000      # 4 s at 16 kHz
    batch_mixtures: int = 16      # per step, paired into batch_mixtures//2 MoMs
    lr: float = 1e-3
    grad_clip: float = 5.0
    snr_max: float = 30.0
    steps_per_epoch: int = 100
    n_epochs: int = 10
    val_pairs: int = 32           # synthetic eval mixtures per validation
    seed: int = 0


class _SegmentPool:
    """Host-side pool of fixed-length segments cropped from a wav folder.

    Clips shorter than segment_len are tiled; longer ones yield random
    crops. Loading is one pass at construction (decoded audio stays in RAM —
    the corpus sizes this recipe targets fit easily; cf. the device-resident
    cache used by the SED loops, data/device_cache.py)."""

    def __init__(self, folders: Sequence[str | Path], segment_len: int,
                 fs: int = 16000, limit: int | None = None):
        self.segment_len = segment_len
        self.clips: list[np.ndarray] = []
        for folder in folders:
            wavs = sorted(Path(folder).glob("*.wav"))
            if limit is not None:
                wavs = wavs[: max(limit - len(self.clips), 0)]
            for w in wavs:
                audio, *_ = read_audio(w, target_fs=fs)
                if audio.shape[-1] < segment_len:
                    reps = -(-segment_len // audio.shape[-1])
                    audio = np.tile(audio, reps)
                self.clips.append(audio.astype(np.float32))
        if not self.clips:
            raise FileNotFoundError(f"no wavs under {list(folders)}")

    def sample(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """[n, segment_len] random crops from random clips."""
        out = np.empty((n, self.segment_len), np.float32)
        idx = rng.integers(0, len(self.clips), n)
        for row, i in enumerate(idx):
            clip = self.clips[i]
            start = rng.integers(0, clip.shape[-1] - self.segment_len + 1)
            out[row] = clip[start : start + self.segment_len]
        return out

    def fixed_pairs(self, n_pairs: int, seed: int) -> np.ndarray:
        """[n_pairs, 2, segment_len] deterministic source pairs for eval."""
        rng = np.random.default_rng(seed)
        return self.sample(2 * n_pairs, rng).reshape(n_pairs, 2, -1)


def make_mixit_train_step(model: TDCNPP, cfg: MixITPretrainConfig, tx):
    """Jitted (params, opt_state, audio [2B, N]) -> (params', opt_state', metrics)."""

    def step(params, opt_state, audio):
        moms, pairs = mixture_of_mixtures(audio)

        def loss_fn(p):
            est = model.apply(p, moms)
            loss, idx = mixit_loss(est, pairs, cfg.snr_max)
            return loss, idx

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(model: TDCNPP):
    """Jitted (params, sources [B, 2, N]) -> mean SI-SNRi over the batch."""

    def step(params, sources):
        mixture = sources.sum(1)
        est = model.apply(params, mixture)
        return si_snr_improvement(sources, est, mixture).mean()

    return jax.jit(step)


def pretrain_separator(
    train_folders: Sequence[str | Path],
    val_folders: Sequence[str | Path],
    log_dir: str | Path,
    cfg: MixITPretrainConfig = MixITPretrainConfig(),
    model_kwargs: dict | None = None,
    limit_clips: int | None = None,
) -> tuple[dict, Path]:
    """Run MixIT pretraining; returns (final variables, best-params msgpack path).

    The saved msgpack loads directly into tools/separation.py
    JaxSeparationModel (and therefore the 2021 run_separation.py --backend
    jax CLI) — the in-framework replacement for Google's released TF1
    checkpoint."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    model = TDCNPP(n_src=cfg.n_src, **(model_kwargs or {}))
    rng = np.random.default_rng(cfg.seed)

    pool = _SegmentPool(train_folders, cfg.segment_len, limit=limit_clips)
    val_pool = _SegmentPool(val_folders, cfg.segment_len, limit=limit_clips)
    val_sources = jnp.asarray(val_pool.fixed_pairs(cfg.val_pairs, cfg.seed))

    params = model.init(
        jax.random.key(cfg.seed),
        jnp.zeros((1, cfg.segment_len), jnp.float32),
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip), optax.adam(cfg.lr)
    )
    opt_state = tx.init(params)
    train_step = make_mixit_train_step(model, cfg, tx)
    eval_step = make_eval_step(model)

    logger = MetricsLogger(log_dir)
    logger.log_hparams(dataclasses.asdict(cfg))
    best_path = log_dir / "tdcn_mixit_best.msgpack"
    best_si_snri = -np.inf
    step_no = 0
    for epoch in range(cfg.n_epochs):
        t0 = time.time()
        for _ in range(cfg.steps_per_epoch):
            audio = jnp.asarray(pool.sample(cfg.batch_mixtures, rng))
            params, opt_state, metrics = train_step(params, opt_state, audio)
            step_no += 1
        loss = float(metrics["loss"])
        si_snri = float(eval_step(params, val_sources))
        logger.log_scalars(step_no, {
            "train/mixit_loss": loss,
            "val/si_snri_db": si_snri,
            "train/epoch_seconds": time.time() - t0,
        })
        print(f"[mixit] epoch {epoch}: loss={loss:.3f} "
              f"val SI-SNRi={si_snri:.2f} dB", flush=True)
        if si_snri > best_si_snri:
            best_si_snri = si_snri
            best_path.write_bytes(msgpack_serialize(
                jax.tree_util.tree_map(np.asarray, params)
            ))
    logger.close()
    return params, best_path
