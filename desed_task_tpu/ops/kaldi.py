"""Kaldi-compatible log-mel filterbank features (for BEATs / AST).

Replaces torchaudio.compliance.kaldi.fbank as used by the BEATs preprocessor
(recipes/dcase2024_task4_baseline/local/beats/BEATs.py:141-153: waveform *
2^15 -> fbank(num_mel_bins=128, frame_length=25ms, frame_shift=10ms) ->
(x - 15.41663) / (2 * 6.55582)) and the AST dataloader
(train_pretrained.py 2024:209-247).

Kaldi conventions implemented (torchaudio kaldi defaults):
  snip_edges=True (frames fully inside the signal; n = 1 + (N - 400) // 160
  at 16 kHz), per-frame DC removal, pre-emphasis 0.97 with edge replication,
  povey window ((0.5 - 0.5 cos)^0.85), round-to-power-of-two FFT (512),
  power spectrum, mel scale 1127*ln(1+f/700), low=20 Hz, high=Nyquist,
  natural-log output floored at float eps, dither=0.
"""

from __future__ import annotations

import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = sys.float_info.epsilon


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def povey_window(n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * t / (n - 1))) ** 0.85


def kaldi_window(n: int, window_type: str = "povey") -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    if window_type == "povey":
        return povey_window(n)
    if window_type == "hanning":
        return 0.5 - 0.5 * np.cos(2.0 * math.pi * t / (n - 1))
    if window_type == "hamming":
        return 0.54 - 0.46 * np.cos(2.0 * math.pi * t / (n - 1))
    raise ValueError(f"unknown kaldi window {window_type!r}")


def kaldi_mel_banks(
    num_bins: int,
    fft_len: int,
    sample_rate: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """[n_fft//2, num_bins] triangular weights, Kaldi-style (no Nyquist bin)."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    mel_low = mel(low_freq)
    mel_high = mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    # fft bin frequencies (kaldi drops the Nyquist bin for mel banks)
    n_bins_fft = fft_len // 2
    freqs = np.arange(n_bins_fft) * sample_rate / fft_len
    m = mel(freqs)  # [n_bins_fft]
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (m[None, :] - left) / mel_delta
    down = (right - m[None, :]) / mel_delta
    w = np.maximum(0.0, np.minimum(up, down))
    return w.T  # [n_bins_fft, num_bins]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mel_bins",
        "sample_frequency",
        "frame_length_ms",
        "frame_shift_ms",
        "preemphasis_coefficient",
        "remove_dc_offset",
        "use_power",
        "window_type",
    ),
)
def kaldi_fbank(
    waveform: jnp.ndarray,  # [B, N] or [N], in int16 full-scale units (x * 2^15)
    num_mel_bins: int = 128,
    sample_frequency: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    use_power: bool = True,
    window_type: str = "povey",
) -> jnp.ndarray:
    """[B, N] -> [B, n_frames, num_mel_bins] log-mel (natural log)."""
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    waveform = waveform.astype(jnp.float32)
    win = int(sample_frequency * frame_length_ms / 1000)  # 400
    hop = int(sample_frequency * frame_shift_ms / 1000)  # 160
    n_fft = _next_pow2(win)  # 512
    n = waveform.shape[-1]
    n_frames = 1 + (n - win) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]).astype(np.int32)
    frames = waveform[:, idx]  # [B, T, win]
    if remove_dc_offset:
        frames = frames - frames.mean(-1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis_coefficient * prev
    w = jnp.asarray(kaldi_window(win, window_type), jnp.float32)
    frames = frames * w
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if not use_power:
        power = jnp.sqrt(power)
    power = power[..., : n_fft // 2]  # kaldi mel banks skip the Nyquist bin
    mel_w = jnp.asarray(
        kaldi_mel_banks(num_mel_bins, n_fft, float(sample_frequency)), jnp.float32
    )
    mel = power @ mel_w
    out = jnp.log(jnp.maximum(mel, EPSILON))
    return out[0] if squeeze else out


def beats_preprocess(
    audio: jnp.ndarray,  # [B, N] float waveform in [-1, 1]
    fbank_mean: float = 15.41663,
    fbank_std: float = 6.55582,
) -> jnp.ndarray:
    """BEATs front-end (BEATs.py:135-153): int16 scaling + fbank + norm."""
    fbank = kaldi_fbank(audio * (2.0**15))
    return (fbank - fbank_mean) / (2.0 * fbank_std)


def ast_preprocess(
    audio: jnp.ndarray,  # [B, N] float waveform
    target_length: int = 1024,
    audioset_mean: float = -4.2677393,
    audioset_std: float = 4.5689974,
) -> jnp.ndarray:
    """AST front-end (2022 train_pretrained.py:105-137): DC removal ->
    hanning kaldi fbank (128 bins, 10 ms shift) -> pad to 1024 frames ->
    AudioSet mean/std normalization. Returns [B, target_length, 128]."""
    audio = audio - audio.mean(-1, keepdims=True)
    fbank = kaldi_fbank(audio, window_type="hanning")
    t = fbank.shape[-2]
    if t < target_length:
        fbank = jnp.pad(fbank, ((0, 0), (0, target_length - t), (0, 0)))
    else:
        fbank = fbank[:, :target_length]
    return (fbank - audioset_mean) / (audioset_std * 2.0)
