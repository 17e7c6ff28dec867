"""Fused log-mel spectrogram front-end (TPU-native).

Re-designs the reference's torchaudio front-end (sed_trainer_pretrained.py:96-107
and take_log :260-272 in recipes/dcase2024_task4_baseline/local/) as jittable
XLA/MXU-friendly ops:

    waveform [B, N] -> frames -> window -> |DFT| (power=1) -> mel -> dB -> clamp

Reference numerics being matched (DCASE 2021-2024 confs are identical here):
  * STFT: n_fft = win_length = 2048, hop = 256, hamming window (periodic=False,
    i.e. symmetric), center=True with reflect padding, power=1 (magnitude).
  * Mel: 128 mels, f_min=0, f_max=8000, HTK mel scale, no filterbank norm
    (torchaudio MelScale defaults: mel_scale="htk", norm=None).
  * AmplitudeToDB(stype="amplitude"): 20*log10(max(x, 1e-5)), ref=1.0, no
    top_db; then clamp to [-50, 80].

Two device backends:
  * "fft":    jnp.fft.rfft on framed+windowed signal (XLA FftOp).
  * "matmul": GEMM-native DFT (frames @ windowed-DFT-basis, two real matmuls
    on the MXU, then magnitude, then the mel GEMM). On TPU the MXU path can
    beat the FFT op for these sizes; both produce identical math.

All filterbank/window constants are precomputed on host in float64 numpy and
closed over as jnp constants, so the jitted graph contains only the hot ops.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Front-end configuration (defaults = DCASE Task 4 baseline feats)."""

    sample_rate: int = 16000
    n_fft: int = 2048
    win_length: int = 2048
    hop_length: int = 256
    f_min: float = 0.0
    f_max: float = 8000.0
    n_mels: int = 128
    power: float = 1.0
    window: str = "hamming"  # "hamming" | "hann"
    periodic_window: bool = False  # reference uses periodic=False (symmetric)
    center: bool = True
    pad_mode: str = "reflect"
    mel_scale: str = "htk"  # "htk" (torchaudio default) | "slaney" (librosa)
    mel_norm: str | None = None  # None | "slaney" (area normalization)
    # AmplitudeToDB params (stype="amplitude" => multiplier 20)
    amin: float = 1e-5
    db_clamp_min: float | None = -50.0
    db_clamp_max: float | None = 80.0
    # "matmul" (GEMM-native DFT on the MXU) is ~3x faster than XLA's TPU FFT
    # for these sizes (measured: 6.8 ms vs 21 ms for B=60 10-s clips on v5e);
    # "chunked" reuses hop-sized chunk DFTs across overlapping frames (8x
    # fewer MXU FLOPs; periodic-window stencil — see _chunk_dft_spectrogram)
    backend: str = "matmul"
    # "bfloat16" runs the DFT/mel GEMMs with bf16 inputs + fp32 accumulation
    # (4x MXU throughput); "float32" is bit-parity with the reference
    compute_dtype: str = "float32"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, n_samples: int) -> int:
        if self.center:
            n_samples = n_samples + 2 * (self.n_fft // 2)
        return 1 + (n_samples - self.n_fft) // self.hop_length


def make_window(kind: str, win_length: int, periodic: bool) -> np.ndarray:
    """Window identical to torch.{hamming,hann}_window(periodic=...)."""
    n = win_length if periodic else win_length - 1
    t = np.arange(win_length, dtype=np.float64)
    if kind == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * math.pi * t / n)
    elif kind == "hann":
        w = 0.5 - 0.5 * np.cos(2.0 * math.pi * t / n)
    else:
        raise ValueError(f"unknown window {kind!r}")
    return w


def _hz_to_mel_htk(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels].

    mel_scale="htk", norm=None matches torchaudio.functional.melscale_fbanks
    defaults (the DCASE CRNN front-end); mel_scale="slaney" with
    norm="slaney" matches librosa.filters.mel defaults (the PANNs
    torchlibrosa front-end).
    """
    all_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, cfg.n_freqs)
    if cfg.mel_scale == "htk":
        hz2mel, mel2hz = _hz_to_mel_htk, _mel_to_hz_htk
    elif cfg.mel_scale == "slaney":
        hz2mel, mel2hz = _hz_to_mel_slaney, _mel_to_hz_slaney
    else:
        raise ValueError(f"unknown mel_scale {cfg.mel_scale!r}")
    m_pts = np.linspace(hz2mel(cfg.f_min), hz2mel(cfg.f_max), cfg.n_mels + 2)
    f_pts = mel2hz(m_pts)  # [n_mels + 2]
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if cfg.mel_norm == "slaney":
        enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
        fb = fb * enorm[None, :]
    return fb  # [n_freqs, n_mels]


def _frame_indices(n_samples_padded: int, n_fft: int, hop: int) -> np.ndarray:
    n_frames = 1 + (n_samples_padded - n_fft) // hop
    return (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(
        np.int32
    )


def frame_signal(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """[B, N] -> [B, n_frames, n_fft] with torch.stft center/reflect padding.

    When hop divides n_fft (the DCASE config: 2048 = 8 * 256) framing is done
    with 8 contiguous slices of a [B, n_chunks, hop] view instead of a gather
    — ~2x faster on TPU (XLA gathers of 300 MB frame tensors are slow).
    """
    if cfg.center:
        p = cfg.n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (p, p)), mode=cfg.pad_mode)
    n = audio.shape[-1]
    hop = cfg.hop_length
    if cfg.n_fft % hop == 0:
        ratio = cfg.n_fft // hop
        n_frames = 1 + (n - cfg.n_fft) // hop
        n_chunks = n // hop
        chunks = audio[:, : n_chunks * hop].reshape(audio.shape[0], n_chunks, hop)
        parts = [chunks[:, i : i + n_frames, None, :] for i in range(ratio)]
        return jnp.concatenate(parts, axis=2).reshape(
            audio.shape[0], n_frames, cfg.n_fft
        )
    idx = _frame_indices(n, cfg.n_fft, hop)
    return audio[:, idx]


def _dft_basis(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis matrices [n_fft, n_freqs] (cos, -sin)."""
    k = np.arange(cfg.n_freqs, dtype=np.float64)
    t = np.arange(cfg.n_fft, dtype=np.float64)
    ang = 2.0 * math.pi * np.outer(t, k) / cfg.n_fft
    w = make_window(cfg.window, cfg.win_length, cfg.periodic_window)
    if cfg.win_length < cfg.n_fft:  # torch center-pads the window
        lpad = (cfg.n_fft - cfg.win_length) // 2
        w = np.pad(w, (lpad, cfg.n_fft - cfg.win_length - lpad))
    cos_b = np.cos(ang) * w[:, None]
    sin_b = -np.sin(ang) * w[:, None]
    return cos_b, sin_b


def _window_stencil(kind: str) -> tuple[float, float]:
    """(a0, a1) of the generalized-cosine window w[n] = a0 - a1 cos(2pi n/N)."""
    if kind == "hamming":
        return 0.54, 0.46
    if kind == "hann":
        return 0.5, 0.5
    raise ValueError(f"no frequency-domain stencil for window {kind!r}")


def _chunk_dft_spectrogram(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Power spectrum via hop-sized chunk DFTs (8x fewer MXU FLOPs).

    Adjacent frames overlap by n_fft - hop samples, so the direct windowed
    DFT recomputes almost every product. Instead: (1) one unwindowed DFT of
    each hop-length chunk on the 1/n_fft frequency grid — a GEMM with a
    [hop, n_freqs] basis instead of [n_fft, n_freqs], hop/n_fft the FLOPs;
    (2) each frame's spectrum is the twiddled sum of its ratio=n_fft/hop
    chunk spectra (cheap shifted FMAs); (3) the window is applied exactly in
    the frequency domain as the 3-tap stencil of the PERIODIC generalized-
    cosine window, using conjugate symmetry at the k=0 / Nyquist edges.

    For cfg.periodic_window=False (the reference's torch.stft symmetric
    window) this substitutes the periodic window: the two differ by at most
    ~1.4e-3 relative for n_fft=2048 — below bfloat16 input rounding, which
    is the only regime where this backend is intended (the fp32
    reference-parity path stays on backend="matmul"/"fft").
    """
    if cfg.n_fft % cfg.hop_length != 0:
        raise ValueError("chunked backend needs hop | n_fft")
    if cfg.win_length != cfg.n_fft:
        raise ValueError("chunked backend needs win_length == n_fft")
    a0, a1 = _window_stencil(cfg.window)
    hop, n_fft, n_freqs = cfg.hop_length, cfg.n_fft, cfg.n_freqs
    ratio = n_fft // hop
    if cfg.center:
        p = n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (p, p)), mode=cfg.pad_mode)
    n = audio.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    n_chunks = n // hop
    chunks = audio[:, : n_chunks * hop].reshape(-1, n_chunks, hop)

    k = np.arange(n_freqs, dtype=np.float64)
    t = np.arange(hop, dtype=np.float64)
    ang = 2.0 * math.pi * np.outer(t, k) / n_fft
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    c_re = jnp.dot(chunks.astype(cdt), jnp.asarray(np.cos(ang), cdt),
                   preferred_element_type=jnp.float32)
    c_im = jnp.dot(chunks.astype(cdt), jnp.asarray(-np.sin(ang), cdt),
                   preferred_element_type=jnp.float32)

    # twiddle e^{-2pi i k (j*hop)/n_fft} per chunk offset j
    jk = 2.0 * math.pi * np.outer(np.arange(ratio), k) * hop / n_fft
    w_re = jnp.asarray(np.cos(jk), jnp.float32)
    w_im = jnp.asarray(-np.sin(jk), jnp.float32)
    x_re = jnp.zeros((chunks.shape[0], n_frames, n_freqs), jnp.float32)
    x_im = jnp.zeros_like(x_re)
    for j in range(ratio):  # static unroll; XLA fuses the shifted FMAs
        cr = c_re[:, j : j + n_frames]
        ci = c_im[:, j : j + n_frames]
        x_re = x_re + w_re[j] * cr - w_im[j] * ci
        x_im = x_im + w_re[j] * ci + w_im[j] * cr

    # periodic window as a frequency-domain stencil:
    #   Xw(k) = a0 X(k) - a1/2 [X(k-1) + X(k+1)]
    # with X(-1) = conj(X(1)) and X(n_freqs) = conj(X(n_freqs - 2))
    m1_re = jnp.concatenate([x_re[..., 1:2], x_re[..., :-1]], -1)
    m1_im = jnp.concatenate([-x_im[..., 1:2], x_im[..., :-1]], -1)
    p1_re = jnp.concatenate([x_re[..., 1:], x_re[..., -2:-1]], -1)
    p1_im = jnp.concatenate([x_im[..., 1:], -x_im[..., -2:-1]], -1)
    xw_re = a0 * x_re - 0.5 * a1 * (m1_re + p1_re)
    xw_im = a0 * x_im - 0.5 * a1 * (m1_im + p1_im)
    return xw_re * xw_re + xw_im * xw_im


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def spectrogram(
    audio: jnp.ndarray, cfg: MelConfig, backend: str | None = None
) -> jnp.ndarray:
    """Magnitude (power=1) or power spectrogram. [B, N] -> [B, n_freqs, n_frames]."""
    backend = backend or cfg.backend
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    audio = audio.astype(jnp.float32)
    if backend == "chunked":
        mag2 = _chunk_dft_spectrogram(audio, cfg)
        if cfg.power == 1.0:
            out = jnp.sqrt(jnp.maximum(mag2, 0.0))
        elif cfg.power == 2.0:
            out = mag2
        else:
            out = jnp.maximum(mag2, 0.0) ** (cfg.power / 2.0)
        out = jnp.swapaxes(out, -1, -2)
        return out[0] if squeeze else out
    frames = frame_signal(audio, cfg)  # [B, T, n_fft]
    if backend == "fft":
        w = jnp.asarray(
            make_window(cfg.window, cfg.win_length, cfg.periodic_window),
            dtype=jnp.float32,
        )
        spec = jnp.fft.rfft(frames * w, n=cfg.n_fft, axis=-1)
        mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    elif backend == "matmul":
        cos_b, sin_b = _dft_basis(cfg)
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        re = jnp.dot(
            frames.astype(cdt),
            jnp.asarray(cos_b, cdt),
            preferred_element_type=jnp.float32,
        )
        im = jnp.dot(
            frames.astype(cdt),
            jnp.asarray(sin_b, cdt),
            preferred_element_type=jnp.float32,
        )
        mag2 = re * re + im * im
    else:
        raise ValueError(f"unknown backend {backend!r}")
    if cfg.power == 1.0:
        out = jnp.sqrt(jnp.maximum(mag2, 0.0))
    elif cfg.power == 2.0:
        out = mag2
    else:
        out = jnp.maximum(mag2, 0.0) ** (cfg.power / 2.0)
    out = jnp.swapaxes(out, -1, -2)  # [B, n_freqs, T]
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def mel_spectrogram(
    audio: jnp.ndarray, cfg: MelConfig, backend: str | None = None
) -> jnp.ndarray:
    """[B, N] -> mel spectrogram [B, n_mels, n_frames] (power=cfg.power)."""
    spec = spectrogram(audio, cfg, backend)  # [..., n_freqs, T]
    fb = jnp.asarray(mel_filterbank(cfg), dtype=jnp.float32)  # [n_freqs, n_mels]
    mel = jnp.einsum(
        "...ft,fm->...mt", spec, fb, preferred_element_type=jnp.float32
    )
    return mel


@functools.partial(jax.jit, static_argnames=("cfg",))
def amplitude_to_db(mel: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """torchaudio AmplitudeToDB(stype='amplitude', amin=1e-5) + clamp [-50, 80].

    Matches reference take_log (sed_trainer_pretrained.py:260-272): ref=1.0 so
    the `- multiplier*log10(max(amin, ref))` shift is zero only when ref >= amin;
    torchaudio computes db = 20*log10(clamp(x, min=amin)) - 20*log10(max(amin, 1.0)).
    """
    multiplier = 10.0 if cfg.power == 2.0 else 20.0
    db = multiplier * jnp.log10(jnp.maximum(mel, cfg.amin))
    db = db - multiplier * math.log10(max(cfg.amin, 1.0))
    if cfg.db_clamp_min is not None or cfg.db_clamp_max is not None:
        db = jnp.clip(db, cfg.db_clamp_min, cfg.db_clamp_max)
    return db


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def log_mel_spectrogram(
    audio: jnp.ndarray, cfg: MelConfig, backend: str | None = None
) -> jnp.ndarray:
    """Fused front-end: waveform [B, N] -> log-mel dB [B, n_mels, n_frames].

    Equivalent of reference `self.mel_spec(audio)` + `take_log` composed; under
    jit XLA fuses the window/magnitude/mel/log elementwise chain around the
    FFT/GEMM so intermediates stay in VMEM tiles.
    """
    return amplitude_to_db(mel_spectrogram(audio, cfg, backend), cfg)
