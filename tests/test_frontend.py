"""Golden-parity tests for the log-mel front-end.

The reference front-end is torchaudio MelSpectrogram + AmplitudeToDB
(sed_trainer_pretrained.py:96-107, 260-272). torchaudio is not available in
this environment, but torch.stft IS the exact kernel torchaudio.Spectrogram
wraps, so we verify the STFT stage bit-closely against torch.stft and the
window against torch.hamming_window; the mel/dB stages are verified against
an independent float64 numpy derivation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from desed_task_tpu.ops import frontend
from desed_task_tpu.ops.frontend import MelConfig
from desed_task_tpu.ops.scaler import ScalerConfig, ScalerState, apply_scaler, fit_scaler

CFG = MelConfig()  # DCASE defaults


def test_window_matches_torch():
    torch = pytest.importorskip("torch")
    ours = frontend.make_window("hamming", 2048, periodic=False)
    ref = torch.hamming_window(2048, periodic=False, dtype=torch.float64).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)
    ours_p = frontend.make_window("hann", 1024, periodic=True)
    ref_p = torch.hann_window(1024, periodic=True, dtype=torch.float64).numpy()
    np.testing.assert_allclose(ours_p, ref_p, rtol=0, atol=1e-12)


@pytest.mark.parametrize("backend", ["fft", "matmul"])
def test_spectrogram_matches_torch_stft(backend, rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 16000)).astype(np.float32)  # 1 s keeps test fast
    ours = np.asarray(frontend.spectrogram(jnp.asarray(x), CFG, backend=backend))

    w = torch.hamming_window(2048, periodic=False)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=2048,
        hop_length=256,
        win_length=2048,
        window=w,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).abs().numpy()

    assert ours.shape == ref.shape == (2, 1025, 1 + 16000 // 256)
    # fp32 FFT vs torch fp32 FFT: tight; matmul DFT accumulates a bit more.
    tol = 2e-3 if backend == "matmul" else 5e-4
    np.testing.assert_allclose(ours, ref, atol=tol * np.abs(ref).max(), rtol=0)


def test_mel_filterbank_properties():
    fb = frontend.mel_filterbank(CFG)
    assert fb.shape == (1025, 128)
    assert (fb >= 0).all()
    # Each filter is a triangle: single contiguous support, unimodal.
    for m in range(128):
        col = fb[:, m]
        nz = np.nonzero(col)[0]
        assert nz.size > 0
        assert np.all(np.diff(nz) == 1), "support must be contiguous"
        peak = col.argmax()
        assert np.all(np.diff(col[nz[0] : peak + 1]) >= -1e-12)
        assert np.all(np.diff(col[peak : nz[-1] + 1]) <= 1e-12)
    # Adjacent triangles cross; interior bins covered by >= 1 filter beyond
    # the first corner frequency.
    coverage = fb.sum(1)
    first = np.nonzero(fb[:, 0])[0][0]
    assert (coverage[first : -1] > 0).all()


def test_mel_filterbank_matches_float64_reference():
    """Independent float64 derivation of HTK mel triangles on the rfft grid."""
    n_freqs, n_mels, sr, fmin, fmax = 1025, 128, 16000, 0.0, 8000.0
    freqs = np.linspace(0, sr / 2, n_freqs)
    hz2mel = lambda f: 2595.0 * np.log10(1 + f / 700.0)
    mel2hz = lambda m: 700.0 * (10 ** (m / 2595.0) - 1)
    corners = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    ref = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = corners[m], corners[m + 1], corners[m + 2]
        ref[:, m] = np.maximum(
            0.0, np.minimum((freqs - lo) / (c - lo), (hi - freqs) / (hi - c))
        )
    np.testing.assert_allclose(frontend.mel_filterbank(CFG), ref, atol=1e-10)


def test_amplitude_to_db_semantics():
    mel = jnp.asarray([[1e-9, 1e-5, 1.0, 10.0, 1e7]])
    db = np.asarray(frontend.amplitude_to_db(mel, CFG))
    # amin clamp: 1e-9 -> 20*log10(1e-5) = -100 -> clamp at -50
    np.testing.assert_allclose(db[0, 0], -50.0)
    np.testing.assert_allclose(db[0, 1], -50.0)  # -100 clamped
    np.testing.assert_allclose(db[0, 2], 0.0, atol=1e-5)
    np.testing.assert_allclose(db[0, 3], 20.0, atol=1e-3)
    np.testing.assert_allclose(db[0, 4], 80.0)  # 140 dB clamped at 80


def test_full_frontend_shapes_10s():
    x = jnp.zeros((3, 160000))
    out = frontend.log_mel_spectrogram(x, CFG)
    assert out.shape == (3, 128, 626)
    # silence -> amin floor -> -50 dB everywhere
    np.testing.assert_allclose(np.asarray(out), -50.0)


def test_instance_minmax_scaler():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 128, 626)).astype(np.float32))
    cfg = ScalerConfig("instance", "minmax", (1, 2))
    y = np.asarray(apply_scaler(x, cfg))
    assert y.min() >= -1.0 - 1e-6 and y.max() <= 1.0 + 1e-6
    # per-clip extremes map to -1/+1 (up to eps)
    np.testing.assert_allclose(y.max(axis=(1, 2)), 1.0, atol=1e-4)
    np.testing.assert_allclose(y.min(axis=(1, 2)), -1.0, atol=1e-4)


def test_dataset_scaler_fit_and_apply():
    rng = np.random.default_rng(1)
    batches = [rng.standard_normal((2, 8, 5)).astype(np.float32) * 3 + 1 for _ in range(4)]
    cfg = ScalerConfig("dataset", "standard", (1, 2))
    state = fit_scaler(cfg, batches)
    assert state.mean.shape == (1, 1, 1)
    y = np.asarray(apply_scaler(jnp.asarray(batches[0]), cfg, state))
    assert abs(y.mean()) < 1.0  # roughly centered
    # matches the reference streaming formula computed directly
    means = np.stack([b.mean(axis=(1, 2), keepdims=True).mean(0) for b in batches])
    np.testing.assert_allclose(np.asarray(state.mean)[0], means.mean(0), rtol=1e-5)


# --- chunked (chunk-DFT) backend ------------------------------------------


@pytest.mark.parametrize("window,power", [("hann", 1.0), ("hamming", 2.0)])
def test_chunked_backend_exact_for_periodic_windows(window, power):
    """With a periodic window the chunk-DFT + frequency-stencil path is the
    same math as the direct windowed DFT, up to summation order."""
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32)
    cfg = MelConfig(window=window, periodic_window=True, power=power)
    ref = np.asarray(frontend.spectrogram(jnp.asarray(audio), cfg, "matmul"))
    got = np.asarray(frontend.spectrogram(jnp.asarray(audio), cfg, "chunked"))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale, rtol=2e-3)


def test_chunked_backend_approximates_symmetric_window():
    """The reference's symmetric hamming differs from the periodic one by
    <=1.4e-3 relative at n_fft=2048 — the chunked backend's documented
    approximation must land within that envelope on log-mel features."""
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    cfg = MelConfig()  # hamming, periodic_window=False (reference feats)
    ref = np.asarray(frontend.log_mel_spectrogram(jnp.asarray(audio), cfg,
                                                  "matmul"))
    got = np.asarray(frontend.log_mel_spectrogram(jnp.asarray(audio), cfg,
                                                  "chunked"))
    # dB scale: the window substitution moves log-mel by well under 0.1 dB
    assert np.max(np.abs(got - ref)) < 0.1


def test_chunked_backend_ragged_length_matches_frame_count():
    cfg = MelConfig(window="hann", periodic_window=True)
    n = 16000 + 100  # n + 2*pad not divisible by hop
    audio = np.random.default_rng(2).standard_normal((1, n)).astype(np.float32)
    ref = np.asarray(frontend.spectrogram(jnp.asarray(audio), cfg, "matmul"))
    got = np.asarray(frontend.spectrogram(jnp.asarray(audio), cfg, "chunked"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max(),
                               rtol=2e-3)
