"""Pallas fused mel kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.ops.frontend import MelConfig, log_mel_spectrogram
from desed_task_tpu.ops.pallas_mel import pallas_log_mel


def test_pallas_mel_matches_xla(rng):
    cfg = MelConfig()
    x = jnp.asarray(rng.standard_normal((2, 160000)).astype(np.float32) * 0.05)
    ref = np.asarray(log_mel_spectrogram(x, cfg, backend="matmul"))
    out = np.asarray(pallas_log_mel(x, cfg, interpret=True))
    assert out.shape == ref.shape == (2, 128, 626)
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_pallas_mel_odd_batch(rng):
    cfg = MelConfig()
    x = jnp.asarray(rng.standard_normal((3, 160000)).astype(np.float32) * 0.05)
    ref = np.asarray(log_mel_spectrogram(x, cfg, backend="matmul"))
    out = np.asarray(pallas_log_mel(x, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-3)
