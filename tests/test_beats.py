"""BEATs parity tests: JAX transformer vs the reference torch backbone on
random weights, Kaldi fbank invariants, and full wrapper shapes."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.models.beats import (
    BEATsConfig,
    BEATsEncoder,
    BEATsModel,
    BEATsTransformer,
    relative_position_buckets,
)
from desed_task_tpu.models.torch_convert import convert_beats_state_dict
from desed_task_tpu.ops.kaldi import beats_preprocess, kaldi_fbank, kaldi_mel_banks, povey_window

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference/recipes/dcase2024_task4_baseline/local/beats")


def load_reference_backbone():
    sys.path.insert(0, str(REFERENCE.parent))
    import importlib

    return importlib.import_module("beats.backbone")


SMALL = BEATsConfig(
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    conv_pos=16,
    conv_pos_groups=4,
    num_buckets=32,
    max_distance=64,
)


class _Args:
    """Minimal args object for the reference TransformerEncoder."""

    def __init__(self, cfg: BEATsConfig):
        self.dropout = 0.0
        self.encoder_embed_dim = cfg.encoder_embed_dim
        self.encoder_ffn_embed_dim = cfg.encoder_ffn_embed_dim
        self.encoder_attention_heads = cfg.encoder_attention_heads
        self.activation_fn = cfg.activation_fn
        self.layer_norm_first = cfg.layer_norm_first
        self.deep_norm = cfg.deep_norm
        self.attention_dropout = 0.0
        self.activation_dropout = 0.0
        self.encoder_layerdrop = 0.0
        self.conv_pos = cfg.conv_pos
        self.conv_pos_groups = cfg.conv_pos_groups
        self.relative_position_embedding = cfg.relative_position_embedding
        self.num_buckets = cfg.num_buckets
        self.max_distance = cfg.max_distance
        self.gru_rel_pos = cfg.gru_rel_pos
        self.encoder_layers = cfg.encoder_layers


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_transformer_matches_reference_backbone(rng):
    backbone = load_reference_backbone()
    torch.manual_seed(0)
    ref = backbone.TransformerEncoder(_Args(SMALL))
    ref.eval()
    B, T, D = 2, 24, SMALL.encoder_embed_dim
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        # pass a copy: the reference mutates its input in place (x += x_conv,
        # backbone.py:120) which would corrupt the shared numpy buffer
        ref_out, _ = ref(torch.from_numpy(x.copy()))
    # reference state_dict keys are encoder-relative; prefix to full names
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = convert_beats_state_dict(sd)["encoder"]
    model = BEATsTransformer(SMALL)
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-4)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_rel_pos_buckets_match_reference():
    backbone = load_reference_backbone()
    torch.manual_seed(1)
    mha = backbone.MultiheadAttention(
        64, 4, self_attention=True, has_relative_attention_bias=True,
        num_buckets=32, max_distance=64,
    )
    rel = torch.arange(20)[None, :] - torch.arange(20)[:, None]
    ref_buckets = mha._relative_positions_bucket(rel, bidirectional=True).numpy()
    ours = relative_position_buckets(20, 20, 32, 64)
    np.testing.assert_array_equal(ours, ref_buckets)


def test_kaldi_fbank_shapes_and_invariants(rng):
    x = rng.standard_normal((2, 160000)).astype(np.float32) * 0.1
    fb = np.asarray(kaldi_fbank(jnp.asarray(x) * 2**15))
    assert fb.shape == (2, 998, 128)
    assert np.isfinite(fb).all()
    # silence floors at log(eps)
    silent = np.asarray(kaldi_fbank(jnp.zeros((1, 16000))))
    assert silent.max() <= np.log(np.finfo(np.float64).eps) + 1e-3
    # povey window normalization
    w = povey_window(400)
    assert w[0] == pytest.approx(0.0, abs=1e-12)
    assert abs(w[200] - 1.0) < 1e-3


def test_kaldi_fbank_matches_scalar_reference(rng):
    """Independent per-frame float64 derivation of the Kaldi pipeline."""
    n = 16000
    x = (rng.standard_normal(n) * 3000).astype(np.float32)
    ours = np.asarray(kaldi_fbank(jnp.asarray(x)[None]))[0]
    win, hop, nfft, nmel = 400, 160, 512, 128
    mel_w = kaldi_mel_banks(nmel, nfft, 16000.0)
    pov = povey_window(win)
    n_frames = 1 + (n - win) // hop
    for t in [0, 5, n_frames - 1]:
        fr = x[t * hop : t * hop + win].astype(np.float64)
        fr = fr - fr.mean()
        fr = fr - 0.97 * np.r_[fr[0], fr[:-1]]
        fr = fr * pov
        spec = np.abs(np.fft.rfft(fr, nfft)) ** 2
        mel = spec[: nfft // 2] @ mel_w
        ref = np.log(np.maximum(mel, np.finfo(np.float64).eps))
        np.testing.assert_allclose(ours[t], ref, atol=1e-2)


def test_beats_full_wrapper_shapes(rng):
    cfg = BEATsConfig(
        encoder_layers=1,
        encoder_embed_dim=64,
        embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        num_buckets=32,
        max_distance=64,
    )
    model = BEATsModel(cfg)
    audio = jnp.asarray(rng.standard_normal((2, 160000)).astype(np.float32) * 0.1)
    params = model.init(jax.random.key(0), audio)
    out = model.apply(params, audio)
    # 998 frames -> 62 time patches x 8 freq patches = 496 tokens
    assert out["frame"].shape == (2, 64, 496)
    assert out["global"].shape == (2, 64)
    np.testing.assert_allclose(
        np.asarray(out["global"]), np.asarray(out["frame"]).mean(-1), atol=1e-5
    )
