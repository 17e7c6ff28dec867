"""Self-supervised BEATs pretraining (training/beats_pretrain.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.data.audio_io import write_wav
from desed_task_tpu.models.beats import BEATsConfig, BEATsEncoder, BEATsModel
from desed_task_tpu.ops.kaldi import beats_preprocess
from desed_task_tpu.training.beats_pretrain import (
    BEATsPretrainConfig,
    n_tokens_for,
    patch_targets,
    pretrain_beats,
)

TINY = BEATsConfig(
    embed_dim=32,
    encoder_layers=2,
    encoder_embed_dim=48,
    encoder_ffn_embed_dim=96,
    encoder_attention_heads=4,
    conv_pos=16,
    conv_pos_groups=4,
    num_buckets=32,
    max_distance=80,
)


@pytest.fixture
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(6):
        f = 200.0 * (i + 1)
        t = np.arange(16000) / 16000.0
        x = 0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(16000)
        write_wav(tmp_path / f"clip{i}.wav", x.astype(np.float32), 16000)
    return tmp_path


def test_patch_targets_matches_conv_token_order():
    """patch_targets must order tokens exactly like the patch-embed conv
    (time-major then freq): a conv with an indicator kernel recovers each
    patch's pixel."""
    rng = np.random.default_rng(1)
    fbank = jnp.asarray(rng.standard_normal((2, 35, 128)), jnp.float32)
    p = 16
    tgt = patch_targets(fbank, p)  # [2, 2*8, 256]
    assert tgt.shape == (2, 2 * 8, p * p)
    # brute-force: token (it, jf) is fbank[it*p:(it+1)*p, jf*p:(jf+1)*p]
    for it in range(2):
        for jf in range(8):
            patch = np.asarray(fbank)[0, it * p:(it + 1) * p, jf * p:(jf + 1) * p]
            np.testing.assert_allclose(
                np.asarray(tgt)[0, it * 8 + jf], patch.reshape(-1), atol=0
            )


def test_mask_token_param_only_with_masking():
    model = BEATsEncoder(TINY)
    fb = jnp.zeros((1, 35, 128))
    n_tok = 2 * 8
    p_plain = model.init(jax.random.key(0), fb)["params"]
    p_masked = model.init(
        jax.random.key(0), fb, mask_indices=jnp.zeros((1, n_tok), bool)
    )["params"]
    assert "mask_token" not in p_plain
    assert "mask_token" in p_masked
    # everything else identical tree structure
    assert set(p_plain) == set(p_masked) - {"mask_token"}


@pytest.mark.slow
def test_pretrain_reduces_loss_and_roundtrips(wav_dir, tmp_path, capsys):
    import flax.serialization

    out = tmp_path / "beats_ssl.msgpack"
    cfg = BEATsPretrainConfig(
        beats=TINY, steps=25, batch_size=4, lr=2e-3, warmup_steps=5,
        mask_ratio=0.6,
    )
    pretrain_beats(
        sorted(wav_dir.glob("*.wav")), str(out), cfg, pad_to=16000,
        log_every=24,
    )
    logs = capsys.readouterr().out
    losses = [float(l.split("loss ")[1].split()[0])
              for l in logs.splitlines() if "loss " in l]
    assert len(losses) >= 2 and losses[-1] < losses[0], losses

    # saved encoder loads into a mask-free init template and embeds audio
    model = BEATsModel(TINY)
    tpl = model.init(jax.random.key(0), jnp.zeros((1, 16000)))["params"]
    enc = flax.serialization.from_bytes(tpl["encoder"], out.read_bytes())
    outp = model.apply(
        {"params": {"encoder": enc}}, jnp.zeros((2, 16000), jnp.float32)
    )
    assert outp["global"].shape == (2, TINY.encoder_embed_dim)
    # pretrained embeddings differ from random-init ones (weights moved)
    rnd = model.apply(
        {"params": tpl}, jnp.zeros((2, 16000), jnp.float32)
    )
    assert not np.allclose(np.asarray(outp["global"]), np.asarray(rnd["global"]))


def test_n_tokens_matches_encoder():
    model = BEATsEncoder(TINY)
    fb = beats_preprocess(jnp.zeros((1, 16000), jnp.float32))
    feats = model.apply(
        {"params": model.init(jax.random.key(0), fb)["params"]}, fb
    )
    assert feats.shape[1] == n_tokens_for(TINY, 16000)


@pytest.mark.slow
def test_weak_finetune_separates_classes(wav_dir, tmp_path):
    """Supervised weak finetune must make near-pure-tone classes linearly
    separable in the global embedding (the SSL-only probe sits at chance)."""
    import flax.serialization

    from desed_task_tpu.training.beats_pretrain import finetune_beats_weak

    files = sorted(wav_dir.glob("*.wav"))
    # two classes by fundamental frequency (clips 0-2 low, 3-5 high)
    labels = np.zeros((6, 2), np.float32)
    labels[:3, 0] = 1.0
    labels[3:, 1] = 1.0
    out = tmp_path / "ft.msgpack"
    cfg = BEATsPretrainConfig(
        beats=TINY, steps=40, batch_size=4, lr=3e-3, warmup_steps=5,
    )
    finetune_beats_weak(files, labels, str(out), cfg=cfg, pad_to=16000,
                        log_every=39)
    model = BEATsModel(TINY)
    tpl = model.init(jax.random.key(0), jnp.zeros((1, 16000)))["params"]
    enc = flax.serialization.from_bytes(tpl["encoder"], out.read_bytes())
    from desed_task_tpu.data.audio_io import read_audio

    audio = np.stack([read_audio(str(f), pad_to=16000, test=True)[0]
                      for f in files])
    emb = np.asarray(model.apply(
        {"params": {"encoder": enc}}, jnp.asarray(audio)
    )["global"])
    # class centroids farther apart than within-class scatter
    c0, c1 = emb[:3].mean(0), emb[3:].mean(0)
    between = np.linalg.norm(c0 - c1)
    within = 0.5 * (np.linalg.norm(emb[:3] - c0, axis=1).mean()
                    + np.linalg.norm(emb[3:] - c1, axis=1).mean())
    assert between > within, (between, within)


def test_msgpack_sidecar_pins_architecture(tmp_path):
    """build_embedder must reconstruct the saved variant's architecture from
    the sidecar json (deep_norm flags change semantics, not the tree)."""
    import dataclasses

    from desed_task_tpu.tools.embeddings import build_embedder
    from desed_task_tpu.training.beats_pretrain import _save_encoder

    cfg = dataclasses.replace(TINY, deep_norm=False)
    model = BEATsEncoder(cfg)
    fb = jnp.zeros((1, 35, 128))
    params = model.init(jax.random.key(0), fb)["params"]
    out = tmp_path / "enc.msgpack"
    _save_encoder(params, out, cfg, False, "test")
    assert out.with_suffix(".json").exists()
    loaded_model, variables = build_embedder("beats", str(out))
    assert loaded_model.cfg == cfg  # incl. deep_norm=False
    emb = loaded_model.apply(variables, jnp.zeros((1, 16000), jnp.float32))
    assert emb["global"].shape == (1, cfg.encoder_embed_dim)
