"""Embedding extraction tool test: tiny BEATs config over synthetic wavs."""

import numpy as np
import pytest

from desed_task_tpu.data import write_wav
from desed_task_tpu.models.beats import BEATsConfig, BEATsModel
from desed_task_tpu.models.panns import Cnn14_16k
from desed_task_tpu.tools.embeddings import extract_folder

import jax
import jax.numpy as jnp


def test_extract_folder_beats_tiny(tmp_path, rng):
    wavs = []
    for i in range(5):
        x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        p = tmp_path / f"clip_{i}.wav"
        write_wav(p, x, 16000)
        wavs.append(p)
    cfg = BEATsConfig(
        encoder_layers=1, encoder_embed_dim=32, embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2,
        conv_pos=8, conv_pos_groups=2, num_buckets=16, max_distance=32,
    )
    model = BEATsModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16000), jnp.float32))
    out = extract_folder(model, variables, wavs, str(tmp_path / "emb.hdf5"),
                         batch_size=2, pad_to=16000, num_workers=2)
    import h5py

    with h5py.File(out) as f:
        assert f["global_embeddings"].shape == (5, 32)
        assert f["frame_embeddings"].shape[0] == 5
        assert f["filenames"][0].decode() == "clip_0"
        assert np.isfinite(f["global_embeddings"][:]).all()


def test_extract_folder_watchdog_wiring(tmp_path, rng):
    """Extraction arms the stall watchdog and disarms it on completion (the
    round-5 wedged-relay failure mode: a silent indefinite first-batch hang).
    A slow-batch stall must launch the probe; a clean finish must stop it."""
    import sys

    from desed_task_tpu.obs.watchdog import StallWatchdog

    wavs = []
    for i in range(3):
        x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        p = tmp_path / f"clip_{i}.wav"
        write_wav(p, x, 16000)
        wavs.append(p)
    cfg = BEATsConfig(
        encoder_layers=1, encoder_embed_dim=32, embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2,
        conv_pos=8, conv_pos_groups=2, num_buckets=16, max_distance=32,
    )
    model = BEATsModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16000), jnp.float32))

    marker = tmp_path / "probe_ran"
    wd = StallWatchdog(
        timeout_s=0.05, probe_interval_s=0.02, check_interval_s=0.01,
        probe_cmd=[sys.executable, "-c",
                   f"open({str(marker)!r}, 'a').write('x')"],
        enabled=True,
    )
    # the 50 ms stall timeout is far below the first forward's compile time
    # on this box, so the warmup batch itself reliably trips the stall path
    out = extract_folder(
        model, variables, wavs, str(tmp_path / "emb2.hdf5"),
        batch_size=1, pad_to=16000, num_workers=1, watchdog=wd,
    )
    assert out
    # the first compile (>> 50 ms) must have tripped the stall path
    assert wd.stalls >= 1 and wd.probes_launched >= 1 and marker.exists()
    # and completion must have disarmed + stopped the watchdog
    assert not wd._armed and wd._thread is None


def test_panns_shapes(rng):
    model = Cnn14_16k()
    audio = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), audio)
    out = model.apply(variables, audio)
    # 2 s @ 16 kHz -> 201 STFT frames -> T/8 = 25
    assert out["global"].shape == (2, 2048)
    assert out["frame"].shape[1] == 2048
    assert abs(out["frame"].shape[2] - 25) <= 1


def test_ast_shapes(rng):
    from desed_task_tpu.models.ast import ASTConfig, ASTModel

    cfg = ASTConfig(embed_dim=32, depth=1, num_heads=2, input_tdim=64, input_fdim=32,
                    label_dim=10)
    model = ASTModel(cfg)
    spec = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    variables = model.init(jax.random.key(0), spec)
    out = model.apply(variables, spec)
    assert out["global"].shape == (2, 10)
    assert out["frame"].shape == (2, 32, 2 + cfg.num_patches)
