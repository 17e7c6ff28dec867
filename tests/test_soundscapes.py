"""Soundscape generator + ensemble model tests."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.data import read_wav, write_wav
from desed_task_tpu.models import CRNN
from desed_task_tpu.models.ensemble import EnsembleModel, flatten_sources, unflatten_sum_clamp
from desed_task_tpu.tools.soundscapes import SoundscapeConfig, SoundscapeGenerator


def test_soundscape_generation(tmp_path, rng):
    fg = tmp_path / "fg"
    bg = tmp_path / "bg"
    for cls in ["Dog", "Speech"]:
        (fg / cls).mkdir(parents=True)
        for i in range(2):
            x = (rng.standard_normal(16000) * 0.2).astype(np.float32)
            write_wav(fg / cls / f"{cls}_{i}.wav", x, 16000)
    bg.mkdir()
    write_wav(bg / "bg0.wav", (rng.standard_normal(32000) * 0.05).astype(np.float32), 16000)

    gen = SoundscapeGenerator(fg, bg, SoundscapeConfig(duration=4.0), seed=0)
    df = gen.generate(5, tmp_path / "out", tmp_path / "meta" / "soundscapes.tsv")
    wavs = sorted((tmp_path / "out").glob("*.wav"))
    assert len(wavs) == 5
    audio, fs = read_wav(wavs[0])
    assert fs == 16000 and len(audio) == 64000
    assert np.abs(audio).max() <= 0.99 + 1e-6
    labeled = df.dropna()
    assert set(labeled["event_label"]).issubset({"Dog", "Speech"})
    assert (labeled["offset"] <= 4.0).all() and (labeled["onset"] >= 0).all()
    # deterministic with the same seed
    gen2 = SoundscapeGenerator(fg, bg, SoundscapeConfig(duration=4.0), seed=0)
    df2 = gen2.generate(5, tmp_path / "out2", tmp_path / "meta" / "s2.tsv")
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True).drop(columns=["filename"]),
        df2.reset_index(drop=True).drop(columns=["filename"]),
    )


def test_ensemble_model(rng):
    crnn_kwargs = dict(
        nclass=4, n_RNN_cell=8, n_layers_RNN=1, kernel_size=[3], padding=[1],
        stride=[1], nb_filters=[8], pooling=[[4, 64]], dropout=0.0,
    )
    multisrc = CRNN(**crnn_kwargs)
    monaural = CRNN(**crnn_kwargs)
    model = EnsembleModel(multisrc, monaural)
    B, S, MELS, T = 2, 3, 64, 40
    sources = jnp.asarray(rng.standard_normal((B, S, MELS, T)).astype(np.float32))
    mixture = jnp.asarray(sources.sum(1))
    mono_vars = monaural.init({"params": jax.random.key(1)}, mixture, train=False)
    variables = model.init(
        {"params": jax.random.key(0)}, sources, mixture,
        monaural_variables=mono_vars, train=False,
    )
    strong, weak = model.apply(
        variables, sources, mixture, monaural_variables=mono_vars, train=False
    )
    assert strong.shape == (B, 4, 10)
    assert weak.shape == (B, 4)
    assert (np.asarray(strong) >= 0).all() and (np.asarray(strong) <= 1).all()
    assert "q_logit" in variables["params"]


def test_flatten_unflatten(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 7)).astype(np.float32))
    flat = flatten_sources(x)
    assert flat.shape == (6, 5, 7)
    s = jnp.asarray(rng.random((6, 4, 9)).astype(np.float32))
    w = jnp.asarray(rng.random((6, 4)).astype(np.float32))
    ss, ww = unflatten_sum_clamp(s, w, 3)
    assert ss.shape == (2, 4, 9) and ww.shape == (2, 4)
    assert float(ss.max()) <= 1.0
