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


def _mini_soundbank(tmp_path, rng):
    fg = tmp_path / "sb" / "foreground"
    bg = tmp_path / "sb" / "background"
    for cls in ["Dog", "Speech", "Cat"]:
        (fg / cls).mkdir(parents=True)
        for i in range(2):
            x = (rng.standard_normal(16000) * 0.2).astype(np.float32)
            write_wav(fg / cls / f"{cls}_{i}.wav", x, 16000)
    bg.mkdir(parents=True)
    write_wav(bg / "bg0.wav", (rng.standard_normal(48000) * 0.05).astype(np.float32), 16000)
    return fg, bg


def test_metadata_render_roundtrip(tmp_path, rng):
    """Stored jams-equivalent metadata re-renders to BIT-IDENTICAL audio."""
    fg, bg = _mini_soundbank(tmp_path, rng)
    cfg = SoundscapeConfig(duration=3.0)
    gen = SoundscapeGenerator(fg, bg, cfg, seed=7)
    gen.generate(3, tmp_path / "out", tmp_path / "meta.tsv", save_metadata=True)
    import json
    for mpath in sorted((tmp_path / "out").glob("*.json")):
        meta = json.loads(mpath.read_text())
        mix, _ = gen.render(meta)
        orig, _ = read_wav(mpath.with_suffix(".wav"))
        # wav write round-trips through int16 PCM
        np.testing.assert_allclose(mix, orig, atol=2.0 / 32768)


def test_subset_rerender_same_events_changed_gains(tmp_path, rng):
    """generate_dcase_subset semantics: re-render with non-target SNR
    decreased -> identical event tables, different audio; drop_nontarget ->
    only target rows survive (reference generate_dcase_subset.py:137-414)."""
    from desed_task_tpu.tools.soundscapes import rerender_subset

    fg, bg = _mini_soundbank(tmp_path, rng)
    cfg = SoundscapeConfig(duration=3.0, event_count_mean=4, max_events=5)
    gen = SoundscapeGenerator(fg, bg, cfg, seed=3)
    df0 = gen.generate(4, tmp_path / "orig", tmp_path / "orig.tsv")

    df1 = rerender_subset(
        tmp_path / "orig", fg, bg, tmp_path / "sub", tmp_path / "sub.tsv",
        cfg=cfg, db_decrease=12.0, target_labels=["Dog"],
    )
    pd.testing.assert_frame_equal(
        df0.reset_index(drop=True), df1.reset_index(drop=True)
    )  # event tables identical
    # audio changed for clips containing attenuated non-target events
    changed = False
    for w in sorted((tmp_path / "orig").glob("*.wav")):
        a, _ = read_wav(w)
        b, _ = read_wav(tmp_path / "sub" / w.name)
        if not np.allclose(a, b, atol=2.0 / 32768):
            changed = True
    assert changed

    df2 = rerender_subset(
        tmp_path / "orig", fg, bg, tmp_path / "only", tmp_path / "only.tsv",
        cfg=cfg, target_labels=["Dog"], drop_nontarget=True, keep_background=False,
    )
    labs = set(df2.dropna()["event_label"])
    assert labs.issubset({"Dog"})


def test_pitch_shift_and_lufs(rng):
    """tools/dsp: +12 semitones doubles a sine's frequency at constant
    length; LUFS scaling hits its target (BS.1770 gated loudness)."""
    from desed_task_tpu.tools.dsp import lufs, pitch_shift, scale_to_lufs

    fs = 16000
    t = np.arange(fs) / fs
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = pitch_shift(x, 12.0, fs)
    assert len(y) == len(x)
    win = np.hanning(8000)
    spec = np.abs(np.fft.rfft(y[2000:10000] * win))
    peak_hz = np.argmax(spec) * fs / 8000
    assert abs(peak_hz - 880.0) < 10.0
    z = scale_to_lufs(x, -30.0, fs)
    assert abs(lufs(z, fs) - (-30.0)) < 0.1
