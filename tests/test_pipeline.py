"""Inference pipeline test: end-to-end files -> events, consistency with the
reference decode path."""

import numpy as np
import pytest

import jax

from desed_task_tpu.data import write_wav
from desed_task_tpu.inference.pipeline import InferencePipeline
from desed_task_tpu.labels import ManyHotEncoder
from desed_task_tpu.models import CRNN

ENC = ManyHotEncoder(["A", "B", "C"], 2, 1024, 256, 4, 16000)


def test_pipeline_end_to_end(tmp_path, rng):
    wavs = []
    for i in range(7):  # odd count exercises final-batch padding
        x = (rng.standard_normal(32000) * 0.1).astype(np.float32)
        p = tmp_path / f"clip_{i}.wav"
        write_wav(p, x, 16000)
        wavs.append(p)
    model = CRNN(
        nclass=3, n_RNN_cell=8, n_layers_RNN=1, kernel_size=[3, 3],
        padding=[1, 1], stride=[1, 1], nb_filters=[8, 8],
        pooling=[[2, 8], [2, 8]], dropout=0.0,
    )
    from desed_task_tpu.ops.frontend import MelConfig

    mel = MelConfig(n_fft=1024, win_length=1024, n_mels=64)
    variables = model.init(
        {"params": jax.random.key(0)}, np.zeros((1, 64, 126), np.float32)
    )
    pipe = InferencePipeline(
        model, variables, ENC, mel_cfg=mel,
        median_filter=[3, 3, 3], thresholds=(0.3, 0.5, 0.7), batch_size=4,
    )
    scores, weak, dfs = pipe.run(wavs)
    assert len(scores) == 7 and len(weak) == 7
    assert set(dfs) == {0.3, 0.5, 0.7}
    assert scores["clip_0"].shape[0] == 3  # [C, T]
    for df in dfs.values():
        if len(df):
            assert (df.offset > df.onset).all()
            assert df.filename.str.endswith(".wav").all()
    # monotone: lower threshold detects at least as many event-seconds
    dur = {th: (df.offset - df.onset).sum() for th, df in dfs.items()}
    assert dur[0.3] >= dur[0.5] >= dur[0.7]


def test_export_roundtrip(tmp_path, rng):
    """AOT-export the serving forward, reload it, and match the live jit."""
    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.tools.export import export_pipeline, load_pipeline

    model = CRNN(
        nclass=3, n_RNN_cell=8, n_layers_RNN=1, kernel_size=[3, 3],
        padding=[1, 1], stride=[1, 1], nb_filters=[8, 8],
        pooling=[[2, 8], [2, 8]], dropout=0.0,
    )
    mel = MelConfig(n_fft=1024, win_length=1024, n_mels=64)
    variables = model.init(
        {"params": jax.random.key(0)}, np.zeros((1, 64, 126), np.float32)
    )
    pipe = InferencePipeline(
        model, variables, ENC, mel_cfg=mel,
        median_filter=[3, 3, 3], thresholds=(0.3, 0.5), batch_size=4,
    )
    out = export_pipeline(pipe, tmp_path / "serve")
    assert (out / "forward.jaxexport").exists()

    fwd, meta = load_pipeline(out)
    assert meta["labels"] == ["A", "B", "C"]
    assert meta["batch_size"] == 4 and meta["thresholds"] == [0.3, 0.5]

    audio = (rng.standard_normal((4, pipe.pad_to)) * 0.1).astype(np.float32)
    s_live, w_live, a_live = pipe._forward(audio)
    s_aot, w_aot, a_aot = fwd(audio)
    np.testing.assert_allclose(np.asarray(s_aot), np.asarray(s_live),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_aot), np.asarray(w_live),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(a_aot) == np.asarray(a_live)).all()
