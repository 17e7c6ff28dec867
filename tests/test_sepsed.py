"""Separation-ensemble mean-teacher step test (2021 SEPSED recipe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.models import CRNN, EnsembleModel
from desed_task_tpu.ops.frontend import MelConfig
from desed_task_tpu.training import MeanTeacherConfig, SlotSpec, make_optimizer
from desed_task_tpu.training.sepsed import create_sepsed_state, make_sepsed_train_step

N_CLASS, N_SRC = 4, 3
MEL = MelConfig(n_fft=1024, win_length=1024, n_mels=64)


def crnn():
    return CRNN(
        nclass=N_CLASS, n_RNN_cell=8, n_layers_RNN=1, kernel_size=[3, 3],
        padding=[1, 1], stride=[1, 1], nb_filters=[8, 8],
        pooling=[[2, 8], [2, 8]], dropout=0.1,
    )


def test_sepsed_train_step(rng):
    cfg = MeanTeacherConfig(
        slots=(
            SlotSpec("synth", 2, "strong"),
            SlotSpec("weak", 2, "weak"),
            SlotSpec("unlabeled", 2, "unlabeled"),
        ),
        mixup=None,
        rampup_steps=10,
    )
    monaural = crnn()
    mono_vars = monaural.init(
        {"params": jax.random.key(9)}, jnp.zeros((1, 64, 126)), train=False
    )
    model = EnsembleModel(crnn(), monaural)
    t_lab = int(int(32000 / 256) / 4)
    batch = {}
    for s in cfg.slots:
        batch[s.name] = {
            "audio": rng.standard_normal((s.size, N_SRC, 32000)).astype(np.float32) * 0.1,
            "labels": (rng.random((s.size, N_CLASS, t_lab)) > 0.9).astype(np.float32),
        }
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    state = create_sepsed_state(model, mono_vars, cfg, tx, jax.random.key(0), batch, MEL)
    step = jax.jit(make_sepsed_train_step(model, mono_vars, cfg, tx, sched, MEL))
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2
    # the learned blend q exists and stays in (0, 1) via sigmoid param
    assert "q_logit" in state.student_params
