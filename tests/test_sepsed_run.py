"""End-to-end 2021 separation-ensemble fine-tune (reference
finetune_on_separated.py): tiny synthetic corpus with pre-separated sources
-> restore a monaural SED checkpoint -> fine-tune the EnsembleModel with the
sepsed mean-teacher step -> validate + PSDS test battery."""

import numpy as np
import pandas as pd
import pytest

import jax

from desed_task_tpu.data import write_wav
from desed_task_tpu.obs.checkpoint import CheckpointManager
from desed_task_tpu.training.sepsed_run import sepsed_single_run

CLASSES = ["Speech", "Dog", "Cat"]
N_SRC = 2
SECS = 2


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("sep_corpus")
    rng = np.random.default_rng(11)

    def make(sub, n):
        (root / sub).mkdir()
        sep = root / f"{sub}_separated"
        sep.mkdir()
        for i in range(n):
            x = (rng.standard_normal(SECS * 16000) * 0.1).astype(np.float32)
            write_wav(root / sub / f"{sub}_{i}.wav", x, 16000)
            for s in range(N_SRC):
                write_wav(
                    sep / f"{sub}_{i}_src{s}.wav",
                    (x / N_SRC + rng.standard_normal(len(x)) * 0.01).astype(np.float32),
                    16000,
                )

    for sub, n in [("synth", 4), ("weak", 4), ("unlab", 4), ("synth_val", 2), ("test", 2)]:
        make(sub, n)

    def strong(sub, n):
        return pd.DataFrame(
            [(f"{sub}_{i}.wav", 0.2, 1.5, CLASSES[i % 3]) for i in range(n)],
            columns=["filename", "onset", "offset", "event_label"],
        )

    (root / "meta").mkdir()
    strong("synth", 4).to_csv(root / "meta/synth.tsv", sep="\t", index=False)
    pd.DataFrame(
        [(f"weak_{i}.wav", CLASSES[i % 3]) for i in range(4)],
        columns=["filename", "event_labels"],
    ).to_csv(root / "meta/weak.tsv", sep="\t", index=False)
    strong("synth_val", 2).to_csv(root / "meta/synth_val.tsv", sep="\t", index=False)
    strong("test", 2).to_csv(root / "meta/test.tsv", sep="\t", index=False)
    for name, n in [("synth_val", 2), ("test", 2)]:
        pd.DataFrame(
            [(f"{name}_{i}.wav", float(SECS)) for i in range(n)],
            columns=["filename", "duration"],
        ).to_csv(root / f"meta/{name}_dur.tsv", sep="\t", index=False)
    return root


def make_config(root):
    return {
        "training": {
            "batch_size": [2, 2, 2],
            "batch_size_val": 2,
            "const_max": 2,
            "n_epochs_warmup": 1,
            "num_workers": 1,
            "n_epochs": 2,
            "gradient_clip": 5.0,
            "n_test_thresholds": 3,
            "ema_factor": 0.999,
            "self_sup_loss": "mse",
            "validation_interval": 1,
            "weak_split": 0.75,
            "seed": 42,
            "obj_metric_synth_type": "intersection",
        },
        "scaler": {"statistic": "instance", "normtype": "minmax", "dims": [1, 2]},
        "data": {
            "synth_folder": str(root / "synth"),
            "synth_tsv": str(root / "meta/synth.tsv"),
            "weak_folder": str(root / "weak"),
            "weak_tsv": str(root / "meta/weak.tsv"),
            "unlabeled_folder": str(root / "unlab"),
            "synth_val_folder": str(root / "synth_val"),
            "synth_val_tsv": str(root / "meta/synth_val.tsv"),
            "synth_val_dur": str(root / "meta/synth_val_dur.tsv"),
            "test_folder": str(root / "test"),
            "test_tsv": str(root / "meta/test.tsv"),
            "test_dur": str(root / "meta/test_dur.tsv"),
            "audio_max_len": SECS,
            "fs": 16000,
            "net_subsample": 4,
        },
        "opt": {"lr": 0.001},
        "feats": {
            "n_mels": 64, "n_filters": 1024, "hop_length": 256,
            "n_window": 1024, "sample_rate": 16000, "f_min": 0, "f_max": 8000,
        },
        "net": {
            "dropout": 0.2, "n_layers_RNN": 1, "n_in_channel": 1, "nclass": 10,
            "attention": True, "n_RNN_cell": 16, "activation": "glu",
            "rnn_type": "BGRU", "kernel_size": [3, 3], "padding": [1, 1],
            "stride": [1, 1], "nb_filters": [8, 8], "pooling": [[2, 8], [2, 8]],
            "median_filter": 3,
        },
    }


def _make_sed_checkpoint(config, root, tmp_path):
    """Simulate train_sed.py output: a mean-teacher state for the monaural
    CRNN saved under a checkpoint dir."""
    from desed_task_tpu.training import (
        MeanTeacherConfig, SlotSpec, create_state, make_optimizer,
    )
    from desed_task_tpu.training.single_run import build_model, mel_config

    model = build_model(config)
    cfg = MeanTeacherConfig(
        slots=(SlotSpec("synth", 2, "strong"), SlotSpec("weak", 2, "weak"),
               SlotSpec("unlabeled", 2, "unlabeled")),
        mixup=None, rampup_steps=10,
    )
    rng = np.random.default_rng(0)
    batch = {
        s.name: {
            "audio": rng.standard_normal((s.size, SECS * 16000)).astype(np.float32) * 0.1,
            "labels": np.zeros((s.size, 10, 31), np.float32),
        }
        for s in cfg.slots
    }
    tx, _ = make_optimizer(lr=1e-3, rampup_steps=10)
    state = create_state(model, cfg, tx, jax.random.key(3), batch,
                         mel_cfg=mel_config(config))
    mgr = CheckpointManager(tmp_path / "sed_ckpt")
    mgr.save(state, {"epoch": 0}, name="best")
    return str(tmp_path / "sed_ckpt")


def test_sepsed_single_run_end_to_end(corpus, tmp_path):
    config = make_config(corpus)
    sed_ckpt = _make_sed_checkpoint(config, corpus, tmp_path)
    state, results = sepsed_single_run(
        config, str(tmp_path / "exp"),
        sed_checkpoint=sed_ckpt, sed_model="student",
        n_src=N_SRC, fast_dev_run=True,
    )
    assert "q_logit" in state.student_params
    assert "multisrc_crnn" in state.student_params
    assert results is not None
    for k in ("psds1", "psds2", "intersection_f1_macro", "event_f1_macro"):
        assert 0.0 <= results[k] <= 1.0
    assert (tmp_path / "exp" / "checkpoints" / "last").exists()
    assert (tmp_path / "exp" / "metrics.csv").exists()
    text = (tmp_path / "exp" / "metrics.csv").read_text()
    assert "val/obj_metric" in text

    # multisrc branch was seeded from the pretrained monaural weights
    mgr = CheckpointManager(sed_ckpt)
    restored = mgr.restore("best")
    mono_leaf = jax.tree_util.tree_leaves(restored["student_params"])[0]
    assert np.asarray(mono_leaf).shape == np.asarray(
        jax.tree_util.tree_leaves(state.student_params["multisrc_crnn"])[0]
    ).shape
