"""Recipe-level integration test: single_run in fast_dev_run mode over a
synthetic DESED-layout corpus (the --fast_dev_run smoke mode the reference
relies on as its only automated check, SURVEY.md §4)."""

import numpy as np
import pandas as pd
import pytest
import yaml

from desed_task_tpu.data import write_wav
from desed_task_tpu.training.single_run import single_run
from desed_task_tpu.utils.classes_dict import CLASSES_DESED

CLASSES = list(CLASSES_DESED.keys())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("desed")
    rng = np.random.default_rng(3)
    secs = 2  # short clips keep the test fast; conf uses audio_max_len 2

    def make_wavs(sub, n):
        (root / sub).mkdir()
        for i in range(n):
            x = (rng.standard_normal(secs * 16000) * 0.1).astype(np.float32)
            write_wav(root / sub / f"{sub}_{i}.wav", x, 16000)

    for sub, n in [("synth", 6), ("weak", 6), ("unlab", 6), ("synth_val", 4), ("test", 4)]:
        make_wavs(sub, n)

    def strong_tsv(sub, n):
        return pd.DataFrame(
            [(f"{sub}_{i}.wav", 0.2, 1.5, CLASSES[i % len(CLASSES)]) for i in range(n)],
            columns=["filename", "onset", "offset", "event_label"],
        )

    (root / "meta").mkdir()
    strong_tsv("synth", 6).to_csv(root / "meta" / "synth.tsv", sep="\t", index=False)
    pd.DataFrame(
        [(f"weak_{i}.wav", CLASSES[i % len(CLASSES)]) for i in range(6)],
        columns=["filename", "event_labels"],
    ).to_csv(root / "meta" / "weak.tsv", sep="\t", index=False)
    strong_tsv("synth_val", 4).to_csv(root / "meta" / "synth_val.tsv", sep="\t", index=False)
    strong_tsv("test", 4).to_csv(root / "meta" / "test.tsv", sep="\t", index=False)
    for name, n in [("synth_val", 4), ("test", 4)]:
        pd.DataFrame(
            [(f"{name}_{i}.wav", float(secs)) for i in range(n)],
            columns=["filename", "duration"],
        ).to_csv(root / "meta" / f"{name}_dur.tsv", sep="\t", index=False)
    return root


def make_config(root):
    return {
        "training": {
            "batch_size": [2, 2, 2],
            "batch_size_val": 4,
            "const_max": 2,
            "n_epochs_warmup": 1,
            "num_workers": 2,
            "n_epochs": 2,
            "gradient_clip": 5.0,
            "n_test_thresholds": 3,
            "ema_factor": 0.999,
            "self_sup_loss": "mse",
            "validation_interval": 1,
            "weak_split": 0.9,
            "seed": 42,
            "mixup": "soft",
            "mixup_prob": 0.5,
            "obj_metric_synth_type": "intersection",
        },
        "scaler": {"statistic": "instance", "normtype": "minmax", "dims": [1, 2]},
        "data": {
            "synth_folder": str(root / "synth"),
            "synth_tsv": str(root / "meta" / "synth.tsv"),
            "weak_folder": str(root / "weak"),
            "weak_tsv": str(root / "meta" / "weak.tsv"),
            "unlabeled_folder": str(root / "unlab"),
            "synth_val_folder": str(root / "synth_val"),
            "synth_val_tsv": str(root / "meta" / "synth_val.tsv"),
            "synth_val_dur": str(root / "meta" / "synth_val_dur.tsv"),
            "test_folder": str(root / "test"),
            "test_tsv": str(root / "meta" / "test.tsv"),
            "test_dur": str(root / "meta" / "test_dur.tsv"),
            "audio_max_len": 2,
            "fs": 16000,
            "net_subsample": 4,
        },
        "opt": {"lr": 0.001},
        "feats": {
            "n_mels": 64,
            "n_filters": 1024,
            "hop_length": 256,
            "n_window": 1024,
            "sample_rate": 16000,
            "f_min": 0,
            "f_max": 8000,
        },
        "net": {
            "dropout": 0.2,
            "n_layers_RNN": 1,
            "n_in_channel": 1,
            "nclass": 10,
            "attention": True,
            "n_RNN_cell": 16,
            "activation": "glu",
            "rnn_type": "BGRU",
            "kernel_size": [3, 3],
            "padding": [1, 1],
            "stride": [1, 1],
            "nb_filters": [8, 8],
            "pooling": [[2, 8], [2, 8]],
            "median_filter": 3,
        },
    }


def test_single_run_fast_dev(corpus, tmp_path):
    config = make_config(corpus)
    state, results = single_run(
        config, str(tmp_path / "exp"), fast_dev_run=True, fast=False
    )
    assert results is not None
    for k in ("psds1", "psds2", "intersection_f1_macro", "event_f1_macro"):
        assert 0.0 <= results[k] <= 1.0
    assert (tmp_path / "exp" / "metrics.csv").exists()
    assert (tmp_path / "exp" / "checkpoints" / "last").exists()
    assert (tmp_path / "exp" / "energy_train.json").exists()


def test_single_run_test_from_checkpoint(corpus, tmp_path):
    config = make_config(corpus)
    single_run(config, str(tmp_path / "exp1"), fast_dev_run=True, fast=False)
    state, results = single_run(
        config,
        str(tmp_path / "exp2"),
        test_from_checkpoint=str(tmp_path / "exp1" / "checkpoints"),
        fast_dev_run=True,
        fast=False,
    )
    assert results is not None


def test_yaml_confs_parse():
    import pathlib

    for p in pathlib.Path("recipes").rglob("*.yaml"):
        cfg = yaml.safe_load(p.read_text())
        assert "training" in cfg and "net" in cfg and "feats" in cfg, p
        assert isinstance(cfg["training"]["batch_size"], list), p


def test_single_run_eval_mode_score_dump(corpus, tmp_path):
    """--eval_from_checkpoint equivalent: label-free score tree dump."""
    root = corpus
    import numpy as np
    from desed_task_tpu.data import write_wav

    rng = np.random.default_rng(11)
    (root / "eval").mkdir(exist_ok=True)
    for i in range(3):
        write_wav(root / "eval" / f"e{i}.wav",
                  (rng.standard_normal(32000) * 0.1).astype(np.float32), 16000)
    config = make_config(root)
    config["data"]["eval_folder"] = str(root / "eval")
    single_run(config, str(tmp_path / "train"), fast_dev_run=True, fast=False)
    single_run(
        config,
        str(tmp_path / "eval"),
        test_from_checkpoint=str(tmp_path / "train" / "checkpoints"),
        evaluation=True,
        fast_dev_run=True,
        fast=False,
    )
    dumped = list((tmp_path / "eval" / "eval_scores" / "student" / "raw").glob("*.tsv"))
    assert len(dumped) == 3


def test_single_run_2024_style_with_maestro(corpus, tmp_path):
    """5-slot 2024-style run: maestro + synth + strong + weak + unlabeled,
    with the per-scene maestro split and maestro validation metrics."""
    root = corpus
    rng = np.random.default_rng(21)
    m_dir = root / "maestro"
    if not m_dir.exists():
        m_dir.mkdir()
        rows = []
        for scene in ["cafe_restaurant", "city_center"]:
            for fidx in range(3):
                for onset in [0, 100]:  # two 2 s windows in centiseconds
                    name = f"{scene}_{fidx:02d}-{onset:06d}-{onset+200:06d}"
                    write_wav(
                        m_dir / f"{name}.wav",
                        (rng.standard_normal(32000) * 0.1).astype(np.float32),
                        16000,
                    )
                    rows.append(
                        (f"{name}.wav", 0.3, 1.2, "people talking", 0.9)
                    )
                    rows.append((f"{name}.wav", 0.5, 1.8, "footsteps", 0.8))
        pd.DataFrame(
            rows,
            columns=["filename", "onset", "offset", "event_label", "confidence"],
        ).to_csv(root / "meta" / "maestro.tsv", sep="\t", index=False)

    config = make_config(root)
    config["data"]["real_maestro_train_folder"] = str(m_dir)
    config["data"]["real_maestro_train_tsv"] = str(root / "meta" / "maestro.tsv")
    # strong slot reuses the synth fixtures
    config["data"]["strong_folder"] = str(root / "synth")
    config["data"]["strong_tsv"] = str(root / "meta" / "synth.tsv")
    config["training"]["batch_size"] = [2, 2, 2, 2, 2]
    config["training"]["maestro_split"] = 0.7
    config["net"]["nclass"] = 27
    state, results = single_run(
        config, str(tmp_path / "exp24"), fast_dev_run=True, fast=False
    )
    assert results is not None
    text = (tmp_path / "exp24" / "metrics.csv").read_text()
    assert "val/maestro/student/segment_f1_best" in text
    assert "val/teacher/obj_metric" in text


def test_strong_real_slot_composition(corpus):
    """--strong_real folds AudioSet strong clips into the synth slot when the
    batch list has no strong entry (reference train_sed.py:163-167); a
    4-entry batch list makes it a separate slot; neither ignores it."""
    from desed_task_tpu.training.single_run import (
        build_encoder, build_train_datasets,
    )

    config = make_config(corpus)
    config["data"]["strong_folder"] = str(corpus / "synth")
    config["data"]["strong_tsv"] = str(corpus / "meta" / "synth.tsv")
    encoder = build_encoder(config)

    ds, bs, slots = build_train_datasets(config, encoder, strong_real=False)
    assert [s.name for s in slots] == ["synth", "weak", "unlabeled"]
    n_synth_alone = len(ds["synth"])

    ds2, _, slots2 = build_train_datasets(config, encoder, strong_real=True)
    assert [s.name for s in slots2] == ["synth", "weak", "unlabeled"]
    assert len(ds2["synth"]) == 2 * n_synth_alone  # strong concat-ed in
    item = ds2["synth"][0]  # first item comes from the strong part
    assert item["audio"].shape == (2 * 16000,)

    config["training"]["batch_size"] = [2, 2, 2, 2]
    _, _, slots3 = build_train_datasets(config, encoder, strong_real=False)
    assert [s.name for s in slots3] == ["synth", "strong", "weak", "unlabeled"]


def test_strong_real_trains(corpus, tmp_path):
    config = make_config(corpus)
    config["data"]["strong_folder"] = str(corpus / "synth")
    config["data"]["strong_tsv"] = str(corpus / "meta" / "synth.tsv")
    state, results = single_run(
        config, str(tmp_path / "exp_sr"), fast_dev_run=True, fast=False,
        strong_real=True,
    )
    assert results is not None


@pytest.mark.parametrize(
    "year,script,has_strong_real",
    [
        ("dcase2021_task4_baseline", "train_sed.py", False),
        ("dcase2022_task4_baseline", "train_sed.py", True),
        ("dcase2022_task4_baseline", "train_pretrained.py", False),
        ("dcase2023_task4_baseline", "train_sed.py", True),
        ("dcase2023_task4_baseline", "train_pretrained.py", True),
        ("dcase2024_task4_baseline", "train_pretrained.py", False),
    ],
)
def test_train_cli_flag_contract(year, script, has_strong_real):
    """Every train CLI exposes the reference's full flag surface
    (--eval_from_checkpoint everywhere, --strong_real where the reference
    has it: 2022/2023 train_sed, 2023 train_pretrained)."""
    import subprocess
    import sys as _sys
    from pathlib import Path as _P

    path = _P("recipes") / year / script
    out = subprocess.run(
        [_sys.executable, str(path), "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    for flag in ("--eval_from_checkpoint", "--test_from_checkpoint",
                 "--resume_from_checkpoint", "--fast_dev_run", "--conf_file"):
        assert flag in out.stdout, (path, flag)
    assert ("--strong_real" in out.stdout) == has_strong_real, path


def test_single_run_sharded_multidevice(corpus, tmp_path):
    """Slot sizes divisible by the 8 virtual devices -> single_run picks the
    shard_map step and trains data-parallel."""
    config = make_config(corpus)
    config["training"]["batch_size"] = [8, 8, 8]  # divisible by 8 devices
    # fast_dev_run uses 20 steps/epoch regardless of dataset size, wrapping
    # the tiny corpus
    state, results = single_run(
        config, str(tmp_path / "exp_dp"), fast_dev_run=True, fast=False
    )
    assert results is not None
