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
