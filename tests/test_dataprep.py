"""Data-prep tests: MAESTRO windowing/annotation re-clipping, HPO sampler."""

import numpy as np
import pandas as pd
import pytest

from desed_task_tpu.data import read_wav, write_wav
from desed_task_tpu.data.maestro_prep import (
    clip_annotation,
    get_chunk_indices,
    prepare_maestro_folder,
    split_long_file,
    split_maestro_dev,
)
from desed_task_tpu.tools.hpo import run_study


def test_chunk_indices():
    # 35 s at fs=1: window 10, hop 5 -> starts 0,5,10,...,25 + final partial
    idx = get_chunk_indices(35, 10, 5)
    assert idx[0] == (0, 10) and idx[-1][1] == 35
    assert all(e - s <= 10 for s, e in idx)
    # exact fit leaves no partial
    assert get_chunk_indices(20, 10, 5) == [(0, 10), (5, 15), (10, 20)]


def test_clip_annotation():
    events = [
        {"onset": 2.0, "offset": 8.0, "event_label": "a"},
        {"onset": 9.0, "offset": 15.0, "event_label": "b"},
        {"onset": 20.0, "offset": 25.0, "event_label": "c"},
    ]
    out = clip_annotation(events, 5.0, 15.0)
    assert [(e["event_label"], e["onset"], e["offset"]) for e in out] == [
        ("a", 0.0, 3.0),
        ("b", 4.0, 10.0),
    ]


def test_split_long_file_names(rng):
    audio = rng.standard_normal(16000 * 25).astype(np.float32) * 0.1
    events = [{"onset": 3.0, "offset": 12.0, "event_label": "x", "confidence": 1.0}]
    chunks = list(split_long_file(audio, 16000, events, "file1", 10.0, 5.0))
    names = [c[0] for c in chunks]
    assert names[0] == "file1-000000-001000"
    assert names[1] == "file1-000500-001500"
    # the event at 3-12 s appears clipped in window 0 as 3-10
    evs0 = chunks[0][2]
    assert evs0[0]["onset"] == 3.0 and evs0[0]["offset"] == 10.0


def test_prepare_maestro_folder(tmp_path, rng):
    wav = tmp_path / "long.wav"
    write_wav(wav, rng.standard_normal(16000 * 22).astype(np.float32) * 0.1, 16000)
    ann = tmp_path / "long.txt"
    ann.write_text("1.0\t5.0\tcar\t0.9\n15.0\t20.0\tfootsteps\t0.8\n")
    out = tmp_path / "chunks"
    tsv = prepare_maestro_folder([wav], [ann], out, window_len=10, hop_len=5)
    assert len(list(out.glob("*.wav"))) >= 3
    assert set(tsv["event_label"]) == {"car", "footsteps"}
    a, _ = read_wav(next(iter(sorted(out.glob("*.wav")))))
    assert len(a) == 160000


def test_split_maestro_dev_deterministic():
    files = [f"f{i}" for i in range(20)]
    scenes = ["cafe"] * 10 + ["metro"] * 10
    t1, v1 = split_maestro_dev(files, scenes, 0.9, seed=1)
    t2, v2 = split_maestro_dev(files, scenes, 0.9, seed=1)
    assert t1 == t2 and v1 == v2
    assert len(t1) == 18 and len(v1) == 2
    assert set(t1) | set(v1) == set(files)


def test_hpo_random_search(tmp_path):
    config = {
        "training": {"gradient_clip": 5.0, "n_epochs_warmup": 50},
        "opt": {"lr": 1e-3},
        "net": {
            "dropout": 0.5, "dropstep_recurrent": 0.0,
            "dropstep_recurrent_len": 5, "n_RNN_cell": 128, "rnn_layers": 2,
            "median_filter": [7, 7, 7],
        },
    }

    def objective(cfg):
        return -abs(cfg["opt"]["lr"] - 0.002)  # peak near lr=0.002

    best = run_study(config, objective, 8, tmp_path / "study", mode="train")
    assert best is not None and "lr" in best["params"]
    # resume appends, doesn't redo
    best2 = run_study(config, objective, 8, tmp_path / "study", mode="train")
    lines = (tmp_path / "study" / "study_train.jsonl").read_text().splitlines()
    assert len(lines) == 8

    best_eval = run_study(config, lambda c: 1.0, 2, tmp_path / "study", mode="eval")
    assert len(best_eval["params"]) == 3  # one median window per class


def test_link_synth_tree(tmp_path):
    """Offline synth-layout stage of the 2022/2023 generate scripts:
    audio subfolders and metadata tsvs symlinked into the dataset layout
    (reference generate_dcase_task4_2022.py:39-89)."""
    from desed_task_tpu.tools.dataset_setup import link_synth_tree

    synth = tmp_path / "dcase_synth"
    for sub in ("soundscapes_16k", "extra"):
        (synth / "audio" / "train" / sub).mkdir(parents=True)
        (synth / "audio" / "train" / sub / "a.wav").write_bytes(b"x")
    (synth / "audio" / "validation").mkdir(parents=True)
    (synth / "audio" / "validation" / "v.wav").write_bytes(b"x")
    for split in ("train", "validation"):
        meta = synth / "metadata" / split / f"synthetic21_{split}"
        meta.mkdir(parents=True)
        (meta / "soundscapes.tsv").write_text("filename\tonset\n")

    dest = tmp_path / "dataset"
    n = link_synth_tree(synth, dest)
    assert (dest / "audio/train/soundscapes_16k").is_symlink()
    assert (dest / "audio/train/soundscapes_16k/a.wav").exists()
    # flat validation layout handled
    assert (dest / "audio/validation/v.wav").exists()
    assert (dest / "metadata/train/synthetic21_train/soundscapes.tsv").is_symlink()
    assert n == 5

    # idempotent: re-linking warns and creates nothing new
    import warnings as w
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        n2 = link_synth_tree(synth, dest)
    assert n2 == 0 and len(rec) >= 1


def test_record_missing_files(tmp_path, monkeypatch):
    from desed_task_tpu.tools.dataset_setup import record_missing_files

    monkeypatch.chdir(tmp_path)
    out = record_missing_files(["Y1.wav", "Y2.wav"], "desed_real")
    assert out.exists()
    text = out.read_text().splitlines()
    assert text[0] == "filename" and len(text) == 3


@pytest.mark.parametrize("year", ["2022", "2023"])
def test_generate_cli_parses_and_degrades(year, tmp_path, monkeypatch, capsys):
    """The generate CLIs parse and run all stages without `desed`/network,
    printing actionable messages instead of crashing."""
    import runpy
    import sys

    monkeypatch.chdir(tmp_path)
    script = f"/root/repo/recipes/dcase{year}_task4_baseline/generate_dcase_task4_{year}.py"
    monkeypatch.setattr(
        sys, "argv", [script, "--basedir", str(tmp_path), "--out_dir", str(tmp_path / "out")]
    )
    runpy.run_path(script, run_name="__main__")
    outp = capsys.readouterr().out
    assert "dataset layout at:" in outp


def test_hpo_sharded_two_workers(tmp_path):
    """Process-sharded study (reference: one Optuna worker per GPU,
    optuna_pretrained.py:179-204): 2 workers claim disjoint trial indices
    atomically, trials are seeded by index (deterministic union), and the
    merged study log is complete."""
    import json
    import sys

    # importable objective for the worker subprocesses
    mod = tmp_path / "hpo_obj_mod.py"
    mod.write_text(
        "def objective(cfg):\n    return -abs(cfg['opt']['lr'] - 0.002)\n"
    )
    import os
    env_path = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = f"{tmp_path}:{env_path}"
    try:
        config = {
            "training": {"gradient_clip": 5.0, "n_epochs_warmup": 50},
            "opt": {"lr": 1e-3},
            "net": {
                "dropout": 0.5, "dropstep_recurrent": 0.0,
                "dropstep_recurrent_len": 5, "n_RNN_cell": 128,
                "rnn_layers": 2, "median_filter": [7, 7, 7],
            },
        }
        best = run_study(
            config, None, 6, tmp_path / "study", mode="train",
            n_workers=2, objective_spec="hpo_obj_mod:objective",
        )
    finally:
        os.environ["PYTHONPATH"] = env_path
    lines = (tmp_path / "study" / "study_train.jsonl").read_text().splitlines()
    recs = [json.loads(l) for l in lines]
    assert len(recs) == 6
    assert sorted(r["trial"] for r in recs) == list(range(6))  # no dupes
    assert len({r["worker"] for r in recs}) >= 1
    assert best is not None and best["value"] <= 0.0


def test_audit_missing_files(tmp_path):
    """Missing-YouTube-clip bookkeeping (reference
    generate_dcase_task4_2024.py:183-222): clips in the metadata tsv but not
    on disk are written to a recovery tsv."""
    import numpy as np
    import pandas as pd

    from desed_task_tpu.data import write_wav
    from desed_task_tpu.tools.download import audit_missing_files

    audio = tmp_path / "audio"
    audio.mkdir()
    for name in ("a.wav", "b.wav"):
        write_wav(audio / name, np.zeros(160, np.float32), 16000)
    meta = pd.DataFrame(
        {"filename": ["a.wav", "b.wav", "gone.wav", "gone.wav"],
         "event_labels": ["Dog", "Cat", "Speech", "Dog"]}
    )
    meta_tsv = tmp_path / "weak.tsv"
    meta.to_csv(meta_tsv, sep="\t", index=False)
    out = tmp_path / "missing" / "missing_files_weak.tsv"
    missing = audit_missing_files(meta_tsv, audio, out)
    assert list(missing["filename"]) == ["gone.wav"]  # deduplicated
    assert out.exists()
    # nothing missing -> no file written
    out2 = tmp_path / "missing" / "none.tsv"
    meta_ok = meta[meta.filename != "gone.wav"]
    meta_ok.to_csv(meta_tsv, sep="\t", index=False)
    assert len(audit_missing_files(meta_tsv, audio, out2)) == 0
    assert not out2.exists()
