"""Data layer tests: WAV round-trip, pad/crop bookkeeping, datasets on
synthesized fixtures, fixed-slot batching + host sharding."""

import numpy as np
import pandas as pd
import pytest

from desed_task_tpu.data import (
    MultiSourceBatcher,
    StronglyAnnotatedSet,
    UnlabeledSet,
    WeakSet,
    pad_audio,
    read_audio,
    read_wav,
    resample,
    to_mono,
    write_wav,
)
from desed_task_tpu.labels import ManyHotEncoder

ENC = ManyHotEncoder(["Speech", "Dog", "Cat"], 10, 2048, 256, 4, 16000)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    for sub, n, dur in [("strong", 6, 10), ("weak", 5, 10), ("unlab", 7, 8)]:
        (d / sub).mkdir()
        for i in range(n):
            x = (rng.standard_normal(int(dur * 16000)) * 0.1).astype(np.float32)
            write_wav(d / sub / f"{sub}_{i}.wav", x, 16000)
    return d


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    write_wav(tmp_path / "a.wav", x, 16000)
    y, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)
    # stereo
    st = np.stack([x, -x])
    write_wav(tmp_path / "b.wav", st, 8000)
    y2, sr2 = read_wav(tmp_path / "b.wav")
    assert sr2 == 8000 and y2.shape == (2, 16000)
    np.testing.assert_allclose(to_mono(y2), np.zeros(16000), atol=2 / 32768)


def test_wav_matches_torch_reader(tmp_path, rng):
    """Cross-check our parser against torch's internal wav loading via scipy."""
    from scipy.io import wavfile

    x = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    pcm = (x * 32768).clip(-32768, 32767).astype(np.int16)
    wavfile.write(tmp_path / "c.wav", 16000, pcm)
    y, sr = read_wav(tmp_path / "c.wav")
    np.testing.assert_array_equal((y * 32768).astype(np.int16), pcm)
    # float32 wav written by scipy
    wavfile.write(tmp_path / "d.wav", 16000, x)
    y2, _ = read_wav(tmp_path / "d.wav")
    np.testing.assert_array_equal(y2, x)


def test_pad_audio_semantics(rng):
    short = rng.standard_normal(100).astype(np.float32)
    out, onset, offset, ratio = pad_audio(short, 200, fs=100, test=False)
    assert out.shape == (200,) and (out[100:] == 0).all()
    assert onset == 0.0 and ratio == 2.0 and offset == 2.0
    long = rng.standard_normal(500).astype(np.float32)
    out, onset, offset, ratio = pad_audio(long, 200, fs=100, test=True)
    np.testing.assert_array_equal(out, long[:200])  # left crop in test mode
    assert onset == 0.0 and ratio == 1.0
    out, onset, _, _ = pad_audio(long, 200, fs=100, test=False)
    assert 0 <= onset <= 3.0  # random crop somewhere


def test_resample_preserves_tone():
    t = np.arange(44100) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, 44100, 16000)
    assert abs(len(y) - 16000) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = spec.argmax() * 16000 / len(y)
    assert abs(peak_hz - 440) < 5


def test_strong_dataset(fixture_dir):
    tsv = pd.DataFrame(
        [
            ("strong_0.wav", 0.5, 2.0, "Speech"),
            ("strong_0.wav", 1.0, 3.0, "Dog"),
            ("strong_1.wav", 0.0, 10.0, "Cat"),
        ],
        columns=["filename", "onset", "offset", "event_label"],
    )
    ds = StronglyAnnotatedSet(fixture_dir / "strong", tsv, ENC, test=True)
    assert len(ds) == 2
    item = ds[0]
    assert item["audio"].shape == (160000,)
    assert item["labels"].shape == (3, 156)
    assert item["labels"][0].sum() > 0 and item["labels"][1].sum() > 0
    assert item["class_mask"].all()


def test_strong_dataset_class_mask(fixture_dir):
    tsv = pd.DataFrame(
        [("strong_0.wav", 0.5, 2.0, "Speech")],
        columns=["filename", "onset", "offset", "event_label"],
    )
    ds = StronglyAnnotatedSet(
        fixture_dir / "strong", tsv, ENC, test=True, mask_events_other_than=["Speech"]
    )
    np.testing.assert_array_equal(ds[0]["class_mask"], [True, False, False])


def test_weak_dataset(fixture_dir):
    tsv = pd.DataFrame(
        [("weak_0.wav", "Speech,Dog"), ("weak_1.wav", "Cat")],
        columns=["filename", "event_labels"],
    )
    ds = WeakSet(fixture_dir / "weak", tsv, ENC, test=True)
    item = ds[0]
    np.testing.assert_array_equal(item["labels"][:, 0], [1, 1, 0])
    assert item["labels"][:, 1:].sum() == 0  # weak info only at label-frame 0


def test_unlabeled_dataset(fixture_dir):
    ds = UnlabeledSet(fixture_dir / "unlab", ENC, test=False)
    assert len(ds) == 7
    item = ds[0]
    assert item["audio"].shape == (160000,)  # 8 s padded to 10 s
    assert item["labels"].sum() == 0
    assert item["padded_ratio"] > 1.0


def test_multisource_batcher(fixture_dir):
    strong_tsv = pd.DataFrame(
        [(f"strong_{i}.wav", 0.0, 5.0, "Speech") for i in range(6)],
        columns=["filename", "onset", "offset", "event_label"],
    )
    weak_tsv = pd.DataFrame(
        [(f"weak_{i}.wav", "Dog") for i in range(5)],
        columns=["filename", "event_labels"],
    )
    datasets = {
        "synth": StronglyAnnotatedSet(fixture_dir / "strong", strong_tsv, ENC),
        "weak": WeakSet(fixture_dir / "weak", weak_tsv, ENC),
        "unlabeled": UnlabeledSet(fixture_dir / "unlab", ENC),
    }
    b = MultiSourceBatcher(datasets, {"synth": 2, "weak": 2, "unlabeled": 3}, seed=0)
    # epoch length = min(6//2, 5//2, 7//3) = 2
    assert b.steps_per_epoch == 2
    batches = list(b.epoch())
    assert len(batches) == 2
    for batch in batches:
        assert batch["synth"]["audio"].shape == (2, 160000)
        assert batch["weak"]["labels"].shape == (2, 3, 156)
        assert batch["unlabeled"]["audio"].shape == (3, 160000)


def test_batcher_sharding(fixture_dir):
    ds = {"unlabeled": UnlabeledSet(fixture_dir / "unlab", ENC)}
    full = MultiSourceBatcher(ds, {"unlabeled": 1}, seed=0)
    shard0 = MultiSourceBatcher(ds, {"unlabeled": 1}, seed=0, shard_index=0, num_shards=2)
    shard1 = MultiSourceBatcher(ds, {"unlabeled": 1}, seed=0, shard_index=1, num_shards=2)
    assert full.steps_per_epoch == 7
    assert shard0.steps_per_epoch == 4  # ceil(7/2)
    assert shard1.steps_per_epoch == 3


def test_separated_set(fixture_dir, tmp_path):
    from desed_task_tpu.data.datasets import SeparatedSet

    tsv = pd.DataFrame(
        [("strong_0.wav", 0.5, 2.0, "Speech"), ("strong_1.wav", 1.0, 2.0, "Dog")],
        columns=["filename", "onset", "offset", "event_label"],
    )
    base = StronglyAnnotatedSet(fixture_dir / "strong", tsv, ENC, test=True)
    sep_dir = tmp_path / "sep"
    sep_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):  # only 2 of 4 sources exist -> rest are silence
        x = (rng.standard_normal(160000) * 0.1).astype(np.float32)
        write_wav(sep_dir / f"strong_0_src{i}.wav", x, 16000)
    ds = SeparatedSet(sep_dir, base, n_src=4)
    item = ds[0]
    assert item["sources"].shape == (4, 160000)
    assert np.abs(item["sources"][0]).max() > 0
    assert (item["sources"][2] == 0).all()
    assert item["labels"].shape == (3, 156)


def test_generate_tsv_wav_durations(fixture_dir, tmp_path):
    from desed_task_tpu.tools.download import generate_tsv_wav_durations

    df = generate_tsv_wav_durations(fixture_dir / "unlab", tmp_path / "dur.tsv")
    assert len(df) == 7
    np.testing.assert_allclose(df["duration"], 8.0, atol=1e-3)
    assert (tmp_path / "dur.tsv").exists()
