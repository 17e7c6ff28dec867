"""Device-resident dataset store (data/device_cache.py): header probe,
eligibility gate, bit-exactness of the index-gather path vs host assembly,
and one-step training equivalence."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from desed_task_tpu.data import StronglyAnnotatedSet, UnlabeledSet, WeakSet, write_wav
from desed_task_tpu.data.batcher import MultiSourceBatcher, collate
from desed_task_tpu.data.device_cache import (
    DeviceResidentData,
    fits_device_cache,
    wav_data_samples,
)
from desed_task_tpu.labels.encoder import ManyHotEncoder

CLASSES = [f"c{i}" for i in range(10)]
FS = 16000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cachecorpus")
    rng = np.random.default_rng(5)
    for sub, n in [("synth", 5), ("weak", 5), ("unlab", 5)]:
        (root / sub).mkdir()
        for i in range(n):
            x = (rng.standard_normal(2 * FS) * 0.1).astype(np.float32)
            write_wav(root / sub / f"{sub}_{i}.wav", x, FS)
    synth_tsv = pd.DataFrame(
        [(f"synth_{i}.wav", 0.2, 1.5, CLASSES[i % 10]) for i in range(5)],
        columns=["filename", "onset", "offset", "event_label"],
    )
    weak_tsv = pd.DataFrame(
        [(f"weak_{i}.wav", CLASSES[i % 10]) for i in range(5)],
        columns=["filename", "event_labels"],
    )
    return root, synth_tsv, weak_tsv


def make_datasets(corpus):
    root, synth_tsv, weak_tsv = corpus
    enc = ManyHotEncoder(CLASSES, audio_len=2, frame_len=1024, frame_hop=256,
                         net_pooling=4, fs=FS)
    return {
        "synth": StronglyAnnotatedSet(root / "synth", synth_tsv, enc,
                                      pad_to=2, fs=FS),
        "weak": WeakSet(root / "weak", weak_tsv, enc, pad_to=2, fs=FS),
        "unlabeled": UnlabeledSet(root / "unlab", enc, pad_to=2, fs=FS),
    }


def test_wav_data_samples_matches_decode(corpus):
    root, *_ = corpus
    p = next((root / "synth").glob("*.wav"))
    from desed_task_tpu.data.audio_io import read_wav

    audio, _ = read_wav(p)
    assert wav_data_samples(p) == audio.shape[-1]


def test_fits_device_cache_gates_on_crop_and_size(corpus, tmp_path):
    ds = make_datasets(corpus)
    assert fits_device_cache(ds, pad_to=2 * FS, max_bytes=1 << 30)
    # byte budget exceeded -> ineligible
    assert not fits_device_cache(ds, pad_to=2 * FS, max_bytes=1000)
    # one clip longer than pad_to (would need per-epoch random crop) -> no
    long_dir = tmp_path / "long"
    long_dir.mkdir()
    write_wav(long_dir / "long_0.wav", np.zeros(3 * FS, np.float32), FS)
    enc = ds["synth"].encoder
    ds_long = dict(ds)
    ds_long["unlabeled"] = UnlabeledSet(long_dir, enc, pad_to=2, fs=FS)
    assert not fits_device_cache(ds_long, pad_to=2 * FS, max_bytes=1 << 30)


def test_gather_matches_host_collate_bitexact(corpus):
    """PCM16 sources round-trip the int16 store exactly, so index-gather
    batches equal host-assembled ones bit for bit."""
    ds = make_datasets(corpus)
    cache = DeviceResidentData.build(ds, ["synth", "weak", "unlabeled"],
                                    verbose=False)
    cache.upload(verbose=False)
    build = cache.batch_builder({"synth": 2, "weak": 2, "unlabeled": 2})

    idx = {"synth": np.array([0, 3]), "weak": np.array([1, 4]),
           "unlabeled": np.array([2, 0])}
    got = build(cache.stores, jnp.asarray(cache.flat_index(idx)))
    for slot, ids in idx.items():
        want = collate([ds[slot][i] for i in ids])
        np.testing.assert_array_equal(
            np.asarray(got[slot]["audio"]), want["audio"], err_msg=slot
        )
        np.testing.assert_array_equal(
            np.asarray(got[slot]["labels"]), want["labels"], err_msg=slot
        )
        np.testing.assert_array_equal(
            np.asarray(got[slot]["class_mask"]), want["class_mask"],
            err_msg=slot,
        )


def test_upload_chunking_small_chunks(corpus):
    """Chunked dynamic_update_slice upload reproduces the host array even
    when many chunks + a padded tail are needed."""
    ds = make_datasets(corpus)
    cache = DeviceResidentData.build(ds, ["synth", "weak", "unlabeled"],
                                    verbose=False)
    host_audio = cache.stores_host["audio"].copy()
    cache.upload(chunk_bytes=2 * FS * 2 * 2, verbose=False)  # 2 rows/chunk
    n = host_audio.shape[0]
    np.testing.assert_array_equal(
        np.asarray(cache.stores["audio"])[:n], host_audio
    )


def test_cached_train_step_matches_host_step(corpus):
    """One fp32 train step via (stores, idx) equals the host-batch step."""
    import jax

    from desed_task_tpu.models import CRNN
    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.training.mean_teacher import (
        MeanTeacherConfig, SlotSpec, create_state, make_optimizer,
        make_train_step,
    )

    ds = make_datasets(corpus)
    order = ["synth", "weak", "unlabeled"]
    sizes = {"synth": 2, "weak": 2, "unlabeled": 2}
    batcher = MultiSourceBatcher(ds, sizes, seed=0, num_workers=1)
    cfg = MeanTeacherConfig(
        slots=(SlotSpec("synth", 2, "strong"), SlotSpec("weak", 2, "weak"),
               SlotSpec("unlabeled", 2, "unlabeled")),
        mixup="soft", mixup_prob=0.5, mixup_groups=(("weak",), ("synth",)),
        const_max=2.0, self_sup_loss="mse", rampup_steps=10, ema_factor=0.99,
    )
    model = CRNN(nclass=10, n_RNN_cell=16, nb_filters=[8, 8],
                 kernel_size=[3, 3], padding=[1, 1], stride=[1, 1],
                 pooling=[[2, 8], [2, 8]], attention=True)
    mel = MelConfig(n_fft=1024, win_length=1024, hop_length=256, n_mels=64)
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)

    host_batch = next(iter(batcher.epoch(steps=1)))
    state = create_state(model, cfg, tx, jax.random.key(0), host_batch,
                         mel_cfg=mel)
    step = jax.jit(make_train_step(model, cfg, tx, sched, mel_cfg=mel))

    cache = DeviceResidentData.build(ds, order, verbose=False)
    cache.upload(verbose=False)
    build = cache.batch_builder(sizes)
    inner = make_train_step(model, cfg, tx, sched, mel_cfg=mel)
    cached_step = jax.jit(
        lambda st, stores, idx, rng: inner(st, build(stores, idx), rng)
    )

    # same indices through both paths
    b2 = MultiSourceBatcher(ds, sizes, seed=7, num_workers=1)
    idx = next(b2.epoch_indices(steps=1))
    host_items = {s: collate([ds[s][i] for i in idx[s]]) for s in idx}
    rng = jax.random.key(3)

    st1, m1 = step(state, jax.device_put(host_items), rng)
    st2, m2 = cached_step(state, cache.stores,
                          jnp.asarray(cache.flat_index(idx)), rng)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=0,
                                   atol=0, err_msg=k)
    l1 = jax.tree_util.tree_leaves(st1.student_params)
    l2 = jax.tree_util.tree_leaves(st2.student_params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_cache_predict_matches_host(corpus):
    """predict_dataset over a DeviceEvalCache equals the host-dataset path."""
    import jax

    from desed_task_tpu.data.device_cache import DeviceEvalCache
    from desed_task_tpu.models import CRNN
    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.ops.scaler import ScalerConfig
    from desed_task_tpu.training.evaluate import predict_dataset
    from desed_task_tpu.training.mean_teacher import make_predict_step

    root, synth_tsv, _ = corpus
    enc = ManyHotEncoder(CLASSES, audio_len=2, frame_len=1024, frame_hop=256,
                         net_pooling=4, fs=FS)
    ds = StronglyAnnotatedSet(root / "synth", synth_tsv, enc, pad_to=2,
                              fs=FS, test=True, return_filename=True)
    model = CRNN(nclass=10, n_RNN_cell=16, nb_filters=[8, 8],
                 kernel_size=[3, 3], padding=[1, 1], stride=[1, 1],
                 pooling=[[2, 8], [2, 8]], attention=True)
    mel = MelConfig(n_fft=1024, win_length=1024, hop_length=256, n_mels=64)
    x0 = jnp.zeros((2, 2 * FS))
    from desed_task_tpu.ops.frontend import amplitude_to_db, mel_spectrogram
    variables = model.init(jax.random.key(0),
                           amplitude_to_db(mel_spectrogram(x0, mel), mel))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    predict_fn = jax.jit(make_predict_step(model, mel, ScalerConfig()))

    host = predict_dataset(predict_fn, params, stats, ds, enc, batch_size=2)
    cache = DeviceEvalCache(ds, batch_size=2)
    cache.upload()
    dev = predict_dataset(predict_fn, params, stats, cache, enc, batch_size=2)

    np.testing.assert_array_equal(host[3], dev[3])  # weak probs
    np.testing.assert_array_equal(host[4], dev[4])  # weak targets
    assert set(host[0]) == set(dev[0])
    for k in host[0]:
        pd.testing.assert_frame_equal(host[0][k], dev[0][k])


def test_cached_accumulate_matches_host(corpus):
    """accumulate>1 through the cache (vmap'd gather over the micro axis)
    equals the host stacked-batch path."""
    import jax

    from desed_task_tpu.models import CRNN
    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.training.mean_teacher import (
        MeanTeacherConfig, SlotSpec, create_state, make_optimizer,
        make_train_step,
    )

    ds = make_datasets(corpus)
    order = ["synth", "weak", "unlabeled"]
    sizes = {"synth": 2, "weak": 2, "unlabeled": 2}
    cfg = MeanTeacherConfig(
        slots=(SlotSpec("synth", 2, "strong"), SlotSpec("weak", 2, "weak"),
               SlotSpec("unlabeled", 2, "unlabeled")),
        mixup=None, mixup_groups=(), const_max=2.0, self_sup_loss="mse",
        rampup_steps=10, ema_factor=0.99,
    )
    model = CRNN(nclass=10, n_RNN_cell=16, nb_filters=[8, 8],
                 kernel_size=[3, 3], padding=[1, 1], stride=[1, 1],
                 pooling=[[2, 8], [2, 8]], attention=True)
    mel = MelConfig(n_fft=1024, win_length=1024, hop_length=256, n_mels=64)
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)

    batcher = MultiSourceBatcher(ds, sizes, seed=0, num_workers=1)
    host_batch = next(iter(batcher.epoch(steps=1)))
    state = create_state(model, cfg, tx, jax.random.key(0), host_batch,
                         mel_cfg=mel)
    ACC = 2
    inner = make_train_step(model, cfg, tx, sched, mel_cfg=mel,
                            accumulate=ACC)

    cache = DeviceResidentData.build(ds, order, verbose=False)
    cache.upload(verbose=False)
    build = cache.batch_builder(sizes)
    cached_step = jax.jit(
        lambda st, stores, idx, rng: inner(
            st, jax.vmap(build, in_axes=(None, 0))(stores, idx), rng
        )
    )
    host_step = jax.jit(lambda st, b, rng: inner(st, b, rng))

    b2 = MultiSourceBatcher(ds, sizes, seed=9, num_workers=1)
    idxs = list(b2.epoch_indices(steps=ACC))
    flat = np.stack([cache.flat_index(i) for i in idxs])  # [ACC, B]
    host_micro = [
        {s: collate([ds[s][j] for j in i[s]]) for s in i} for i in idxs
    ]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, 0), *host_micro
    )
    rng = jax.random.key(5)
    st1, m1 = host_step(state, jax.device_put(stacked), rng)
    st2, m2 = cached_step(state, cache.stores, jnp.asarray(flat), rng)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=0, atol=0,
                                   err_msg=k)


def test_eval_cache_predict_median_and_events_match_host(corpus):
    """The one-dispatch scan path (on-device median) must reproduce the
    host path's postprocessed curves and event tables exactly."""
    import jax

    from desed_task_tpu.data.device_cache import DeviceEvalCache
    from desed_task_tpu.models import CRNN
    from desed_task_tpu.ops.frontend import (
        MelConfig, amplitude_to_db, mel_spectrogram,
    )
    from desed_task_tpu.ops.scaler import ScalerConfig
    from desed_task_tpu.training.evaluate import predict_dataset
    from desed_task_tpu.training.mean_teacher import make_predict_step

    root, synth_tsv, _ = corpus
    enc = ManyHotEncoder(CLASSES, audio_len=2, frame_len=1024, frame_hop=256,
                         net_pooling=4, fs=FS)
    ds = StronglyAnnotatedSet(root / "synth", synth_tsv, enc, pad_to=2,
                              fs=FS, test=True, return_filename=True)
    model = CRNN(nclass=10, n_RNN_cell=16, nb_filters=[8, 8],
                 kernel_size=[3, 3], padding=[1, 1], stride=[1, 1],
                 pooling=[[2, 8], [2, 8]], attention=True)
    mel = MelConfig(n_fft=1024, win_length=1024, hop_length=256, n_mels=64)
    x0 = jnp.zeros((2, 2 * FS))
    variables = model.init(jax.random.key(0),
                           amplitude_to_db(mel_spectrogram(x0, mel), mel))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    predict_fn = jax.jit(make_predict_step(model, mel, ScalerConfig()))
    med = [3, 5, 1, 3, 7, 3, 5, 1, 3, 3]

    host = predict_dataset(
        predict_fn, params, stats, ds, enc, batch_size=2,
        thresholds=(0.4, 0.6), median_filter=med, want_raw=False,
    )
    cache = DeviceEvalCache(ds, batch_size=2)
    cache.upload()
    dev = predict_dataset(
        predict_fn, params, stats, cache, enc, batch_size=2,
        thresholds=(0.4, 0.6), median_filter=med, want_raw=False,
    )
    assert set(host[1]) == set(dev[1])
    for k in host[1]:  # postprocessed curves
        np.testing.assert_allclose(
            host[1][k].to_numpy(), dev[1][k].to_numpy(), atol=1e-6
        )
    for th in (0.4, 0.6):  # event tables
        h = host[2][th].sort_values(
            ["filename", "event_label", "onset"]).reset_index(drop=True)
        d = dev[2][th].sort_values(
            ["filename", "event_label", "onset"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(h, d, check_dtype=False)
    # as_arrays mode serves ScoreCurves from the same scan
    dev_arr = predict_dataset(
        predict_fn, params, stats, cache, enc, batch_size=2,
        thresholds=(), median_filter=med, want_raw=False, as_arrays=True,
    )
    for k in host[1]:
        np.testing.assert_allclose(
            host[1][k][list(enc.labels)].to_numpy(),
            dev_arr[1][k].values, atol=1e-6,
        )


def test_eval_cache_sharded_scan_matches_single_device(corpus):
    """SPMD eval (VERDICT r4 #4): the shard_map scan over a row-sharded
    8-device cache must reproduce the single-device scan's scores exactly
    (pure data parallelism, replicated params, no collectives)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from desed_task_tpu.data.device_cache import DeviceEvalCache
    from desed_task_tpu.models import CRNN
    from desed_task_tpu.ops.frontend import (
        MelConfig, amplitude_to_db, mel_spectrogram,
    )
    from desed_task_tpu.ops.scaler import ScalerConfig
    from desed_task_tpu.parallel import make_mesh
    from desed_task_tpu.training.evaluate import predict_dataset
    from desed_task_tpu.training.mean_teacher import make_predict_step

    root, synth_tsv, _ = corpus
    enc = ManyHotEncoder(CLASSES, audio_len=2, frame_len=1024, frame_hop=256,
                         net_pooling=4, fs=FS)
    ds = StronglyAnnotatedSet(root / "synth", synth_tsv, enc, pad_to=2,
                              fs=FS, test=True, return_filename=True)
    model = CRNN(nclass=10, n_RNN_cell=16, nb_filters=[8, 8],
                 kernel_size=[3, 3], padding=[1, 1], stride=[1, 1],
                 pooling=[[2, 8], [2, 8]], attention=True)
    mel = MelConfig(n_fft=1024, win_length=1024, hop_length=256, n_mels=64)
    x0 = jnp.zeros((2, 2 * FS))
    variables = model.init(jax.random.key(0),
                           amplitude_to_db(mel_spectrogram(x0, mel), mel))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    predict_fn = jax.jit(make_predict_step(model, mel, ScalerConfig()))
    med = [3, 5, 1, 3, 7, 3, 5, 1, 3, 3]

    single = DeviceEvalCache(ds, batch_size=2)
    single.upload()
    ref = predict_dataset(
        predict_fn, params, stats, single, enc, batch_size=2,
        thresholds=(0.4, 0.6), median_filter=med,
    )

    mesh = make_mesh({"data": jax.device_count()})
    sharded = DeviceEvalCache(ds, batch_size=2, n_shards=mesh.size)
    assert sharded.n_pad % (2 * mesh.size) == 0
    sharded.upload(mesh=mesh)
    got = predict_dataset(
        predict_fn, params, stats, sharded, enc, batch_size=2,
        thresholds=(0.4, 0.6), median_filter=med,
    )

    np.testing.assert_allclose(got[3], ref[3], atol=1e-6)  # weak probs
    np.testing.assert_array_equal(got[4], ref[4])  # weak targets
    assert set(got[0]) == set(ref[0])
    for k in ref[0]:  # raw curves
        np.testing.assert_allclose(
            got[0][k].to_numpy(), ref[0][k].to_numpy(), atol=1e-6, err_msg=k
        )
    for th in (0.4, 0.6):  # event tables
        r = ref[2][th].sort_values(
            ["filename", "event_label", "onset"]).reset_index(drop=True)
        g = got[2][th].sort_values(
            ["filename", "event_label", "onset"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, r, check_dtype=False)
