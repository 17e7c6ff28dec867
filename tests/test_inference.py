"""Decode / median filter / overlap-add / segment-metric tests."""

import numpy as np
import pandas as pd
import pytest
from scipy.ndimage import median_filter as scipy_median

import jax.numpy as jnp

from desed_task_tpu.inference import (
    batched_decode_preds,
    create_score_dataframe,
    get_segment_scores_and_overlap_add,
    merge_maestro_ground_truth,
    merge_overlapping_events,
)
from desed_task_tpu.labels import ManyHotEncoder
from desed_task_tpu.metrics.segments import auroc, best_fscore
from desed_task_tpu.ops.median import ClassWiseMedianFilter, classwise_median_filter

ENC = ManyHotEncoder(["A", "B", "C"], 10, 2048, 256, 4, 16000)


def test_median_filter_matches_scipy(rng):
    x = rng.random((5, 3, 50)).astype(np.float32)  # [B, C, T]
    for k in [1, 3, 7, 9]:
        ours = np.asarray(
            classwise_median_filter(jnp.asarray(x), [k, k, k], class_axis=-2)
        )
        ref = scipy_median(x, size=(1, 1, k))
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_classwise_median_different_windows(rng):
    x = rng.random((2, 3, 40)).astype(np.float32)
    ours = np.asarray(classwise_median_filter(jnp.asarray(x), [3, 1, 7]))
    np.testing.assert_allclose(ours[:, 0], scipy_median(x, (1, 1, 3))[:, 0], atol=1e-7)
    np.testing.assert_allclose(ours[:, 1], x[:, 1], atol=0)
    np.testing.assert_allclose(ours[:, 2], scipy_median(x, (1, 1, 7))[:, 2], atol=1e-7)


def test_reference_api_median_filter(rng):
    x = rng.random((50, 3)).astype(np.float32)  # [T, C] reference layout
    f = ClassWiseMedianFilter((3, 5, 1))
    out = f(x)
    np.testing.assert_allclose(out[:, 0], scipy_median(x[:, :1], (3, 1))[:, 0], atol=1e-7)
    np.testing.assert_allclose(out[:, 1], scipy_median(x[:, 1:2], (5, 1))[:, 0], atol=1e-7)


def test_batched_decode_preds(rng):
    B, C, T = 2, 3, 156
    preds = np.zeros((B, C, T), np.float32)
    preds[0, 0, 10:30] = 0.9  # one A event in clip 0
    preds[1, 2, 100:150] = 0.7  # one C event in clip 1
    raw, post, dfs = batched_decode_preds(
        preds, ["/x/clip0.wav", "/x/clip1.wav"], ENC, thresholds=[0.5, 0.8]
    )
    assert set(raw) == {"clip0", "clip1"}
    assert list(raw["clip0"].columns) == ["onset", "offset", "A", "B", "C"]
    df5 = dfs[0.5]
    assert len(df5) == 2
    a_row = df5[df5.event_label == "A"].iloc[0]
    np.testing.assert_allclose(a_row.onset, ENC._frame_to_time(10))
    np.testing.assert_allclose(a_row.offset, ENC._frame_to_time(30))
    assert len(dfs[0.8]) == 1  # only the 0.9-scored event survives


def test_batched_decode_with_median_and_padding(rng):
    B, C, T = 1, 3, 156
    preds = rng.random((B, C, T)).astype(np.float32)
    raw, post, dfs = batched_decode_preds(
        preds,
        ["clip.wav"],
        ENC,
        thresholds=[0.5],
        median_filter=[3, 3, 3],
        pad_indx=[0.5],  # only first half is real audio
    )
    assert len(raw["clip"]) == 78
    assert len(post["clip"]) == 78


def test_merge_overlapping_events():
    gt = {"f": [(0.0, 2.0, "A"), (1.5, 3.0, "A"), (5.0, 6.0, "A"), (1.0, 2.0, "B")]}
    out = merge_overlapping_events(gt)
    a = sorted(ev for ev in out["f"] if ev[2] == "A")
    assert a == [[0.0, 3.0, "A"], [5.0, 6.0, "A"]]


def test_merge_maestro_ground_truth():
    clip_gt = {
        "file1-0-1000": [(1.0, 2.0, "A")],
        "file1-500-1500": [(0.0, 1.0, "A")],  # file time 5..6
    }
    out = merge_maestro_ground_truth(clip_gt)
    assert sorted(out["file1"]) == [[1.0, 2.0, "A"], [5.0, 6.0, "A"]]


def test_overlap_add_constant_scores():
    """Overlapping constant-score windows must average back to the constant."""
    classes = ["A", "B"]
    durations = {"f1": 20.0}
    frame_scores = {}
    for onset in range(0, 11, 5):  # windows at 0, 5, 10 (10 s each)
        arr = np.full((156, 2), 0.4)
        ts = np.arange(157) * 0.064
        frame_scores[f"f1-{onset*100}-{(onset+10)*100}"] = create_score_dataframe(
            arr, ts, classes
        )
    segs = get_segment_scores_and_overlap_add(frame_scores, durations, classes)
    df = segs["f1"]
    assert len(df) == 20
    np.testing.assert_allclose(df["A"].to_numpy(), 0.4, atol=1e-6)
    assert df["offset"].iloc[-1] == 20.0


def test_overlap_add_window_past_declared_duration():
    """A window may extend past the gt-derived file duration (durations come
    from max event offsets in the validator); the buffer grows and the
    output trims back to the declared duration."""
    classes = ["A"]
    durations = {"f1": 8.7}  # gt ends at 8.7 s, but the window covers 0-10 s
    arr = np.full((156, 1), 0.25)
    ts = np.arange(157) * 0.064
    frame_scores = {"f1-000000-001000": create_score_dataframe(arr, ts, classes)}
    segs = get_segment_scores_and_overlap_add(frame_scores, durations, classes)
    df = segs["f1"]
    assert len(df) == 9  # ceil(8.7)
    assert df["offset"].iloc[-1] == 8.7
    np.testing.assert_allclose(df["A"].to_numpy(), 0.25, atol=1e-6)


def test_overlap_add_skips_files_without_duration():
    """Windows of files absent from the duration map (no surviving gt
    events) are skipped instead of crashing."""
    classes = ["A"]
    arr = np.full((156, 1), 0.5)
    ts = np.arange(157) * 0.064
    frame_scores = {
        "known-000000-001000": create_score_dataframe(arr, ts, classes),
        "unknown-000000-001000": create_score_dataframe(arr, ts, classes),
    }
    segs = get_segment_scores_and_overlap_add(frame_scores, {"known": 10.0}, classes)
    assert set(segs) == {"known"}


def test_segment_auroc_against_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    classes = ["A"]
    n_clips = 30
    scores, gts, durs = {}, {}, {}
    for i in range(n_clips):
        cid = f"c{i}"
        s = rng.random((10, 1))
        ts = np.arange(11.0)
        scores[cid] = create_score_dataframe(s, ts, classes)
        durs[cid] = 10.0
        gts[cid] = [(2.0, 5.0, "A")] if rng.random() > 0.4 else []
    res, aux = auroc(scores, gts, durs, segment_length=1.0)
    # build the same flat segment representation for sklearn
    y, s = [], []
    for i in range(n_clips):
        cid = f"c{i}"
        vals = scores[cid]["A"].to_numpy()
        for seg in range(10):
            s.append(vals[seg])
            y.append(bool(gts[cid]) and (seg >= 2 and seg < 5))
    auc_sk = sklearn.roc_auc_score(y, s)
    np.testing.assert_allclose(res["A"], auc_sk, atol=1e-9)
    p_sk = sklearn.roc_auc_score(y, s, max_fpr=0.1)
    res_p, _ = auroc(scores, gts, durs, max_fpr=0.1)
    np.testing.assert_allclose(res_p["A"], p_sk, atol=1e-9)


def test_best_fscore(rng):
    classes = ["A"]
    scores, gts, durs = {}, {}, {}
    s = np.r_[np.full(5, 0.9), np.full(5, 0.1)][:, None]
    scores["c"] = create_score_dataframe(s, np.arange(11.0), classes)
    gts["c"] = [(0.0, 5.0, "A")]
    durs["c"] = 10.0
    res, aux = best_fscore(scores, gts, durs)
    assert res["A"] == 1.0  # threshold between 0.1 and 0.9 separates perfectly
    assert res["macro_average"] == 1.0
    assert 0.1 <= aux["thresholds"]["A"] <= 0.9


def test_batched_decode_output_gating(rng):
    """want_raw/want_post gate DataFrame construction without touching
    event extraction (the validation-objective fast path)."""
    preds = rng.random((4, 3, 31)).astype("float32")
    names = [f"f{i}.wav" for i in range(4)]
    full_raw, full_post, full_dfs = batched_decode_preds(
        preds, names, ENC, thresholds=(0.3, 0.6), median_filter=[3, 3, 3]
    )
    raw, post, dfs = batched_decode_preds(
        preds, names, ENC, thresholds=(0.3, 0.6), median_filter=[3, 3, 3],
        want_raw=False, want_post=False,
    )
    assert raw == {} and post == {}
    for th in (0.3, 0.6):
        import pandas as pd

        pd.testing.assert_frame_equal(dfs[th], full_dfs[th])
    # post-only (the maestro overlap-add path)
    raw, post, dfs = batched_decode_preds(
        preds, names, ENC, thresholds=(), median_filter=[3, 3, 3],
        want_raw=False,
    )
    assert raw == {} and dfs == {}
    assert set(post) == set(full_post)
    for k in post:
        import pandas as pd

        pd.testing.assert_frame_equal(post[k], full_post[k])


def _events_brute_force(post, encoder, filenames, threshold):
    """Per-clip/per-class reference extraction (the pre-vectorization loop)."""
    from desed_task_tpu.labels.events import find_contiguous_regions

    rows = []
    for j in range(post.shape[0]):
        for c in range(post.shape[1]):
            for a, b in find_contiguous_regions(post[j, c] > threshold):
                rows.append(
                    (
                        encoder.labels[c],
                        float(encoder._frame_to_time(a)),
                        float(encoder._frame_to_time(b)),
                        filenames[j],
                    )
                )
    return pd.DataFrame(
        rows, columns=["event_label", "onset", "offset", "filename"]
    )


def test_vectorized_event_extraction_matches_brute_force(rng):
    B, C, T = 7, 3, 64
    preds = rng.random((B, C, T)).astype(np.float32)
    names = [f"clip{i}.wav" for i in range(B)]
    _, _, dfs = batched_decode_preds(
        preds, names, ENC, thresholds=(0.3, 0.5, 0.9), median_filter=None
    )
    for th in (0.3, 0.5, 0.9):
        ref = _events_brute_force(preds, ENC, names, th)
        got = dfs[th]
        assert len(got) == len(ref)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref.reset_index(drop=True),
            check_dtype=False,
        )


def test_numpy_median_filter_matches_jax(rng):
    from desed_task_tpu.ops.median import classwise_median_filter_np

    x = rng.random((4, 5, 50)).astype(np.float32)
    lens = [1, 3, 7, 3, 9]
    ours = classwise_median_filter_np(x, lens, class_axis=-2)
    ref = np.asarray(classwise_median_filter(jnp.asarray(x), lens, class_axis=-2))
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_as_arrays_pipeline_matches_dataframe_pipeline(rng):
    """decode(as_arrays) -> overlap-add -> segment metrics must reproduce the
    DataFrame pipeline exactly, including class-subset selection."""
    B, C, T = 6, 3, 156
    preds = rng.random((B, C, T)).astype(np.float32)
    names = [f"file{i % 2}-{(i // 2) * 500}-{(i // 2) * 500 + 1000}.wav"
             for i in range(B)]
    med = [3, 5, 1]
    sub_classes = ["C", "A"]  # subset + reorder vs encoder order

    _, post_df, _ = batched_decode_preds(
        preds, names, ENC, thresholds=(), median_filter=med
    )
    _, post_arr, _ = batched_decode_preds(
        preds, names, ENC, thresholds=(), median_filter=med, as_arrays=True
    )
    durations = {"file0": 20.0, "file1": 20.0}
    seg_df = get_segment_scores_and_overlap_add(post_df, durations, sub_classes)
    seg_arr = get_segment_scores_and_overlap_add(
        post_arr, durations, sub_classes, as_arrays=True
    )
    assert set(seg_df) == set(seg_arr)
    for k in seg_df:
        np.testing.assert_allclose(
            seg_df[k][sub_classes].to_numpy(), seg_arr[k].values, atol=1e-12
        )
    gts = {
        "file0": [(1.0, 3.0, "A"), (2.0, 2.0, "C")],
        "file1": [(0.0, 20.0, "C")],
    }
    from desed_task_tpu.metrics.segments import segment_scores_and_labels

    res_df = best_fscore(seg_df, gts, durations, 1.0, sub_classes)
    res_arr = best_fscore(seg_arr, gts, durations, 1.0, sub_classes)
    assert res_df[0] == res_arr[0]
    auc_df = auroc(seg_df, gts, durations, 1.0, 0.1, sub_classes)
    auc_arr = auroc(seg_arr, gts, durations, 1.0, 0.1, sub_classes)
    assert auc_df[0] == auc_arr[0]
    # precomputed path gives identical results
    pre = segment_scores_and_labels(seg_arr, gts, durations, 1.0, sub_classes)
    assert best_fscore(seg_arr, gts, durations, 1.0, sub_classes,
                       precomputed=pre)[0] == res_arr[0]


def test_segment_labels_brute_force(rng):
    """Vectorized segment labeling matches the per-segment overlap scan,
    including zero-length events and boundary-aligned events."""
    from desed_task_tpu.inference.decode import ScoreCurve
    from desed_task_tpu.metrics.segments import segment_scores_and_labels

    classes = ["A", "B"]
    n_seg = 12
    gt_cases = [
        [(0.0, 1.0, "A")],
        [(1.0, 1.0, "A")],          # zero-length on a boundary -> no segment
        [(1.5, 1.5, "B")],          # zero-length inside segment 1
        [(3.0, 4.0, "B"), (3.9, 7.2, "B")],
        [(11.5, 13.0, "A")],        # runs past the clip
    ]
    for gt in gt_cases:
        vals = rng.random((n_seg, 2))
        ts = np.arange(n_seg + 1, dtype=float)
        scores = {"c": ScoreCurve(ts, vals, ("A", "B"))}
        _, labels, _ = segment_scores_and_labels(
            scores, {"c": gt}, {"c": float(n_seg)}, 1.0, classes
        )
        for ci, c in enumerate(classes):
            expected = []
            for s in range(n_seg):
                a, b = float(s), float(s + 1)
                expected.append(
                    any(off > a and on < b for on, off, lab in gt if lab == c)
                )
            np.testing.assert_array_equal(labels[c], expected, err_msg=f"{gt} {c}")


def test_segment_fixed_threshold_fscore(rng):
    from desed_task_tpu.metrics.segments import fscore

    classes = ["A"]
    s = np.r_[np.full(5, 0.9), np.full(5, 0.1)][:, None]
    scores = {"c": create_score_dataframe(s, np.arange(11.0), classes)}
    gts = {"c": [(0.0, 5.0, "A")]}
    durs = {"c": 10.0}
    res, aux = fscore(scores, gts, durs, threshold=0.5)
    assert res["A"] == 1.0 and res["macro_average"] == 1.0
    res_bad, _ = fscore(scores, gts, durs, threshold=0.05)  # all positive
    # 10 predicted, 5 true -> P=0.5, R=1 -> F1=2/3
    np.testing.assert_allclose(res_bad["A"], 2 / 3)
