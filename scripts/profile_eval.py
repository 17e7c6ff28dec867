"""Profile the host-math cost of one validation metric pass (ROADMAP perf #1).

The 300-epoch rehearsal spent ~15 s per validation (60 of them = 16 min,
~45% of productive wall time vs ~21 min of train steps). This script times
each component of SEDValidator._evaluate_one at the rehearsal's shapes with
synthetic scores on CPU, to attribute the 15 s before optimizing.

Run: python scripts/profile_eval.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from desed_task_tpu.inference.decode import batched_decode_preds
from desed_task_tpu.inference.maestro import (
    get_segment_scores_and_overlap_add,
    merge_maestro_ground_truth,
)
from desed_task_tpu.labels.encoder import ManyHotEncoder
from desed_task_tpu.metrics.psds import compute_per_intersection_macro_f1
from desed_task_tpu.metrics.segments import auroc, best_fscore

rng = np.random.default_rng(0)

C, T = 27, 156
N_SYNTH = 400
N_MAESTRO_FILES = 150  # each ~3 windows in the rehearsal corpus
WINDOWS_PER_FILE = 3
CLASSES = [f"class_{i:02d}" for i in range(C)]
MEDIAN = [7] * C

enc = ManyHotEncoder(CLASSES, audio_len=10.0, frame_len=2048, frame_hop=256,
                     net_pooling=4, fs=16000)


def timed(label, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt*1000:9.1f} ms")
    return out, dt


def synth_scores(n):
    # structured scores so events exist: random blocks above threshold
    x = rng.random((n, C, T)).astype(np.float32) * 0.45
    for i in range(n):
        for _ in range(4):
            c = rng.integers(C)
            a = rng.integers(T - 20)
            x[i, c, a:a + rng.integers(5, 40)] += 0.5
    return np.clip(x, 0, 1)


def gt_events(files, classes, rate=3):
    rows = []
    for f in files:
        for _ in range(rate):
            c = classes[rng.integers(len(classes))]
            on = float(rng.random() * 8)
            rows.append((f, on, on + 0.5 + rng.random() * 1.5, c))
    return pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])


def main():
    total = {}

    # ---- synth branch: decode (median + events at th=0.5) + intersection F1
    preds = synth_scores(N_SYNTH)
    files = [f"synth_{i}.wav" for i in range(N_SYNTH)]
    gt = gt_events(files, CLASSES[:10])
    dur = pd.DataFrame({"filename": files, "duration": [10.0] * N_SYNTH})

    (_, _, dfs), t = timed(
        "synth decode (median+events, want_raw/post=False)",
        batched_decode_preds, preds, files, enc,
        thresholds=(0.5,), median_filter=MEDIAN, want_raw=False, want_post=False,
    )
    total["synth_decode"] = t
    _, t = timed("synth intersection F1", compute_per_intersection_macro_f1,
                 dfs[0.5], gt, dur)
    total["synth_inter_f1"] = t

    # ---- maestro branch: decode(post) + overlap-add + best_fscore + auroc
    n_win = N_MAESTRO_FILES * WINDOWS_PER_FILE
    m_preds = synth_scores(n_win)
    m_files = []
    m_gt_clip = {}
    for i in range(N_MAESTRO_FILES):
        for w in range(WINDOWS_PER_FILE):
            on_cs = w * 500
            cid = f"maestro_{i}-{on_cs}-{on_cs + 1000}"
            m_files.append(cid + ".wav")
            evs = []
            for _ in range(3):
                c = CLASSES[10 + rng.integers(17)]
                a = float(rng.random() * 8)
                evs.append((a, a + 1.0, c))
            m_gt_clip[cid] = evs

    (_, post, _), t = timed(
        "maestro decode (want_post=True, as_arrays)",
        batched_decode_preds, m_preds, m_files, enc,
        thresholds=(), median_filter=MEDIAN, want_raw=False, want_post=True,
        as_arrays=True,
    )
    total["maestro_decode"] = t

    gt_m, t = timed("maestro merge gt", merge_maestro_ground_truth, m_gt_clip)
    total["maestro_merge_gt"] = t
    durations = {fid: max(off for _, off, _ in evs) if evs else 1.0
                 for fid, evs in gt_m.items()}
    seg_scores, t = timed("maestro overlap-add (as_arrays)",
                          get_segment_scores_and_overlap_add,
                          post, durations, CLASSES, 1.0, True)
    total["maestro_overlap_add"] = t
    seg_scores = {k: v for k, v in seg_scores.items() if k in gt_m}
    gt_tuples = {k: list(gt_m[k]) for k in seg_scores}
    from desed_task_tpu.metrics.segments import segment_scores_and_labels

    pre, t = timed("maestro segment flatten (shared)",
                   segment_scores_and_labels,
                   seg_scores, gt_tuples, durations, 1.0, CLASSES)
    total["maestro_segment_flatten"] = t
    _, t = timed("maestro best_fscore", best_fscore,
                 seg_scores, gt_tuples, durations, 1.0, CLASSES,
                 precomputed=pre)
    total["maestro_best_fscore"] = t
    _, t = timed("maestro auroc (mpauc 0.1)", auroc,
                 seg_scores, gt_tuples, durations, 1.0, 0.1, CLASSES,
                 precomputed=pre)
    total["maestro_auroc"] = t

    print("-" * 66)
    s = sum(total.values())
    print(f"{'TOTAL host math, one model pass':55s} {s*1000:9.1f} ms")
    for k, v in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"  {k:30s} {v*1000:8.1f} ms  {100*v/s:5.1f}%")
    print("(x2 models per validation; excludes predict dispatch)")


if __name__ == "__main__":
    main()
