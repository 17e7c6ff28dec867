"""Validation / test harnesses: batched prediction + metric composition.

Replaces the reference's validation_step / on_test_epoch_end machinery
(2024 sed_trainer_pretrained.py:441-821, 828-1298): batched forward of
student and teacher, vectorized decode (inference/decode.py), then the
DCASE metric battery from our metrics package:

  validation: weak multilabel macro-F1 @0.5 + DESED synth metric
              (intersection-F1 / PSDS1) + MAESTRO segment metric
              (best-F1 / mAUC / mpAUC), obj_metric = sum of the three
              (sed_trainer_pretrained.py:742-776)
  test:       PSDS1 + PSDS2 over 50 thresholds, collar/intersection F1,
              MAESTRO overlap-added segment scores.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..data.batcher import collate
from ..inference.decode import batched_decode_preds
from ..inference.maestro import (
    get_segment_scores_and_overlap_add,
    merge_maestro_ground_truth,
)
from ..labels.encoder import ManyHotEncoder
from ..metrics.event_based import event_based_metrics
from ..metrics.psds import (
    compute_per_intersection_macro_f1,
    compute_psds_from_operating_points,
)
from ..metrics.segments import auroc, best_fscore, segment_scores_and_labels


def multilabel_f1_macro(
    probs: np.ndarray, targets: np.ndarray, threshold: float = 0.5
) -> float:
    """torchmetrics MultilabelF1Score(average='macro') semantics."""
    preds = np.asarray(probs) >= threshold
    t = np.asarray(targets) > 0.5
    tp = (preds & t).sum(0)
    fp = (preds & ~t).sum(0)
    fn = (~preds & t).sum(0)
    denom = 2 * tp + fp + fn
    f1 = np.where(denom > 0, 2 * tp / np.maximum(denom, 1), 0.0)
    return float(f1.mean())


def _predict_cache_all(
    predict_fn, params, stats, cache, scaler, median_filter, want_raw: bool
):
    """ONE-dispatch forward of a whole DeviceEvalCache.

    lax.scan over the resident batches inside a single jitted program, with
    the per-class median filter applied on device; the host then fetches the
    stacked scores once. Replaces per-batch dispatch+fetch round trips —
    the dominant validation cost on a tunneled TPU (~100 round trips per
    validation in the 300-epoch rehearsal).

    Returns (strong_np | None, post_np | None, weak_np), truncated to
    len(cache). post_np is None when the filter cannot run on device
    (callable median filters stay host-side)."""
    import jax
    import jax.numpy as jnp

    from ..data.device_cache import AUDIO_SCALE
    from ..ops.median import classwise_median_filter

    on_device_median = isinstance(median_filter, (list, tuple, np.ndarray))
    med_key = (
        tuple(int(f) for f in median_filter) if on_device_median else None
    )
    fetch_raw = want_raw or not on_device_median
    # compiled-scan cache lives on the DeviceEvalCache; predict_fn is alive
    # for the whole run, so id() is a stable key here
    scans = getattr(cache, "_predict_scans", None)
    if scans is None:
        scans = cache._predict_scans = {}
    key = (id(predict_fn), med_key, fetch_raw)
    run = scans.get(key)
    if run is None:
        bs = cache.batch_size
        has_emb = cache.stores["embeddings"] is not None
        mesh = getattr(cache, "mesh", None)
        n_shards = mesh.size if mesh is not None else 1
        # local starts: each shard scans its own resident rows; single-device
        # this is simply every batch
        starts = np.arange(0, cache.n_pad // n_shards, bs, dtype=np.int32)

        def scan_batches(params, stats, scaler, audio_store, emb_store):
            def body(carry, start):
                audio = (
                    jax.lax.dynamic_slice_in_dim(audio_store, start, bs, 0)
                    .astype(jnp.float32)
                    / AUDIO_SCALE
                )
                kw = {}
                if has_emb:
                    kw["embeddings"] = jax.lax.dynamic_slice_in_dim(
                        emb_store, start, bs, 0
                    )
                strong, weak = predict_fn(
                    params, stats, audio, scaler=scaler, **kw
                )
                outs = (weak,)
                if med_key is not None:
                    outs = (
                        classwise_median_filter(strong, med_key, class_axis=-2),
                    ) + outs
                if fetch_raw:
                    outs = (strong,) + outs
                return carry, outs

            _, outs = jax.lax.scan(body, None, jnp.asarray(starts))
            return outs

        if mesh is not None:
            # SPMD eval (SURVEY §5): every device scans its row shard of the
            # stores with replicated params; the stacked score arrays come
            # back sharded on the leading (batch-of-batches) axis and the
            # single np.asarray fetch below IS the gather to host 0. Shard
            # order == global row order, so downstream truncation to n is
            # unchanged. No collectives: pure data-parallel forward.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            axis = cache.mesh_axis
            emb_spec = P(axis) if has_emb else P()
            mapped = shard_map(
                scan_batches,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(axis), emb_spec),
                out_specs=P(axis),
                check_rep=False,
            )
            run = jax.jit(mapped)
        else:
            run = jax.jit(scan_batches)

        scans[key] = run

    outs = run(
        params, stats, scaler, cache.stores["audio"], cache.stores["embeddings"]
    )
    outs = [
        np.asarray(o).reshape(-1, *o.shape[2:])[: cache.n] for o in outs
    ]
    weak_np = outs[-1]
    strong_np = outs[0] if fetch_raw else None
    post_np = outs[-2] if med_key is not None else None
    return strong_np, post_np, weak_np


def iterate_batches(dataset, batch_size: int):
    items = []
    for i in range(len(dataset)):
        items.append(dataset[i])
        if len(items) == batch_size:
            yield collate(items)
            items = []
    if items:
        yield collate(items)


def predict_dataset(
    predict_fn: Callable,
    params,
    stats,
    dataset,
    encoder: ManyHotEncoder,
    batch_size: int = 24,
    thresholds=(0.5,),
    median_filter=None,
    scaler=None,
    want_raw: bool = True,
    want_post: bool = True,
    want_events: bool = True,
    as_arrays: bool = False,
):
    """Forward a dataset, decode. Returns (scores_raw, scores_post,
    pred_dfs {th: DataFrame}, weak_probs [N, C], weak_targets [N, C]).

    want_raw/want_post/want_events gate which outputs are materialized —
    per-clip score-DataFrame construction dominates a decode pass, so
    callers that only need weak probs (or only event lists) skip it. Gated
    outputs come back empty.

    `dataset` may be a data.device_cache.DeviceEvalCache — the whole pass
    then runs as ONE device dispatch (lax.scan over resident batches, median
    filter on device) and a single score fetch, instead of a host round trip
    per batch (the tunnel-latency killer of the 300-epoch rehearsal)."""
    from ..data.device_cache import DeviceEvalCache

    scores_raw_all, scores_post_all = {}, {}
    dfs_all = {th: [] for th in thresholds}
    weak_probs, weak_targets = [], []
    if isinstance(dataset, DeviceEvalCache):
        strong_np, post_np, weak_np = _predict_cache_all(
            predict_fn, params, stats, dataset, scaler, median_filter,
            want_raw=want_raw,
        )
        if want_raw or want_post or want_events:
            raw, post, dfs = batched_decode_preds(
                post_np if strong_np is None else strong_np,
                dataset.filenames, encoder,
                thresholds=thresholds if want_events else (),
                median_filter=None if post_np is not None else median_filter,
                want_raw=want_raw, want_post=want_post,
                as_arrays=as_arrays,
                post_preds=post_np,
            )
            scores_raw_all.update(raw)
            scores_post_all.update(post)
            for th in thresholds if want_events else ():
                dfs_all[th].append(dfs[th])
        weak_probs.append(weak_np)
        weak_targets.append((dataset.labels.sum(-1) > 0).astype(np.float32))
        return _assemble_predictions(
            scores_raw_all, scores_post_all, dfs_all, weak_probs,
            weak_targets, thresholds,
        )
    for batch in iterate_batches(dataset, batch_size):
        n_real = len(batch["audio"])
        audio = np.asarray(batch["audio"])
        if n_real < batch_size:  # pad to the static jit shape (one compile)
            audio = np.concatenate(
                [audio, np.zeros((batch_size - n_real, *audio.shape[1:]), audio.dtype)]
            )
        kwargs = {}
        if "embeddings" in batch:
            emb = np.asarray(batch["embeddings"])
            if n_real < batch_size:
                emb = np.concatenate(
                    [emb, np.zeros((batch_size - n_real, *emb.shape[1:]), emb.dtype)]
                )
            kwargs["embeddings"] = jnp.asarray(emb)
        strong, weak = predict_fn(
            params, stats, jnp.asarray(audio), scaler=scaler, **kwargs
        )
        strong = np.asarray(strong)[:n_real]
        weak = np.asarray(weak)[:n_real]
        filenames = batch.get(
            "filename", [f"clip_{len(weak_probs)}_{i}" for i in range(n_real)]
        )
        if want_raw or want_post or want_events:
            raw, post, dfs = batched_decode_preds(
                strong,
                filenames,
                encoder,
                thresholds=thresholds if want_events else (),
                median_filter=median_filter,
                want_raw=want_raw, want_post=want_post,
                as_arrays=as_arrays,
            )
            scores_raw_all.update(raw)
            scores_post_all.update(post)
            for th in thresholds if want_events else ():
                dfs_all[th].append(dfs[th])
        weak_probs.append(np.asarray(weak))
        weak_targets.append((np.asarray(batch["labels"]).sum(-1) > 0).astype(np.float32))
    return _assemble_predictions(
        scores_raw_all, scores_post_all, dfs_all, weak_probs, weak_targets,
        thresholds,
    )


def _assemble_predictions(scores_raw_all, scores_post_all, dfs_all,
                          weak_probs, weak_targets, thresholds):
    pred_dfs = {
        th: (
            pd.concat(v, ignore_index=True)
            if v
            else pd.DataFrame(columns=["event_label", "onset", "offset", "filename"])
        )
        for th, v in dfs_all.items()
    }
    return (
        scores_raw_all,
        scores_post_all,
        pred_dfs,
        np.concatenate(weak_probs) if weak_probs else np.zeros((0, 1)),
        np.concatenate(weak_targets) if weak_targets else np.zeros((0, 1)),
    )


class SEDValidator:
    """Composable validation callback for TrainLoop.

    datasets: dict with optional keys
      "weak":   dataset for clip-level F1
      "synth":  dataset + "synth_gt" DataFrame + "synth_dur" DataFrame
      "maestro": dataset (windowed clips) + "maestro_gt" clip-level events
    """

    def __init__(
        self,
        predict_fn,
        encoder: ManyHotEncoder,
        weak_set=None,
        synth_set=None,
        synth_gt: Optional[pd.DataFrame] = None,
        synth_dur: Optional[pd.DataFrame] = None,
        maestro_set=None,
        maestro_gt: Optional[dict] = None,
        maestro_classes: Optional[list] = None,
        batch_size: int = 24,
        median_filter=None,
        obj_metric_synth_type: str = "intersection",
        obj_metric_maestro_type: str = "fmo",
        desed_classes: Optional[list] = None,
        use_teacher: bool = False,
        log_teacher: bool = True,
        trajectory_psds: int = 0,
    ):
        self.predict_fn = predict_fn
        self.encoder = encoder
        self.weak_set = weak_set
        self.synth_set = synth_set
        self.synth_gt = synth_gt
        self.synth_dur = synth_dur
        self.maestro_set = maestro_set
        self.maestro_gt = maestro_gt
        self.maestro_classes = maestro_classes
        self.batch_size = batch_size
        self.median_filter = median_filter
        self.obj_metric_synth_type = obj_metric_synth_type
        self.obj_metric_maestro_type = obj_metric_maestro_type
        self.desed_classes = desed_classes or encoder.labels
        self.use_teacher = use_teacher
        self.log_teacher = log_teacher
        # when > 0: also log a PSDS1 (this many operating points) and a
        # collar event-F1 trajectory on the synth val set at every
        # validation — system-level A/B parity curves need all three
        # metric families over time, not just the obj intersection-F1
        self.trajectory_psds = trajectory_psds

    def _evaluate_one(self, state, params, stats, tag: str):
        """Full metric pass for one model (student or teacher)."""
        scalars = {}
        obj = 0.0

        if self.weak_set is not None:
            _, _, _, probs, targets = predict_dataset(
                self.predict_fn, params, stats, self.weak_set, self.encoder,
                self.batch_size, thresholds=(0.5,), scaler=state.scaler,
                want_raw=False, want_post=False, want_events=False,
            )
            weak_f1 = multilabel_f1_macro(probs, targets)
            scalars[f"val/weak/{tag}/macro_F1"] = weak_f1
            obj += weak_f1

        if self.synth_set is not None and self.synth_gt is not None:
            traj_ths = ()
            if self.trajectory_psds and tag == "student":
                n = self.trajectory_psds
                traj_ths = tuple(np.arange(1 / (n * 2), 1, 1 / n))
            _, _, dfs, _, _ = predict_dataset(
                self.predict_fn, params, stats, self.synth_set, self.encoder,
                self.batch_size, thresholds=traj_ths + (0.5,),
                median_filter=self.median_filter, scaler=state.scaler,
                want_raw=False, want_post=False,
            )
            inter_f1 = compute_per_intersection_macro_f1(
                dfs[0.5], self.synth_gt, self.synth_dur
            )
            scalars[f"val/synth/{tag}/intersection_f1_macro"] = inter_f1
            if traj_ths:
                psds1, _ = compute_psds_from_operating_points(
                    [dfs[th] for th in traj_ths], self.synth_gt,
                    self.synth_dur, dtc_threshold=0.7, gtc_threshold=0.7,
                    alpha_ct=0, alpha_st=1,
                )
                collar = event_based_metrics(
                    self.synth_gt, dfs[0.5], self.desed_classes
                )
                scalars[f"val/synth/{tag}/psds1"] = psds1
                scalars[f"val/synth/{tag}/event_f1_macro"] = (
                    collar["macro_f_measure"]
                )
            if self.obj_metric_synth_type == "intersection":
                obj += inter_f1
            elif self.obj_metric_synth_type == "collar":
                res = event_based_metrics(self.synth_gt, dfs[0.5], self.desed_classes)
                scalars[f"val/synth/{tag}/event_f1_macro"] = res["macro_f_measure"]
                obj += res["macro_f_measure"]
            else:
                raise NotImplementedError(self.obj_metric_synth_type)

        if self.maestro_set is not None and self.maestro_gt is not None:
            _, post, _, _, _ = predict_dataset(
                self.predict_fn, params, stats, self.maestro_set, self.encoder,
                self.batch_size, thresholds=(0.5,), scaler=state.scaler,
                want_raw=False, want_events=False, as_arrays=True,
            )
            classes = self.maestro_classes or self.encoder.labels
            gt = merge_maestro_ground_truth(self.maestro_gt)
            durations = {
                fid: max(off for _, off, _ in evs) if evs else 1.0
                for fid, evs in gt.items()
            }
            seg_scores = get_segment_scores_and_overlap_add(
                post, durations, classes, as_arrays=True
            )
            seg_scores = {k: v for k, v in seg_scores.items() if k in gt}
            gt_tuples = {
                k: [(on, off, c) for on, off, c in gt[k]] for k in seg_scores
            }
            # flatten segments once, share across the metric family
            pre = segment_scores_and_labels(
                seg_scores, gt_tuples, durations, 1.0, classes
            )
            if self.obj_metric_maestro_type in ("fmo", "mpauc"):
                res, _ = best_fscore(
                    seg_scores, gt_tuples, durations, 1.0, classes,
                    precomputed=pre,
                )
                scalars[f"val/maestro/{tag}/segment_f1_best"] = res["macro_average"]
                maestro_metric = res["macro_average"]
                res_p, _ = auroc(
                    seg_scores, gt_tuples, durations, 1.0, 0.1, classes,
                    precomputed=pre,
                )
                scalars[f"val/maestro/{tag}/segment_mpauc"] = res_p["mean"]
            elif self.obj_metric_maestro_type == "mauc":
                res, _ = auroc(
                    seg_scores, gt_tuples, durations, 1.0, None, classes,
                    precomputed=pre,
                )
                maestro_metric = res["mean"]
                scalars[f"val/maestro/{tag}/segment_mauc"] = maestro_metric
            else:
                raise NotImplementedError(self.obj_metric_maestro_type)
            obj += maestro_metric

        return obj, scalars

    def __call__(self, state, epoch: int):
        obj, scalars = self._evaluate_one(
            state, state.student_params, state.student_stats, "student"
        )
        if self.log_teacher:
            t_obj, t_scalars = self._evaluate_one(
                state, state.teacher_params, state.teacher_stats, "teacher"
            )
            scalars.update(t_scalars)
            scalars["val/teacher/obj_metric"] = t_obj
            if self.use_teacher:
                obj = t_obj
        return obj, scalars


def run_test(
    predict_fn,
    state,
    test_set,
    encoder: ManyHotEncoder,
    test_gt: pd.DataFrame,
    test_dur: pd.DataFrame,
    batch_size: int = 24,
    n_thresholds: int = 50,
    median_filter=None,
    use_teacher: bool = False,
    desed_classes: Optional[list] = None,
    save_dir=None,
    maestro_set=None,
    maestro_gt: Optional[dict] = None,
    maestro_classes: Optional[list] = None,
) -> dict:
    """Full DESED test battery at 50 operating points + 0.5; optional MAESTRO
    long-form overlap-add segment metrics (on_test_epoch_end:1192-1222)."""
    params = state.teacher_params if use_teacher else state.student_params
    stats = state.teacher_stats if use_teacher else state.student_stats
    thresholds = list(np.arange(1 / (n_thresholds * 2), 1, 1 / n_thresholds)) + [0.5]
    _, post, dfs, _, _ = predict_dataset(
        predict_fn, params, stats, test_set, encoder, batch_size,
        thresholds=thresholds, median_filter=median_filter, scaler=state.scaler,
        want_raw=False,
    )
    ops = [dfs[th] for th in thresholds[:-1]]
    psds1, ev1 = compute_psds_from_operating_points(
        ops, test_gt, test_dur, dtc_threshold=0.7, gtc_threshold=0.7,
        alpha_ct=0, alpha_st=1,
    )
    psds2, ev2 = compute_psds_from_operating_points(
        ops, test_gt, test_dur, dtc_threshold=0.1, gtc_threshold=0.1,
        cttc_threshold=0.3, alpha_ct=0.5, alpha_st=1,
    )
    if save_dir is not None:
        from pathlib import Path as _P

        from ..metrics.psds import plot_psd_roc

        d = _P(save_dir)
        d.mkdir(parents=True, exist_ok=True)
        plot_psd_roc(ev1, ops, 0, 1, filename=d / "PSDS_scenario1_roc.png",
                     title=f"PSDS scenario 1 = {psds1:.4f}")
        plot_psd_roc(ev2, ops, 0.5, 1, filename=d / "PSDS_scenario2_roc.png",
                     title=f"PSDS scenario 2 = {psds2:.4f}")
        # per-threshold prediction dumps, reference layout
        # (evaluation_measures.py:232-245)
        for dtc, gtc, cttc in ((0.7, 0.7, 0.3), (0.1, 0.1, 0.3)):
            pred_dir = d / f"predictions_dtc{dtc}_gtc{gtc}_cttc{cttc}"
            pred_dir.mkdir(exist_ok=True)
            for th in thresholds[:-1]:
                dfs[th].to_csv(
                    pred_dir / f"predictions_th_{th:.2f}.tsv",
                    sep="\t", index=False,
                )
    # threshold-free "sed score" variants on the postprocessed score curves
    # (exact change-point PSDS, reference evaluation_measures.py:258-303 /
    # sed_trainer_pretrained.py test battery)
    from ..metrics.scores import compute_psds_from_scores

    psds1_sed = compute_psds_from_scores(
        post, test_gt, test_dur, dtc_threshold=0.7, gtc_threshold=0.7,
        alpha_ct=0, alpha_st=1,
    )
    psds2_sed = compute_psds_from_scores(
        post, test_gt, test_dur, dtc_threshold=0.1, gtc_threshold=0.1,
        cttc_threshold=0.3, alpha_ct=0.5, alpha_st=1,
    )
    inter_f1 = compute_per_intersection_macro_f1(dfs[0.5], test_gt, test_dur)
    classes = desed_classes or sorted(set(test_gt["event_label"].dropna()))
    collar = event_based_metrics(test_gt, dfs[0.5], classes)
    results = {
        "psds1": psds1,
        "psds2": psds2,
        "psds1_sed_scores_eval": psds1_sed,
        "psds2_sed_scores_eval": psds2_sed,
        "intersection_f1_macro": inter_f1,
        "event_f1_macro": collar["macro_f_measure"],
        "scores_postprocessed": post,
        "prediction_dfs": dfs,
    }
    if maestro_set is not None and maestro_gt is not None:
        _, m_post, _, _, _ = predict_dataset(
            predict_fn, params, stats, maestro_set, encoder, batch_size,
            thresholds=(0.5,), scaler=state.scaler,
            want_raw=False, want_events=False, as_arrays=True,
        )
        m_classes = maestro_classes or encoder.labels
        gt = merge_maestro_ground_truth(maestro_gt)
        durations = {
            fid: max(off for _, off, _ in evs) if evs else 1.0
            for fid, evs in gt.items()
        }
        seg_scores = get_segment_scores_and_overlap_add(
            m_post, durations, m_classes, as_arrays=True
        )
        seg_scores = {k: v for k, v in seg_scores.items() if k in gt}
        gt_tuples = {k: [(a, b, c) for a, b, c in gt[k]] for k in seg_scores}
        pre = segment_scores_and_labels(seg_scores, gt_tuples, durations, 1.0, m_classes)
        mauc, _ = auroc(seg_scores, gt_tuples, durations, 1.0, None, m_classes,
                        precomputed=pre)
        mpauc, _ = auroc(seg_scores, gt_tuples, durations, 1.0, 0.1, m_classes,
                         precomputed=pre)
        bf, _ = best_fscore(seg_scores, gt_tuples, durations, 1.0, m_classes,
                            precomputed=pre)
        results["maestro_segment_mauc"] = mauc["mean"]
        results["maestro_segment_mpauc"] = mpauc["mean"]
        results["maestro_segment_f1_best"] = bf["macro_average"]
    return results
