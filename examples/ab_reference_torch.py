#!/usr/bin/env python
"""A/B parity harness, torch side: the REFERENCE training system without
Lightning, on the shared synthetic corpus.

Runs the reference's own nn modules and training math
(/root/reference/recipes/dcase2022_task4_baseline/local/sed_trainer.py:
training_step :237-327, update_ema :155-168, take_log :221-232, detect
:234-235) — CRNN from desed_task/nnet/CRNN.py, TorchScaler / mixup /
ExponentialWarmup imported directly from the reference checkout — while the
data pipeline (datasets, fixed-slot batcher, identical seeds) and the metric
stack (weak macro-F1, intersection-F1, PSDS battery) come from THIS repo, so
both frameworks see the same clips in the same order and are scored by the
same fixture-calibrated code. The jax side of the A/B is the ordinary
`single_run` on the same corpus/config (examples/ab_run.py).

Usage:
    python examples/ab_run.py --workdir /root/ab_data --phase generate
    python examples/ab_run.py --workdir /root/ab_data --phase torch \
        --epochs 80 --seed 42
    python examples/ab_run.py --workdir /root/ab_data --phase jax \
        --epochs 80 --seed 42
"""

from __future__ import annotations

import sys
import time
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE = Path("/root/reference")


def install_reference(path=REFERENCE):
    """Make the reference package importable (torchaudio/dcase_util stubs:
    only symbols touched at import time, never executed in the mirror)."""
    import torch

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")

        class TimeMasking(torch.nn.Module):
            """Faithful torchaudio TimeMasking for the mirror. The reference
            feeds 3-D tensors, so iid_masks is ignored and
            functional.mask_along_axis applies ONE shared mask per call on
            the last axis (torchaudio _AxisMasking.forward dim!=4 branch)."""

            def __init__(self, time_mask_param, iid_masks=False, p=1.0):
                super().__init__()
                self.mask_param = time_mask_param
                self.p = p

            def forward(self, specgram, mask_value=0.0):
                mask_param = self.mask_param
                if self.p < 1.0:
                    mask_param = min(
                        mask_param, int(specgram.shape[-1] * self.p)
                    )
                if mask_param < 1:
                    return specgram
                value = torch.rand(1) * mask_param
                min_value = torch.rand(1) * (specgram.size(-1) - value)
                mask_start = min_value.long().squeeze()
                mask_end = (min_value.long() + value.long()).squeeze()
                mask = torch.arange(0, specgram.shape[-1])
                mask = (mask >= mask_start) & (mask < mask_end)
                return specgram.masked_fill(mask, mask_value)

        tr.TimeMasking = TimeMasking
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
    if "dcase_util" not in sys.modules:
        du = types.ModuleType("dcase_util")
        dud = types.ModuleType("dcase_util.data")

        class DecisionEncoder:  # touched at import of reference encoder only
            def __init__(self, *a, **k):
                pass

        dud.DecisionEncoder = DecisionEncoder
        du.data = dud
        sys.modules["dcase_util"] = du
        sys.modules["dcase_util.data"] = dud
    if str(path) not in sys.path:
        sys.path.insert(0, str(path))


class TorchMel:
    """torchaudio MelSpectrogram equivalent from torch.stft + this repo's
    (torchaudio-semantics, golden-tested) mel filterbank — torchaudio itself
    is not installed here. Matches sed_trainer.py:83-93: hamming window,
    periodic=False, power=1, center/reflect defaults."""

    def __init__(self, feats: dict):
        import torch

        from desed_task_tpu.ops.frontend import MelConfig, mel_filterbank

        cfg = MelConfig(
            sample_rate=feats["sample_rate"], n_fft=feats["n_window"],
            win_length=feats["n_window"], hop_length=feats["hop_length"],
            f_min=feats["f_min"], f_max=feats["f_max"], n_mels=feats["n_mels"],
        )
        self.n_fft = feats["n_window"]
        self.hop = feats["hop_length"]
        self.window = torch.hamming_window(self.n_fft, periodic=False)
        fb = np.asarray(mel_filterbank(cfg), np.float32)
        if fb.shape[0] != feats["n_mels"]:  # repo convention is [n_freq, n_mels]
            fb = fb.T
        self.fb = torch.from_numpy(fb)  # [n_mels, n_freq]

    def __call__(self, audio):
        import torch

        spec = torch.stft(
            audio, n_fft=self.n_fft, hop_length=self.hop,
            win_length=self.n_fft, window=self.window, center=True,
            pad_mode="reflect", normalized=False, onesided=True,
            return_complex=True,
        ).abs()  # [B, F, T]
        return torch.matmul(self.fb, spec)  # [B, n_mels, T]


def take_log(mels):
    """AmplitudeToDB(stype='amplitude', amin=1e-5) + clamp (sed_trainer.py
    :221-232); ref=1.0 makes the db_multiplier shift zero."""
    import torch

    db = 20.0 * torch.log10(torch.clamp(mels, min=1e-5))
    return torch.clamp(db, min=-50, max=80)


def update_ema(alpha, global_step, model, ema_model):
    """sed_trainer.py:155-168."""
    import torch

    alpha = min(1 - 1 / (global_step + 1), alpha)
    with torch.no_grad():
        for ema_p, p in zip(ema_model.parameters(), model.parameters()):
            ema_p.mul_(alpha).add_(p, alpha=1 - alpha)


def build_data(config: dict, seed: int):
    """Shared data pipeline: repo datasets + fixed-slot batcher (identical
    item semantics and shuffling for both frameworks)."""
    import pandas as pd

    from desed_task_tpu.data import (
        MultiSourceBatcher, StronglyAnnotatedSet, UnlabeledSet, WeakSet,
    )
    from desed_task_tpu.labels.encoder import ManyHotEncoder
    from desed_task_tpu.utils.classes_dict import CLASSES_DESED

    data, feats = config["data"], config["feats"]
    encoder = ManyHotEncoder(
        list(CLASSES_DESED.keys()), audio_len=data["audio_max_len"],
        frame_len=feats["n_filters"], frame_hop=feats["hop_length"],
        net_pooling=data["net_subsample"], fs=data["fs"],
    )
    common = dict(pad_to=data["audio_max_len"], fs=data["fs"])
    synth = StronglyAnnotatedSet(
        data["synth_folder"], pd.read_csv(data["synth_tsv"], sep="\t"),
        encoder, **common,
    )
    weak_tsv = pd.read_csv(data["weak_tsv"], sep="\t")
    split = config["training"].get("weak_split", 0.9)
    rng = np.random.default_rng(config["training"].get("seed", 42))
    perm = rng.permutation(len(weak_tsv))
    n_train = int(len(weak_tsv) * split)
    weak = WeakSet(data["weak_folder"], weak_tsv.iloc[perm[:n_train]],
                   encoder, **common)
    unlab = UnlabeledSet(data["unlabeled_folder"], encoder, **common)
    weak_val = WeakSet(data["weak_folder"], weak_tsv.iloc[perm[n_train:]],
                       encoder, test=True, **common)
    synth_val = StronglyAnnotatedSet(
        data["synth_val_folder"], pd.read_csv(data["synth_val_tsv"], sep="\t"),
        encoder, test=True, return_filename=True, **common,
    )
    test_set = StronglyAnnotatedSet(
        data["test_folder"], pd.read_csv(data["test_tsv"], sep="\t"),
        encoder, test=True, return_filename=True, **common,
    )
    bs = config["training"]["batch_size"]
    batcher = MultiSourceBatcher(
        {"synth": synth, "weak": weak, "unlabeled": unlab},
        {"synth": bs[0], "weak": bs[1], "unlabeled": bs[2]},
        seed=seed, num_workers=2,
    )
    return encoder, batcher, weak_val, synth_val, test_set


def train_torch(config: dict, log_dir: str, seed: int = 42,
                resume: bool = False):
    """The reference training system, step for step, without Lightning.

    resume=True continues an interrupted run from <log_dir>/last.pt with
    bit-identical semantics: model/opt/scheduler state, all three RNG
    streams, and the batcher's per-epoch shuffles (replayed index-only) are
    restored, so a resumed run sees the same batch stream as an
    uninterrupted one."""
    import random as pyrandom

    import torch

    install_reference()
    from desed_task.data_augm import mixup
    from desed_task.nnet.CRNN import CRNN as RefCRNN
    from desed_task.utils.scaler import TorchScaler
    from desed_task.utils.schedulers import ExponentialWarmup

    from desed_task_tpu.obs.logging import MetricsLogger
    from desed_task_tpu.training.evaluate import multilabel_f1_macro

    t = config["training"]
    pyrandom.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    encoder, batcher, weak_val, synth_val, test_set = build_data(config, seed)
    net_kw = {k: v for k, v in config["net"].items()
              if k not in ("median_filter",)}
    student = RefCRNN(**net_kw)
    teacher = RefCRNN(**net_kw)
    teacher.load_state_dict(student.state_dict())
    for p in teacher.parameters():
        p.detach_()

    mel = TorchMel(config["feats"])
    scaler = TorchScaler(
        config["scaler"]["statistic"], config["scaler"]["normtype"],
        config["scaler"]["dims"],
    )
    supervised_loss = torch.nn.BCELoss()
    selfsup_loss = (torch.nn.MSELoss() if t["self_sup_loss"] == "mse"
                    else torch.nn.BCELoss())
    steps_per_epoch = batcher.steps_per_epoch
    opt = torch.optim.Adam(student.parameters(), lr=config["opt"]["lr"],
                           betas=(0.9, 0.999))
    sched = ExponentialWarmup(
        opt, config["opt"]["lr"], t["n_epochs_warmup"] * steps_per_epoch
    )
    n_synth, n_weak, _ = t["batch_size"]

    logger = MetricsLogger(log_dir)
    best_obj, best_state, best_state_teacher = -np.inf, None, None
    global_step = 0
    start_epoch = 0
    last_path = Path(log_dir) / "last.pt"
    if resume and last_path.exists():
        ck = torch.load(last_path, weights_only=False)
        student.load_state_dict(ck["student"])
        teacher.load_state_dict(ck["teacher"])
        opt.load_state_dict(ck["opt"])
        sched.load_state_dict(ck["sched"])
        global_step = ck["global_step"]
        start_epoch = ck["epoch"] + 1
        torch.set_rng_state(ck["torch_rng"])
        np.random.set_state(ck["np_rng"])
        pyrandom.setstate(ck["py_rng"])
        best_obj = ck.get("best_obj", -np.inf)
        for _ in range(start_epoch):  # replay epoch shuffles, index-only
            for _ in batcher.epoch_indices():
                pass
        best_path = Path(log_dir) / "best.pt"
        if best_path.exists():
            bk = torch.load(best_path, weights_only=False)
            best_state = bk["student"]
            best_state_teacher = bk["teacher"]
        print(f"[torch] resumed at epoch {start_epoch} "
              f"(step {global_step}, best_obj {best_obj:.4f})", flush=True)
    for epoch in range(start_epoch, t["n_epochs"]):
        student.train()
        teacher.train()
        t0 = time.monotonic()
        for batch in batcher.epoch():
            # reference flat batch layout: [synth | weak | unlabeled]
            audio = torch.from_numpy(np.concatenate([
                batch["synth"]["audio"], batch["weak"]["audio"],
                batch["unlabeled"]["audio"],
            ]))
            labels = torch.from_numpy(np.concatenate([
                batch["synth"]["labels"], batch["weak"]["labels"],
                batch["unlabeled"]["labels"],
            ]))
            features = mel(audio)
            batch_num = features.shape[0]
            strong_mask = torch.zeros(batch_num).bool()
            weak_mask = torch.zeros(batch_num).bool()
            strong_mask[:n_synth] = 1
            weak_mask[n_synth : n_weak + n_synth] = 1
            labels_weak = (torch.sum(labels[weak_mask], -1) > 0).float()

            mixup_type = t.get("mixup")
            if mixup_type is not None and 0.5 > pyrandom.random():
                features[weak_mask], labels_weak = mixup(
                    features[weak_mask], labels_weak,
                    mixup_label_type=mixup_type,
                )
                features[strong_mask], labels[strong_mask] = mixup(
                    features[strong_mask], labels[strong_mask],
                    mixup_label_type=mixup_type,
                )

            def detect(feats, model):
                return model(scaler(take_log(feats)))

            strong_s, weak_s = detect(features, student)
            loss_strong = supervised_loss(
                strong_s[strong_mask], labels[strong_mask]
            )
            loss_weak = supervised_loss(weak_s[weak_mask], labels_weak)
            tot_supervised = loss_strong + loss_weak
            with torch.no_grad():
                strong_t, weak_t = detect(features, teacher)
            weight = t["const_max"] * sched._get_scaling_factor()
            strong_self = selfsup_loss(strong_s, strong_t.detach())
            weak_self = selfsup_loss(weak_s, weak_t.detach())
            tot_loss = tot_supervised + (strong_self + weak_self) * weight

            opt.zero_grad()
            tot_loss.backward()
            torch.nn.utils.clip_grad_norm_(
                student.parameters(), t.get("gradient_clip", 5.0)
            )
            opt.step()
            sched.step()  # Lightning steps the scheduler per optimizer step
            global_step += 1
            update_ema(t["ema_factor"], global_step, student, teacher)
        dt = time.monotonic() - t0
        logger.log_scalars(global_step, {
            "train/epoch": epoch, "train/epoch_seconds": dt,
            "train/student/loss_strong": float(loss_strong.detach()),
            "train/student/loss_weak": float(loss_weak.detach()),
            "train/student/tot_self_loss": float(
                ((strong_self + weak_self) * weight).detach()),
        })
        torch.save({  # crash-safe resume point (see `resume`)
            "student": student.state_dict(), "teacher": teacher.state_dict(),
            "opt": opt.state_dict(), "sched": sched.state_dict(),
            "global_step": global_step, "epoch": epoch,
            "torch_rng": torch.get_rng_state(),
            "np_rng": np.random.get_state(), "py_rng": pyrandom.getstate(),
            "best_obj": best_obj,
        }, last_path)

        if (epoch + 1) % t.get("validation_interval", 5) == 0:
            obj, scalars = validate_torch(
                student, teacher, mel, scaler, encoder, weak_val, synth_val,
                config,
            )
            scalars["val/obj_metric"] = obj
            logger.log_scalars(global_step, scalars)
            print(f"[torch] epoch {epoch + 1}: obj={obj:.4f}", flush=True)
            if obj > best_obj:
                best_obj = obj
                best_state = {
                    k: v.clone() for k, v in student.state_dict().items()
                }
                best_state_teacher = {
                    k: v.clone() for k, v in teacher.state_dict().items()
                }
                # crash safety on multi-hour 1-core runs: the test battery
                # can be replayed from disk if the process dies late
                torch.save(
                    {"student": best_state, "teacher": best_state_teacher,
                     "epoch": epoch, "obj": best_obj},
                    Path(log_dir) / "best.pt",
                )

    if best_state is not None:
        student.load_state_dict(best_state)
        teacher.load_state_dict(best_state_teacher)
    results = test_torch(student, mel, scaler, encoder, test_set, config,
                         log_dir)
    logger.close()
    return results


def _torch_predict_fn(model, mel, scaler):
    """Adapter with the jax predict_fn signature so the repo's
    predict_dataset / run_test drive the torch model unchanged."""
    import torch

    inst_scaler = scaler

    def predict(params, stats, audio, scaler=None, embeddings=None):
        with torch.no_grad():
            feats = mel(torch.from_numpy(np.asarray(audio)))
            strong, weak = model(inst_scaler(take_log(feats)))
        return strong.numpy(), weak.numpy()

    return predict


def validate_torch(student, teacher, mel, scaler, encoder, weak_val,
                   synth_val, config):
    import pandas as pd

    from desed_task_tpu.metrics.event_based import event_based_metrics
    from desed_task_tpu.metrics.psds import (
        compute_per_intersection_macro_f1,
        compute_psds_from_operating_points,
    )
    from desed_task_tpu.training.evaluate import (
        multilabel_f1_macro, predict_dataset,
    )

    t = config["training"]
    scalars = {}
    obj = 0.0
    median = config["net"].get("median_filter", 7)
    if isinstance(median, int):
        median = [median] * len(encoder.labels)
    synth_gt = pd.read_csv(config["data"]["synth_val_tsv"], sep="\t")
    synth_dur = pd.read_csv(config["data"]["synth_val_dur"], sep="\t")
    traj = t.get("trajectory_psds", 0)
    for tag, model in (("student", student), ("teacher", teacher)):
        model.eval()
        pfn = _torch_predict_fn(model, mel, scaler)
        _, _, _, probs, targets = predict_dataset(
            pfn, None, None, weak_val, encoder,
            t.get("batch_size_val", 24), thresholds=(0.5,),
        )
        weak_f1 = multilabel_f1_macro(probs, targets)
        scalars[f"val/weak/{tag}/macro_F1"] = weak_f1
        # same trajectory recipe as the jax SEDValidator (trajectory_psds):
        # PSDS1 over `traj` operating points + collar event-F1, student only
        traj_ths = (
            tuple(np.arange(1 / (traj * 2), 1, 1 / traj))
            if traj and tag == "student" else ()
        )
        _, _, dfs, _, _ = predict_dataset(
            pfn, None, None, synth_val, encoder,
            t.get("batch_size_val", 24), thresholds=traj_ths + (0.5,),
            median_filter=median,
        )
        inter = compute_per_intersection_macro_f1(
            dfs[0.5], synth_gt, synth_dur,
        )
        scalars[f"val/synth/{tag}/intersection_f1_macro"] = inter
        if traj_ths:
            psds1, _ = compute_psds_from_operating_points(
                [dfs[th] for th in traj_ths], synth_gt, synth_dur,
                dtc_threshold=0.7, gtc_threshold=0.7, alpha_ct=0, alpha_st=1,
            )
            collar = event_based_metrics(
                synth_gt, dfs[0.5], list(encoder.labels)
            )
            scalars[f"val/synth/{tag}/psds1"] = psds1
            scalars[f"val/synth/{tag}/event_f1_macro"] = (
                collar["macro_f_measure"]
            )
        if tag == "student":
            obj = weak_f1 + inter
        else:
            scalars["val/teacher/obj_metric"] = weak_f1 + inter
        model.train()
    return obj, scalars


def test_torch(student, mel, scaler, encoder, test_set, config, log_dir):
    import json

    import pandas as pd

    from desed_task_tpu.training.evaluate import run_test

    median = config["net"].get("median_filter", 7)
    if isinstance(median, int):
        median = [median] * len(encoder.labels)
    state = SimpleNamespace(
        student_params=None, student_stats=None, teacher_params=None,
        teacher_stats=None, scaler=None,
    )
    student.eval()
    results = run_test(
        _torch_predict_fn(student, mel, scaler), state, test_set, encoder,
        pd.read_csv(config["data"]["test_tsv"], sep="\t"),
        pd.read_csv(config["data"]["test_dur"], sep="\t"),
        batch_size=config["training"].get("batch_size_val", 24),
        n_thresholds=config["training"].get("n_test_thresholds", 50),
        median_filter=median,
        desed_classes=list(encoder.labels),
    )
    out = {k: v for k, v in results.items() if isinstance(v, float)}
    (Path(log_dir) / "test_results.json").write_text(json.dumps(out, indent=2))
    print("[torch] test:", json.dumps(out, indent=2), flush=True)
    return results
