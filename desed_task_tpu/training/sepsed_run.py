"""End-to-end 2021 separation-ensemble fine-tune (SEPSED recipe engine).

Rebuilds recipes/dcase2021_task4_baseline/finetune_on_separated.py:24-387 +
local/sepsed_trainer.py:200-320: a trained monaural 2021 CRNN is restored,
deep-copied into a frozen "mixture" branch, and a trainable multisrc copy
(freeze_bn) is fine-tuned on pre-separated sources; predictions are blended
through the learned scalar q (models/ensemble.py). Mean-teacher training,
validation on separated synth/weak sets, and the PSDS test battery all run
through the generic engine.

Separated data layout: for each base clip X.wav the separation runner
(tools/separation.py separate_folder) writes X_src{i}.wav into
<folder><out_suffix>; the reference instead stores multi-channel wavs
(PARITY #13-adjacent, same information).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

import jax

from ..data import MultiSourceBatcher, StronglyAnnotatedSet, UnlabeledSet, WeakSet
from ..data.datasets import SeparatedSet
from ..models import CRNN, EnsembleModel
from ..obs.checkpoint import CheckpointManager
from ..obs.logging import MetricsLogger
from .evaluate import SEDValidator, run_test
from .loop import TrainLoop
from .mean_teacher import MeanTeacherConfig, SlotSpec, make_optimizer
from .sepsed import (
    create_sepsed_state,
    make_sepsed_predict_step,
    make_sepsed_train_step,
)
from .single_run import (
    build_encoder,
    build_model,
    mel_config,
    scaler_config,
    seed_everything,
)


def _sep_folder(data: dict, key: str) -> str:
    """Resolve the separated folder for a base-folder config key: an explicit
    `<key>_sep` entry wins (reference conf layout), else the separation
    runner's default `<folder>_separated`."""
    if f"{key}_sep" in data:
        return data[f"{key}_sep"]
    return str(Path(data[key]).parent / (Path(data[key]).name + "_separated"))


def _graft(tree: dict, sub: str, params) -> dict:
    """Replace tree[sub] with `params` (pretrained-weight initialization of
    the multisrc branch, reference finetune_on_separated.py:137-147)."""
    out = dict(tree)
    out[sub] = params
    return out


def sepsed_single_run(
    config: dict,
    log_dir: str,
    sed_checkpoint: str,
    sed_model: str = "student",
    n_src: int = 4,
    fast_dev_run: bool = False,
    test_from_checkpoint: str | None = None,
):
    """Fine-tune the separation ensemble. Returns (state, test_results)."""
    t = config["training"]
    key = seed_everything(t.get("seed", 42))
    data = config["data"]

    encoder = build_encoder(config)
    mel = mel_config(config, fast=False)
    scal = scaler_config(config)

    # ---- restore the trained monaural SED (student or teacher branch) ----
    mgr = CheckpointManager(sed_checkpoint)
    name = "best" if mgr.exists("best") else "last"
    if not mgr.exists(name):
        raise FileNotFoundError(
            f"no checkpoint under {sed_checkpoint}; train train_sed.py first"
        )
    restored = mgr.restore(name)
    if sed_model not in ("student", "teacher"):
        raise ValueError(f"sed_model must be student|teacher, got {sed_model}")
    mono_params = restored[f"{sed_model}_params"]
    mono_stats = restored.get(f"{sed_model}_stats") or {}
    monaural_vars = {"params": mono_params}
    if mono_stats:
        monaural_vars["batch_stats"] = mono_stats

    monaural = build_model(config, fast=False)
    multisrc_cfg = dict(config["net"])
    multisrc_cfg.pop("median_filter", None)
    multisrc = CRNN(**multisrc_cfg, freeze_bn=True)  # reference freezes BN
    ensemble = EnsembleModel(multisrc, monaural)

    # ---- separated datasets (3 fixed slots, reference :152-205) ----
    common = dict(pad_to=data["audio_max_len"], fs=data["fs"])
    synth_tsv = pd.read_csv(data["synth_tsv"], sep="\t")
    weak_tsv = pd.read_csv(data["weak_tsv"], sep="\t")
    rng = np.random.default_rng(t.get("seed", 42))
    perm = rng.permutation(len(weak_tsv))
    n_train = int(len(weak_tsv) * t.get("weak_split", 0.9))

    def sep(base, folder_key):
        return SeparatedSet(
            _sep_folder(data, folder_key), base, n_src=n_src,
            sources_as_audio=True,
        )

    datasets = {
        "synth": sep(
            StronglyAnnotatedSet(data["synth_folder"], synth_tsv, encoder, **common),
            "synth_folder",
        ),
        "weak": sep(
            WeakSet(data["weak_folder"], weak_tsv.iloc[perm[:n_train]], encoder, **common),
            "weak_folder",
        ),
        "unlabeled": sep(
            UnlabeledSet(data["unlabeled_folder"], encoder, **common),
            "unlabeled_folder",
        ),
    }
    batch_sizes = dict(zip(("synth", "weak", "unlabeled"), t["batch_size"]))
    batcher = MultiSourceBatcher(
        datasets, batch_sizes,
        seed=t.get("seed", 42),
        num_workers=1 if fast_dev_run else t.get("num_workers", 6),
    )
    steps_per_epoch = 20 if fast_dev_run else batcher.steps_per_epoch
    cfg = MeanTeacherConfig(
        slots=(
            SlotSpec("synth", batch_sizes["synth"], "strong"),
            SlotSpec("weak", batch_sizes["weak"], "weak"),
            SlotSpec("unlabeled", batch_sizes["unlabeled"], "unlabeled"),
        ),
        mixup=None,  # the reference sepsed fine-tune applies no mixup
        const_max=t.get("const_max", 2.0),
        self_sup_loss=t.get("self_sup_loss", "mse"),
        consistency_start_slot=0,  # 2021 semantics: whole batch
        rampup_steps=t.get("n_epochs_warmup", 50) * steps_per_epoch,
        ema_factor=t.get("ema_factor", 0.999),
        weak_labels_post_mixup=False,
    )
    tx, sched = make_optimizer(
        lr=config["opt"]["lr"],
        rampup_steps=cfg.rampup_steps,
        max_grad_norm=t.get("gradient_clip", 5.0),
    )
    sample = next(iter(batcher.epoch(steps=1)))
    state = create_sepsed_state(
        ensemble, monaural_vars, cfg, tx, key, sample, mel
    )
    # initialize the trainable multisrc branch FROM the pretrained weights
    # (reference loads the SED state_dict into the multisrc model)
    grafted_params = _graft(dict(state.student_params), "multisrc_crnn", mono_params)
    grafted_stats = state.student_stats
    if mono_stats and grafted_stats:
        grafted_stats = _graft(dict(grafted_stats), "multisrc_crnn", mono_stats)
    copy = lambda tr: jax.tree_util.tree_map(np.array, tr)
    state = state.replace(
        student_params=grafted_params,
        teacher_params=copy(grafted_params),
        student_stats=grafted_stats,
        teacher_stats=copy(grafted_stats),
        opt_state=tx.init(grafted_params),
    )

    step_fn = jax.jit(
        make_sepsed_train_step(ensemble, monaural_vars, cfg, tx, sched, mel, scal),
        donate_argnums=0,
    )
    predict_fn = jax.jit(make_sepsed_predict_step(ensemble, monaural_vars, mel, scal))

    # ---- validation on separated synth_val + weak_val ----
    synth_val_tsv = pd.read_csv(data["synth_val_tsv"], sep="\t")
    synth_val = sep(
        StronglyAnnotatedSet(
            data["synth_val_folder"], synth_val_tsv, encoder,
            test=True, return_filename=True, **common,
        ),
        "synth_val_folder",
    )
    weak_val = sep(
        WeakSet(
            data["weak_folder"], weak_tsv.iloc[perm[n_train:]], encoder,
            test=True, **common,
        ),
        "weak_folder",
    )
    median = config["net"].get("median_filter", 7)
    if isinstance(median, int):
        median = [median] * len(encoder.labels)
    validator = SEDValidator(
        predict_fn, encoder,
        weak_set=weak_val,
        synth_set=synth_val,
        synth_gt=synth_val_tsv,
        synth_dur=pd.read_csv(data["synth_val_dur"], sep="\t")
        if "synth_val_dur" in data else None,
        batch_size=t.get("batch_size_val", 24),
        median_filter=median,
        obj_metric_synth_type=t.get("obj_metric_synth_type", "intersection"),
    )
    logger = MetricsLogger(log_dir)
    logger.log_hparams(config)
    ckpt = CheckpointManager(Path(log_dir) / "checkpoints")
    loop = TrainLoop(
        step_fn, state, batcher,
        n_epochs=2 if fast_dev_run else t["n_epochs"],
        logger=logger,
        ckpt=ckpt,
        validate_fn=validator,
        validation_interval=1 if fast_dev_run else t.get("validation_interval", 10),
        early_stop_patience=t.get("early_stop_patience"),
        rng=jax.random.key(t.get("seed", 42) + 1),
        checkpoint_interval=t.get("checkpoint_interval"),
    )
    if test_from_checkpoint is not None:
        tmgr = CheckpointManager(test_from_checkpoint)
        state = tmgr.restore(
            "best" if tmgr.exists("best") else "last", template=state
        )
    else:
        state = loop.run()
        if ckpt.exists("best"):
            state = ckpt.restore("best", template=state)

    test_results = None
    if data.get("test_tsv") and data.get("test_folder"):
        test_tsv = pd.read_csv(data["test_tsv"], sep="\t")
        test_set = sep(
            StronglyAnnotatedSet(
                data["test_folder"], test_tsv, encoder,
                test=True, return_filename=True, **common,
            ),
            "test_folder",
        )
        test_results = run_test(
            predict_fn, state, test_set, encoder, test_tsv,
            pd.read_csv(data["test_dur"], sep="\t"),
            batch_size=t.get("batch_size_val", 24),
            n_thresholds=3 if fast_dev_run else t.get("n_test_thresholds", 50),
            median_filter=median,
            use_teacher=True,  # 2021 reports the teacher (README.md:71-73)
            save_dir=log_dir,
        )
    return state, test_results
