"""Config-driven end-to-end run: the engine behind every recipe CLI.

Replaces the per-year single_run functions of the reference
(recipes/dcase202X_task4_baseline/train_*.py:157-592): build encoder(s),
datasets, fixed-slot batcher, CRNN, optimizer/scheduler, validator, train
loop, then test from the best checkpoint. Driven by the same YAML section
layout as the reference confs (training/data/opt/feats/net/scaler/pretrained).

Slot composition is inferred from which data paths are configured:
  [maestro?] [synth] [strong?] [weak] [unlabeled]
with training.batch_size listing sizes for the present slots in that order
(matching the reference convention, pretrained.yaml:8).
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..data import MultiSourceBatcher, StronglyAnnotatedSet, UnlabeledSet, WeakSet
from ..labels.encoder import CatManyHotEncoder, ManyHotEncoder
from ..models import CRNN
from ..obs.checkpoint import CheckpointManager
from ..obs.energy import EnergyTracker
from ..obs.logging import MetricsLogger
from ..obs.macs import macs_report
from ..obs.watchdog import StallWatchdog
from ..ops.frontend import MelConfig
from ..ops.scaler import ScalerConfig, fit_scaler
from ..utils.classes_dict import (
    CLASSES_DESED,
    CLASSES_MAESTRO_REAL,
    MAESTRO_DESED_ALIAS,
    process_tsvs,
)
from .evaluate import SEDValidator, run_test
from .loop import TrainLoop
from .mean_teacher import (
    MeanTeacherConfig,
    SlotSpec,
    create_state,
    make_optimizer,
    make_predict_step,
    make_train_step,
    make_train_step_sharded,
)


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def build_encoder(config: dict) -> ManyHotEncoder:
    data = config["data"]
    feats = config["feats"]
    desed = ManyHotEncoder(
        list(CLASSES_DESED.keys()),
        audio_len=data["audio_max_len"],
        frame_len=feats["n_filters"],
        frame_hop=feats["hop_length"],
        net_pooling=data["net_subsample"],
        fs=data["fs"],
    )
    if "real_maestro_train_tsv" in data:
        maestro = ManyHotEncoder(
            list(CLASSES_MAESTRO_REAL.keys()),
            audio_len=data["audio_max_len"],
            frame_len=feats["n_filters"],
            frame_hop=feats["hop_length"],
            net_pooling=data["net_subsample"],
            fs=data["fs"],
        )
        return CatManyHotEncoder((desed, maestro))
    return desed


MAESTRO_SCENES = (
    "cafe_restaurant",
    "city_center",
    "grocery_store",
    "metro_station",
    "residential_area",
)


def split_maestro(config: dict, maestro_dev_df: pd.DataFrame):
    """Seeded per-scene file-level 90/10 split of MAESTRO dev windows
    (train_pretrained.py:97-154). Window filenames are
    {scene}_{idx}-{onset}-{offset}.wav; the split is over file ids."""
    rng = np.random.RandomState(config["training"].get("seed", 42))
    split_f = config["training"].get("maestro_split", 0.9)
    train_parts, valid_parts = [], []
    file_ids = maestro_dev_df["filename"].apply(lambda x: x.split("-")[0])
    scenes = file_ids.apply(lambda x: "_".join(x.split("_")[:-1]))
    for scene_name in MAESTRO_SCENES:
        filenames = np.asarray(file_ids[scenes == scene_name].unique(), dtype=object)
        rng.shuffle(filenames)
        pivot = int(split_f * len(filenames))
        train_parts.append(maestro_dev_df[file_ids.isin(filenames[:pivot])])
        valid_parts.append(maestro_dev_df[file_ids.isin(filenames[pivot:])])
    return (
        pd.concat(train_parts, ignore_index=True),
        pd.concat(valid_parts, ignore_index=True),
    )


def mel_config(config: dict, fast: bool = False) -> MelConfig:
    f = config["feats"]
    return MelConfig(
        sample_rate=f["sample_rate"],
        n_fft=f["n_window"],
        win_length=f["n_window"],
        hop_length=f["hop_length"],
        f_min=f["f_min"],
        f_max=f["f_max"],
        n_mels=f["n_mels"],
        compute_dtype="bfloat16" if fast else "float32",
    )


def scaler_config(config: dict) -> ScalerConfig:
    s = config.get("scaler", {})
    return ScalerConfig(
        statistic=s.get("statistic", "instance"),
        normtype=s.get("normtype", "minmax"),
        dims=tuple(s.get("dims", (1, 2))),
    )


def build_model(config: dict, fast: bool = False) -> CRNN:
    net = dict(config["net"])
    net.pop("median_filter", None)
    pretrained = config.get("pretrained", {})
    if pretrained and not net.get("use_embeddings", False):
        pass
    if fast:
        net["compute_dtype"] = jnp.bfloat16
    return CRNN(**net)


def _emb_file(config, split_name):
    pre = config.get("pretrained") or {}
    d = pre.get("extracted_embeddings_dir")
    if not d:
        return None
    path = Path(d) / pre.get("model", "beats") / f"{split_name}.hdf5"
    return str(path) if path.exists() else None


def build_train_datasets(
    config: dict, encoder, strong_real: bool = False
) -> tuple[dict, dict, list[SlotSpec]]:
    """Returns (datasets, batch_sizes, slot specs) for the present slots.

    The strong (AudioSet real) data participates in one of two ways:
      * as its own batch slot when training.batch_size carries an entry for
        it (the 2024 flagship convention, pretrained.yaml:8);
      * concatenated into the synth slot when `strong_real` is set and the
        batch list has no strong entry (the reference --strong_real
        semantics, dcase2022_task4_baseline/train_sed.py:163-167).
    With neither, configured strong paths are ignored (reference default).
    """
    data = config["data"]
    emb_type = (config.get("net") or {}).get("embedding_type")
    common = dict(
        pad_to=data["audio_max_len"],
        fs=data["fs"],
        embedding_type=emb_type,
    )
    datasets: dict = {}
    roles: list[tuple[str, str]] = []

    maestro_val_tsv = None
    if "real_maestro_train_folder" in data:
        tsv = pd.read_csv(data["real_maestro_train_tsv"], sep="\t")
        tsv, maestro_val_tsv = split_maestro(config, tsv)
        tsv = process_tsvs(tsv, MAESTRO_DESED_ALIAS)
        valid = list(CLASSES_MAESTRO_REAL.keys()) + list(
            set(MAESTRO_DESED_ALIAS.values())
        )
        datasets["maestro"] = StronglyAnnotatedSet(
            data["real_maestro_train_folder"], tsv, encoder,
            embeddings_hdf5_file=_emb_file(config, "maestro_real_train"),
            mask_events_other_than=valid, **common,
        )
        roles.append(("maestro", "strong"))

    synth_tsv = pd.read_csv(data["synth_tsv"], sep="\t")
    desed_classes = list(CLASSES_DESED.keys())
    datasets["synth"] = StronglyAnnotatedSet(
        data["synth_folder"], synth_tsv, encoder,
        embeddings_hdf5_file=_emb_file(config, "synth_train"),
        mask_events_other_than=desed_classes if len(encoder.labels) > 10 else None,
        **common,
    )
    roles.append(("synth", "strong"))

    if "strong_tsv" in data and data.get("strong_folder"):
        n_batch = len(config["training"]["batch_size"])
        # slots absent the strong one: [maestro?] synth weak unlabeled
        separate_slot = n_batch == len(roles) + 3
        if separate_slot or strong_real:
            strong_tsv = pd.read_csv(data["strong_tsv"], sep="\t")
            strong_set = StronglyAnnotatedSet(
                data["strong_folder"], strong_tsv, encoder,
                embeddings_hdf5_file=_emb_file(config, "strong_train"),
                mask_events_other_than=desed_classes
                if len(encoder.labels) > 10 else None,
                **common,
            )
            if separate_slot:
                datasets["strong"] = strong_set
                roles.append(("strong", "strong"))
            else:
                from ..data import ConcatSet

                datasets["synth"] = ConcatSet([strong_set, datasets["synth"]])

    weak_tsv = pd.read_csv(data["weak_tsv"], sep="\t")
    # weak train/val split (train_pretrained.py:241-253)
    split = config["training"].get("weak_split", 0.9)
    rng = np.random.default_rng(config["training"].get("seed", 42))
    perm = rng.permutation(len(weak_tsv))
    n_train = int(len(weak_tsv) * split)
    weak_train = weak_tsv.iloc[perm[:n_train]]
    datasets["weak"] = WeakSet(
        data["weak_folder"], weak_train, encoder,
        embeddings_hdf5_file=_emb_file(config, "weak_train"),
        mask_events_other_than=desed_classes if len(encoder.labels) > 10 else None,
        **common,
    )
    roles.append(("weak", "weak"))

    datasets["unlabeled"] = UnlabeledSet(
        data["unlabeled_folder"], encoder,
        embeddings_hdf5_file=_emb_file(config, "unlabeled_train"),
        mask_events_other_than=desed_classes if len(encoder.labels) > 10 else None,
        **common,
    )
    roles.append(("unlabeled", "unlabeled"))

    batch_sizes_list = config["training"]["batch_size"]
    assert len(batch_sizes_list) == len(roles), (
        f"training.batch_size has {len(batch_sizes_list)} entries but "
        f"{len(roles)} slots are configured: {[r[0] for r in roles]}"
    )
    batch_sizes = {name: bs for (name, _), bs in zip(roles, batch_sizes_list)}
    slots = [
        SlotSpec(name, batch_sizes[name], role) for (name, role) in roles
    ]
    if maestro_val_tsv is not None and len(maestro_val_tsv):
        datasets["_maestro_val_tsv"] = maestro_val_tsv
    # weak val set rides along for the validator
    weak_val = WeakSet(
        data["weak_folder"], weak_tsv.iloc[perm[n_train:]], encoder,
        embeddings_hdf5_file=_emb_file(config, "weak_train"),
        test=True, **common,
    )
    datasets["_weak_val"] = weak_val
    return datasets, batch_sizes, slots


def mean_teacher_config(config: dict, slots, steps_per_epoch: int) -> MeanTeacherConfig:
    t = config["training"]
    slot_names = [s.name for s in slots]
    # mixup groups as in the reference: weak alone; synth+strong together;
    # maestro alone (2024, sed_trainer_pretrained.py:349-363); 2021-2023:
    # weak and synth(+strong) groups
    groups = []
    if "weak" in slot_names:
        groups.append(("weak",))
    strong_group = tuple(n for n in ("synth", "strong") if n in slot_names)
    if strong_group:
        groups.append(strong_group)
    if "maestro" in slot_names:
        groups.append(("maestro",))
    consistency_start = 1 if "maestro" in slot_names else 0
    decay = t.get("epoch_decay")
    return MeanTeacherConfig(
        slots=tuple(slots),
        mixup=t.get("mixup"),
        mixup_prob=t.get("mixup_prob", 0.5),
        mixup_groups=tuple(groups),
        const_max=t.get("const_max", 2.0),
        self_sup_loss=t.get("self_sup_loss", "mse"),
        consistency_start_slot=consistency_start,
        rampup_steps=t.get("n_epochs_warmup", 50) * steps_per_epoch,
        decay_steps=decay * steps_per_epoch if decay else None,
        ema_factor=t.get("ema_factor", 0.999),
    )


def single_run(
    config: dict,
    log_dir: str,
    checkpoint_resume: bool = False,
    test_from_checkpoint: str | None = None,
    fast_dev_run: bool = False,
    evaluation: bool = False,
    fast: bool = True,
    strong_real: bool = False,
):
    """Train (or test-only) one system. Returns (state, test_results)."""
    t = config["training"]
    key = seed_everything(t.get("seed", 42))
    data = config["data"]

    encoder = build_encoder(config)
    model = build_model(config, fast=fast)
    mel = mel_config(config, fast=fast)
    scal = scaler_config(config)

    datasets, batch_sizes, slots = build_train_datasets(
        config, encoder, strong_real=strong_real
    )
    weak_val = datasets.pop("_weak_val")
    maestro_val_tsv = datasets.pop("_maestro_val_tsv", None)
    batcher = MultiSourceBatcher(
        datasets, batch_sizes,
        seed=t.get("seed", 42),
        num_workers=1 if fast_dev_run else t.get("num_workers", 6),
    )
    accumulate = int(t.get("accumulate_batches", 1))
    # schedules count OPTIMIZER steps (reference epoch_len divides by
    # accumulate_batches, train_pretrained.py:457-466)
    steps_per_epoch = (
        20 if fast_dev_run else max(batcher.steps_per_epoch // accumulate, 1)
    )
    cfg = mean_teacher_config(config, slots, steps_per_epoch)

    tx, sched = make_optimizer(
        lr=config["opt"]["lr"],
        rampup_steps=cfg.rampup_steps,
        max_grad_norm=t.get("gradient_clip", 5.0),
    )
    sample = next(iter(batcher.epoch(steps=1)))
    scaler_state = None
    if scal.statistic == "dataset":
        from ..ops.frontend import log_mel_spectrogram

        def feats_of(b):
            import jax.numpy as jnp

            audio = np.concatenate([b[s.name]["audio"] for s in slots])
            return np.asarray(log_mel_spectrogram(jnp.asarray(audio), mel))

        scaler_state = fit_scaler(scal, batcher.epoch(steps=steps_per_epoch), feats_of)
    state = create_state(model, cfg, tx, key, sample, scaler=scaler_state, mel_cfg=mel)
    mesh = None
    n_dev = jax.device_count()
    if n_dev > 1 and all(s.size % n_dev == 0 for s in cfg.slots):
        # multi-chip: batches shard over a data mesh; the shard_map step keeps
        # every tensor device-local (zero resharding collectives)
        from ..parallel import make_mesh, replicate

        mesh = make_mesh({"data": n_dev})
        state = jax.device_put(state, replicate(mesh))
        step_fn = make_train_step_sharded(
            model, cfg, tx, sched, mesh, sample, mel_cfg=mel, scaler_cfg=scal,
            accumulate=accumulate,
        )
    else:
        step_fn = jax.jit(
            make_train_step(model, cfg, tx, sched, mel_cfg=mel, scaler_cfg=scal,
                            accumulate=accumulate),
            donate_argnums=0,
        )

    # device-resident dataset (data/device_cache.py): when the corpus fits
    # HBM and needs no per-epoch random crop, train steps gather batches from
    # on-device stores by int32 index — the host/interconnect data path drops
    # out of the step entirely. Opt out with training.device_cache: false.
    cache = None
    cache_mode = t.get("device_cache", "auto")
    if mesh is None and cache_mode in (True, "auto"):
        from ..data.device_cache import DeviceResidentData, fits_device_cache

        pad_samples = int(data["audio_max_len"] * data["fs"])
        budget = int(t.get("device_cache_max_bytes", 8 << 30))
        if cache_mode is True or fits_device_cache(datasets, pad_samples, budget):
            cache = DeviceResidentData.build(
                datasets, [s.name for s in slots],
                num_workers=t.get("num_workers", 6),
                verbose=not fast_dev_run,
            )
            cache.upload(verbose=not fast_dev_run)
            builder = cache.batch_builder(batch_sizes)
            inner = make_train_step(
                model, cfg, tx, sched, mel_cfg=mel, scaler_cfg=scal,
                accumulate=accumulate,
            )
            if accumulate > 1:
                def _cached(state, stores, idx, rng):
                    micro = jax.vmap(builder, in_axes=(None, 0))(stores, idx)
                    return inner(state, micro, rng)
            else:
                def _cached(state, stores, idx, rng):
                    return inner(state, builder(stores, idx), rng)
            jit_cached = jax.jit(_cached, donate_argnums=0)
            stores = cache.stores

            def step_fn(state, idx, rng):  # noqa: F811 — cache path override
                return jit_cached(state, stores, idx, rng)

    predict_fn = jax.jit(make_predict_step(model, mel, scal))

    print(macs_report(
        lambda a: predict_fn(state.student_params, state.student_stats, a,
                             embeddings=jnp.asarray(sample[slots[0].name]["embeddings"])[:1]
                             if "embeddings" in sample[slots[0].name] else None),
        jnp.asarray(sample[slots[0].name]["audio"])[:1],
    ))

    # validation sets
    emb_type = (config.get("net") or {}).get("embedding_type")
    synth_val = StronglyAnnotatedSet(
        data["synth_val_folder"],
        pd.read_csv(data["synth_val_tsv"], sep="\t"),
        encoder,
        pad_to=data["audio_max_len"], fs=data["fs"], test=True,
        return_filename=True,
        embeddings_hdf5_file=_emb_file(config, "synth_val"),
        embedding_type=emb_type,
    )
    median = (config["net"] or {}).get("median_filter", 7)
    if isinstance(median, int):
        median = [median] * len(encoder.labels)
    maestro_val_set = None
    maestro_gt = None
    maestro_classes = None
    if maestro_val_tsv is not None:
        from ..inference.io import read_ground_truth_events
        from ..utils.classes_dict import CLASSES_MAESTRO_REAL_EVAL

        conf_filter = maestro_val_tsv[
            maestro_val_tsv.get("confidence", pd.Series(1.0, index=maestro_val_tsv.index)) > 0.5
        ] if "confidence" in maestro_val_tsv.columns else maestro_val_tsv
        eval_rows = conf_filter[
            conf_filter["event_label"].isin(CLASSES_MAESTRO_REAL_EVAL)
        ]
        maestro_gt = read_ground_truth_events(eval_rows)
        maestro_classes = sorted(CLASSES_MAESTRO_REAL_EVAL)
        maestro_val_set = StronglyAnnotatedSet(
            data["real_maestro_train_folder"], maestro_val_tsv, encoder,
            pad_to=data["audio_max_len"], fs=data["fs"], test=True,
            return_filename=True,
            embeddings_hdf5_file=_emb_file(config, "maestro_real_train"),
            embedding_type=emb_type,
        )
    if (cache is not None or mesh is not None) and t.get("device_cache_eval", True):
        # recurring validation passes (student + teacher, every N epochs)
        # also serve from device-resident stores; on a mesh the stores are
        # row-sharded and the eval scan runs SPMD with a score gather to
        # host 0 (SURVEY §5), so pod validation scales with the mesh instead
        # of serializing onto one chip
        from ..data.device_cache import build_eval_caches

        wrapped = build_eval_caches(
            {"weak_val": weak_val, "synth_val": synth_val,
             "maestro_val": maestro_val_set},
            t.get("batch_size_val", 24), verbose=not fast_dev_run,
            mesh=mesh,
        )
        weak_val = wrapped["weak_val"]
        synth_val = wrapped["synth_val"]
        maestro_val_set = wrapped["maestro_val"]

    validator = SEDValidator(
        predict_fn,
        encoder,
        weak_set=weak_val,
        synth_set=synth_val,
        maestro_set=maestro_val_set,
        maestro_gt=maestro_gt,
        maestro_classes=maestro_classes,
        synth_gt=pd.read_csv(data["synth_val_tsv"], sep="\t"),
        synth_dur=pd.read_csv(data["synth_val_dur"], sep="\t")
        if "synth_val_dur" in data
        else None,
        batch_size=t.get("batch_size_val", 24),
        median_filter=median,
        obj_metric_synth_type=t.get("obj_metric_synth_type", "intersection"),
        desed_classes=list(CLASSES_DESED.keys()),
        trajectory_psds=t.get("trajectory_psds", 0),
    )

    logger = MetricsLogger(log_dir)
    logger.log_hparams(config)
    ckpt = CheckpointManager(Path(log_dir) / "checkpoints")
    energy = EnergyTracker("train", n_devices=jax.device_count(), out_dir=log_dir)
    loop = TrainLoop(
        step_fn,
        state,
        batcher,
        mesh=mesh,
        n_epochs=2 if fast_dev_run else t["n_epochs"],
        logger=logger,
        ckpt=ckpt,
        validate_fn=validator,
        validation_interval=1 if fast_dev_run else t.get("validation_interval", 10),
        early_stop_patience=t.get("early_stop_patience"),
        rng=jax.random.key(t.get("seed", 42) + 1),
        energy=energy,
        accumulate_batches=accumulate,
        index_cache=cache,
        # auto-enabled on real accelerators: unwedges a stalled tunneled
        # device fetch by probing from a subprocess (obs/watchdog.py)
        watchdog=StallWatchdog(),
        log_every=t.get("log_every", 50),
        checkpoint_interval=t.get("checkpoint_interval"),
    )

    test_results = None
    if test_from_checkpoint is not None:
        mgr = CheckpointManager(test_from_checkpoint)
        state = mgr.restore("best" if mgr.exists("best") else "last", template=state)
    else:
        if checkpoint_resume:
            loop.resume("last")
        state = loop.run()
        if ckpt.exists("best"):
            state = ckpt.restore("best", template=state)

    if evaluation and data.get("eval_folder") and Path(data["eval_folder"]).exists():
        # label-free eval: dump raw + postprocessed score trees
        # (reference on_test_epoch_end evaluation branch, :929-971)
        from ..inference.io import write_sed_scores
        from .evaluate import predict_dataset

        eval_set = UnlabeledSet(
            data["eval_folder"], encoder,
            pad_to=data["audio_max_len"], fs=data["fs"], test=True,
            return_filename=True,
            embeddings_hdf5_file=_emb_file(config, "eval"),
            embedding_type=emb_type,
        )
        raw, post, _, _, _ = predict_dataset(
            predict_fn, state.student_params, state.student_stats,
            eval_set, encoder, t.get("batch_size_val", 24),
            thresholds=(0.5,), median_filter=median, scaler=state.scaler,
        )
        write_sed_scores(raw, Path(log_dir) / "eval_scores" / "student" / "raw")
        write_sed_scores(
            post, Path(log_dir) / "eval_scores" / "student" / "postprocessed"
        )
        print(f"eval scores written for {len(raw)} clips -> {log_dir}/eval_scores")

    if "test_folder" in data and not evaluation:
        test_set = StronglyAnnotatedSet(
            data["test_folder"],
            pd.read_csv(data["test_tsv"], sep="\t"),
            encoder,
            pad_to=data["audio_max_len"], fs=data["fs"], test=True,
            return_filename=True,
            embeddings_hdf5_file=_emb_file(config, "devtest"),
            embedding_type=emb_type,
        )
        maestro_test_kwargs = {}
        if (
            data.get("real_maestro_val_folder")
            and data.get("real_maestro_val_tsv")
            and Path(data["real_maestro_val_folder"]).exists()
        ):
            from ..inference.io import read_ground_truth_events
            from ..utils.classes_dict import CLASSES_MAESTRO_REAL_EVAL

            m_tsv = pd.read_csv(data["real_maestro_val_tsv"], sep="\t")
            if "confidence" in m_tsv.columns:
                m_tsv = m_tsv[m_tsv.confidence > 0.5]
            m_tsv = m_tsv[m_tsv["event_label"].isin(CLASSES_MAESTRO_REAL_EVAL)]
            maestro_test_kwargs = dict(
                maestro_set=StronglyAnnotatedSet(
                    data["real_maestro_val_folder"],
                    pd.read_csv(data["real_maestro_val_tsv"], sep="\t"),
                    encoder,
                    pad_to=data["audio_max_len"], fs=data["fs"], test=True,
                    return_filename=True,
                    embeddings_hdf5_file=_emb_file(config, "maestro_real_val"),
                    embedding_type=emb_type,
                ),
                maestro_gt=read_ground_truth_events(m_tsv),
                maestro_classes=sorted(CLASSES_MAESTRO_REAL_EVAL),
            )
        if cache is not None and t.get("device_cache_eval", True):
            # the 50-threshold battery also serves from resident stores
            # (one scan dispatch per model instead of per-batch round trips)
            from ..data.device_cache import build_eval_caches

            wrapped = build_eval_caches(
                {"test": test_set,
                 "maestro": maestro_test_kwargs.get("maestro_set")},
                t.get("batch_size_val", 24), verbose=not fast_dev_run,
            )
            test_set = wrapped["test"]
            if maestro_test_kwargs.get("maestro_set") is not None:
                maestro_test_kwargs["maestro_set"] = wrapped["maestro"]
        test_results = run_test(
            predict_fn,
            state,
            test_set,
            encoder,
            pd.read_csv(data["test_tsv"], sep="\t"),
            pd.read_csv(data["test_dur"], sep="\t"),
            batch_size=t.get("batch_size_val", 24),
            n_thresholds=2 if fast_dev_run else t.get("n_test_thresholds", 50),
            median_filter=median,
            desed_classes=list(CLASSES_DESED.keys()),
            save_dir=Path(log_dir) / "figures",
            **maestro_test_kwargs,
        )
        logger.log_scalars(
            0,
            {
                "test/student/psds1": test_results["psds1"],
                "test/student/psds2": test_results["psds2"],
                "test/student/intersection_f1_macro": test_results["intersection_f1_macro"],
                "test/student/event_f1_macro": test_results["event_f1_macro"],
            },
        )
    logger.close()
    return state, test_results
