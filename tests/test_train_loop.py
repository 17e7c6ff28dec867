"""End-to-end integration smoke test (fast_dev_run equivalent, SURVEY.md §4):
tiny synthetic DESED-style data -> mean-teacher training with validation,
checkpointing, early stopping, resume -> test battery. Exercises layers
L2-L8 without any real data download."""

import numpy as np
import pandas as pd
import pytest

import jax

from desed_task_tpu.data import MultiSourceBatcher, StronglyAnnotatedSet, UnlabeledSet, WeakSet, write_wav
from desed_task_tpu.labels import ManyHotEncoder
from desed_task_tpu.models import CRNN
from desed_task_tpu.obs.checkpoint import CheckpointManager
from desed_task_tpu.obs.logging import MetricsLogger
from desed_task_tpu.training import (
    MeanTeacherConfig,
    SlotSpec,
    create_state,
    make_optimizer,
    make_predict_step,
    make_train_step,
)
from desed_task_tpu.training.evaluate import SEDValidator, multilabel_f1_macro, run_test
from desed_task_tpu.training.loop import TrainLoop

CLASSES = ["Speech", "Dog", "Cat"]
ENC = ManyHotEncoder(CLASSES, 2, 2048, 256, 4, 16000)  # 2 s clips -> 31 frames


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(7)
    rows = []
    for sub, n in [("synth", 8), ("weak", 8), ("unlab", 8), ("val", 6)]:
        (root / sub).mkdir()
        for i in range(n):
            x = (rng.standard_normal(32000) * 0.1).astype(np.float32)
            write_wav(root / sub / f"{sub}_{i}.wav", x, 16000)
    synth_tsv = pd.DataFrame(
        [(f"synth_{i}.wav", 0.2, 1.5, CLASSES[i % 3]) for i in range(8)],
        columns=["filename", "onset", "offset", "event_label"],
    )
    weak_tsv = pd.DataFrame(
        [(f"weak_{i}.wav", CLASSES[i % 3]) for i in range(8)],
        columns=["filename", "event_labels"],
    )
    val_tsv = pd.DataFrame(
        [(f"val_{i}.wav", 0.2, 1.5, CLASSES[i % 3]) for i in range(6)],
        columns=["filename", "onset", "offset", "event_label"],
    )
    val_dur = pd.DataFrame(
        [(f"val_{i}.wav", 2.0) for i in range(6)], columns=["filename", "duration"]
    )
    return root, synth_tsv, weak_tsv, val_tsv, val_dur


def tiny_model():
    return CRNN(
        nclass=3,
        n_RNN_cell=16,
        n_layers_RNN=1,
        kernel_size=[3, 3],
        padding=[1, 1],
        stride=[1, 1],
        nb_filters=[8, 8],
        pooling=[[2, 8], [2, 16]],
        dropout=0.1,
    )


def test_full_training_pipeline(corpus, tmp_path):
    root, synth_tsv, weak_tsv, val_tsv, val_dur = corpus
    datasets = {
        "synth": StronglyAnnotatedSet(root / "synth", synth_tsv, ENC, pad_to=2),
        "weak": WeakSet(root / "weak", weak_tsv, ENC, pad_to=2),
        "unlabeled": UnlabeledSet(root / "unlab", ENC, pad_to=2),
    }
    batcher = MultiSourceBatcher(
        datasets, {"synth": 4, "weak": 4, "unlabeled": 4}, seed=0, num_workers=2
    )
    assert batcher.steps_per_epoch == 2

    cfg = MeanTeacherConfig(
        slots=(
            SlotSpec("synth", 4, "strong"),
            SlotSpec("weak", 4, "weak"),
            SlotSpec("unlabeled", 4, "unlabeled"),
        ),
        mixup="soft",
        mixup_groups=(("synth",), ("weak",)),
        rampup_steps=10,
    )
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    sample = next(iter(batcher.epoch(steps=1)))
    state = create_state(model, cfg, tx, jax.random.key(0), sample)
    step = jax.jit(make_train_step(model, cfg, tx, sched), donate_argnums=0)
    predict = jax.jit(make_predict_step(model), static_argnames=())

    val_set = StronglyAnnotatedSet(
        root / "val", val_tsv, ENC, pad_to=2, test=True, return_filename=True
    )
    weak_val = WeakSet(root / "weak", weak_tsv, ENC, pad_to=2, test=True)
    validator = SEDValidator(
        predict,
        ENC,
        weak_set=weak_val,
        synth_set=val_set,
        synth_gt=val_tsv,
        synth_dur=val_dur,
        batch_size=4,
        median_filter=[3, 3, 3],
    )
    logger = MetricsLogger(tmp_path / "logs", use_tensorboard=False)
    ckpt = CheckpointManager(tmp_path / "ckpt")
    loop = TrainLoop(
        step,
        state,
        batcher,
        n_epochs=2,
        logger=logger,
        ckpt=ckpt,
        validate_fn=validator,
        validation_interval=1,
        rng=jax.random.key(1),
        log_every=1,
    )
    final_state = loop.run()
    assert int(jax.device_get(final_state.step)) == 4  # 2 epochs x 2 steps
    assert ckpt.exists("last") and ckpt.exists("best")
    text = (tmp_path / "logs" / "metrics.csv").read_text()
    assert "val/obj_metric" in text and "train/loss" in text

    # resume: counters restored, continues to epoch 3
    loop2 = TrainLoop(
        step, state, batcher, n_epochs=3, logger=logger, ckpt=ckpt,
        rng=jax.random.key(1),
    )
    assert loop2.resume("last")
    assert loop2.start_epoch == 2
    s3 = loop2.run()
    assert int(jax.device_get(s3.step)) == 6

    # test battery on the tiny validation set
    results = run_test(
        predict, final_state, val_set, ENC, val_tsv, val_dur,
        batch_size=4, n_thresholds=5, median_filter=[3, 3, 3],
        desed_classes=CLASSES, save_dir=tmp_path / "figs",
    )
    for k in ("psds1", "psds2", "intersection_f1_macro", "event_f1_macro"):
        assert 0.0 <= results[k] <= 1.0
    assert len(results["scores_postprocessed"]) == 6
    # reference save layout: ROC pngs + per-threshold prediction dumps
    assert (tmp_path / "figs" / "PSDS_scenario1_roc.png").exists()
    dumped = list(
        (tmp_path / "figs" / "predictions_dtc0.7_gtc0.7_cttc0.3").glob(
            "predictions_th_*.tsv"
        )
    )
    assert len(dumped) == 5


def test_train_loop_gradient_accumulation(corpus, tmp_path):
    """accumulate_batches=2: the loop stacks 2 consecutive batcher batches on
    a leading micro axis and the step takes ONE optimizer step per group
    (reference Trainer accumulate_grad_batches, train_pretrained.py:567)."""
    root, synth_tsv, weak_tsv, _, _ = corpus
    datasets = {
        "synth": StronglyAnnotatedSet(root / "synth", synth_tsv, ENC, pad_to=2),
        "weak": WeakSet(root / "weak", weak_tsv, ENC, pad_to=2),
        "unlabeled": UnlabeledSet(root / "unlab", ENC, pad_to=2),
    }
    batcher = MultiSourceBatcher(
        datasets, {"synth": 2, "weak": 2, "unlabeled": 2}, seed=0, num_workers=1
    )
    assert batcher.steps_per_epoch == 4  # -> 2 optimizer steps/epoch at acc=2
    cfg = MeanTeacherConfig(
        slots=(
            SlotSpec("synth", 2, "strong"),
            SlotSpec("weak", 2, "weak"),
            SlotSpec("unlabeled", 2, "unlabeled"),
        ),
        mixup="soft",
        mixup_groups=(("synth",), ("weak",)),
        rampup_steps=10,
    )
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    sample = next(iter(batcher.epoch(steps=1)))
    state = create_state(model, cfg, tx, jax.random.key(0), sample)
    step = jax.jit(
        make_train_step(model, cfg, tx, sched, accumulate=2), donate_argnums=0
    )
    logger = MetricsLogger(tmp_path / "logs_acc", use_tensorboard=False)
    loop = TrainLoop(
        step, state, batcher, n_epochs=2, logger=logger,
        rng=jax.random.key(1), log_every=1, accumulate_batches=2,
    )
    final_state = loop.run()
    # 2 epochs x (4 batches // 2) = 4 optimizer steps
    assert int(jax.device_get(final_state.step)) == 4


def test_multilabel_f1():
    probs = np.array([[0.9, 0.1], [0.8, 0.7], [0.2, 0.6]])
    targets = np.array([[1, 0], [1, 1], [0, 1]])
    assert multilabel_f1_macro(probs, targets) == 1.0
    assert multilabel_f1_macro(1 - probs, targets) == 0.0


def test_checkpoint_cadence(corpus, tmp_path):
    """`last` saves follow checkpoint_interval (default: validation cadence
    — the reference's ModelCheckpoint only fires on validation), plus the
    final epoch and the early-stop epoch, never in between."""
    root, synth_tsv, weak_tsv, val_tsv, val_dur = corpus
    datasets = {
        "synth": StronglyAnnotatedSet(root / "synth", synth_tsv, ENC, pad_to=2),
        "weak": WeakSet(root / "weak", weak_tsv, ENC, pad_to=2),
        "unlabeled": UnlabeledSet(root / "unlab", ENC, pad_to=2),
    }
    batcher = MultiSourceBatcher(
        datasets, {"synth": 4, "weak": 4, "unlabeled": 4}, seed=0, num_workers=0
    )
    cfg = MeanTeacherConfig(
        slots=(
            SlotSpec("synth", 4, "strong"),
            SlotSpec("weak", 4, "weak"),
            SlotSpec("unlabeled", 4, "unlabeled"),
        ),
        mixup="soft",
        mixup_groups=(("synth",), ("weak",)),
        rampup_steps=10,
    )
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    sample = next(iter(batcher.epoch(steps=1)))
    state = create_state(model, cfg, tx, jax.random.key(0), sample)
    step = jax.jit(make_train_step(model, cfg, tx, sched), donate_argnums=0)

    class CountingCkpt(CheckpointManager):
        def __init__(self, directory):
            super().__init__(directory)
            self.save_epochs = []

        def save(self, state, metadata=None, name="last"):
            if name == "last":
                self.save_epochs.append(metadata["epoch"])
            super().save(state, metadata, name)

    # no validate_fn, explicit interval 3, 7 epochs: saves at 2, 5, final 6
    ckpt = CountingCkpt(tmp_path / "ck_int3")
    logger = MetricsLogger(tmp_path / "logs_cad", use_tensorboard=False)
    loop = TrainLoop(
        step, state, batcher, n_epochs=7, logger=logger, ckpt=ckpt,
        rng=jax.random.key(1), checkpoint_interval=3,
    )
    state2 = loop.run()
    assert ckpt.save_epochs == [2, 5, 6]
    assert loop.resume("last") and loop.start_epoch == 7

    # default (None) without validation falls back to every epoch
    ckpt2 = CountingCkpt(tmp_path / "ck_def")
    loop2 = TrainLoop(
        step, state2, batcher, n_epochs=2, logger=logger, ckpt=ckpt2,
        rng=jax.random.key(1),
    )
    state3 = loop2.run()
    assert ckpt2.save_epochs == [0, 1]

    # default with validation every 2 epochs: saves on val epochs + final
    ckpt3 = CountingCkpt(tmp_path / "ck_val")
    loop3 = TrainLoop(
        step, state3, batcher, n_epochs=5, logger=logger, ckpt=ckpt3,
        validate_fn=lambda state, epoch: (0.5, {}),
        validation_interval=2, rng=jax.random.key(1),
    )
    loop3.run()
    assert ckpt3.save_epochs == [1, 3, 4]


def test_mesh_checkpoint_roundtrip_resume(corpus, tmp_path):
    """VERDICT r4 #6: save -> restore -> continue-training of a replicated
    MeanTeacherState on the 8-virtual-device mesh reproduces an uninterrupted
    run step for step (metrics AND final params bit-equal)."""
    from desed_task_tpu.parallel import make_mesh, replicate
    from desed_task_tpu.training import make_train_step_sharded

    n_dev = jax.device_count()
    if n_dev < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    root, synth_tsv, weak_tsv, *_ = corpus
    datasets = {
        "synth": StronglyAnnotatedSet(root / "synth", synth_tsv, ENC, pad_to=2),
        "weak": WeakSet(root / "weak", weak_tsv, ENC, pad_to=2),
        "unlabeled": UnlabeledSet(root / "unlab", ENC, pad_to=2),
    }
    sizes = {"synth": n_dev, "weak": n_dev, "unlabeled": n_dev}
    cfg = MeanTeacherConfig(
        slots=(
            SlotSpec("synth", n_dev, "strong"),
            SlotSpec("weak", n_dev, "weak"),
            SlotSpec("unlabeled", n_dev, "unlabeled"),
        ),
        mixup="soft",
        mixup_groups=(("synth",), ("weak",)),
        rampup_steps=10,
    )
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    mesh = make_mesh({"data": n_dev})

    def fresh_state(batcher):
        sample = next(iter(batcher.epoch(steps=1)))
        st = create_state(model, cfg, tx, jax.random.key(0), sample)
        return jax.device_put(st, replicate(mesh))

    def make_loop(state, batcher, rec, ckpt, n_epochs):
        step = make_train_step_sharded(
            model, cfg, tx, sched, mesh,
            next(iter(batcher.epoch(steps=1))),
        )

        def rec_step(st, batch, rng):
            st, m = step(st, batch, rng)
            rec.append(float(m["loss"]))
            return st, m

        return TrainLoop(
            rec_step, state, batcher, mesh=mesh, n_epochs=n_epochs,
            logger=MetricsLogger(tmp_path / "logs_mesh", use_tensorboard=False),
            ckpt=ckpt, rng=jax.random.key(1), log_every=1,
        )

    # uninterrupted 4-epoch run (2 steps/epoch with 8-clip sets, batch n_dev)
    losses_a: list = []
    batch_a = MultiSourceBatcher(datasets, sizes, seed=0, num_workers=1)
    loop_a = make_loop(fresh_state(batch_a), batch_a, losses_a, None, 4)
    state_a = loop_a.run()

    # interrupted: 2 epochs -> 'last' checkpoint -> fresh loop resumes
    losses_b: list = []
    ckpt = CheckpointManager(tmp_path / "ckpt_mesh")
    batch_b = MultiSourceBatcher(datasets, sizes, seed=0, num_workers=1)
    loop_b1 = make_loop(fresh_state(batch_b), batch_b, losses_b, ckpt, 2)
    loop_b1.run()

    losses_b2: list = []
    batch_b2 = MultiSourceBatcher(datasets, sizes, seed=0, num_workers=1)
    for _ in range(2):  # advance the stateful batch stream to epoch 2
        for _ in batch_b2.epoch():
            pass
    loop_b2 = make_loop(fresh_state(batch_b2), batch_b2, losses_b2, ckpt, 4)
    assert loop_b2.resume("last") and loop_b2.start_epoch == 2
    state_b = loop_b2.run()

    # step-for-step metric equality past the resume point + equal params
    np.testing.assert_array_equal(losses_b + losses_b2, losses_a)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.student_params),
        jax.tree_util.tree_leaves(state_b.student_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.teacher_params),
        jax.tree_util.tree_leaves(state_b.teacher_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jax.device_get(state_b.step)) == int(jax.device_get(state_a.step))
