"""Mean-teacher train-step tests: loss plumbing, EMA semantics, scheduler
curve, and multi-device data parallelism on the 8-way virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.models import CRNN
from desed_task_tpu.ops.frontend import MelConfig
from desed_task_tpu.parallel import make_mesh, replicate, shard_batch
from desed_task_tpu.training import (
    ExponentialWarmup,
    MeanTeacherConfig,
    SlotSpec,
    create_state,
    make_optimizer,
    make_predict_step,
    make_train_step,
)

MEL = MelConfig()
N_CLASS = 10


def tiny_model():
    return CRNN(
        nclass=N_CLASS,
        n_RNN_cell=16,
        n_layers_RNN=1,
        kernel_size=[3, 3],
        padding=[1, 1],
        stride=[1, 1],
        nb_filters=[8, 8],
        pooling=[[2, 8], [2, 16]],  # 128 mels -> 1
        dropout=0.1,
    )


def tiny_cfg(sizes=(4, 4, 8)):
    return MeanTeacherConfig(
        slots=(
            SlotSpec("synth", sizes[0], "strong"),
            SlotSpec("weak", sizes[1], "weak"),
            SlotSpec("unlabeled", sizes[2], "unlabeled"),
        ),
        mixup="soft",
        mixup_prob=0.5,
        mixup_groups=(("synth",), ("weak",)),
        rampup_steps=50,
        const_max=2.0,
    )


def make_batch(cfg, rng, n_samples=32000, t_lab=31):
    batch = {}
    for s in cfg.slots:
        audio = rng.standard_normal((s.size, n_samples)).astype(np.float32) * 0.1
        labels = (rng.random((s.size, N_CLASS, t_lab)) > 0.9).astype(np.float32)
        if s.role == "unlabeled":
            labels = np.zeros_like(labels)
        batch[s.name] = {"audio": audio, "labels": labels}
    return batch


def test_scheduler_matches_reference_curve():
    sched = ExponentialWarmup(max_lr=0.001, rampup_length=100)
    # exp(-5 * (1 - s/100)^2)
    for s in [0, 10, 50, 100, 200]:
        phase = 1.0 - min(s, 100) / 100
        expected = 0.001 * np.exp(-5 * phase * phase)
        np.testing.assert_allclose(float(sched(s)), expected, rtol=1e-6)
    ann = ExponentialWarmup(
        0.001, 100, start_annealing=200, max_steps=400, min_lr=1e-8
    )
    np.testing.assert_allclose(float(ann(300)), 0.001 * np.cos(np.pi / 4), rtol=1e-6)
    assert float(ann(399)) >= 1e-8


def test_train_step_runs_and_learns(rng):
    # no warmup / no mixup so the supervised loss on a fixed batch must drop
    cfg = tiny_cfg()
    cfg = MeanTeacherConfig(
        slots=cfg.slots, mixup=None, rampup_steps=0, const_max=2.0
    )
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=0)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    step = jax.jit(make_train_step(model, cfg, tx, sched))
    key = jax.random.key(1)
    sup = []
    for i in range(10):
        state, metrics = step(state, batch, key)
        sup.append(float(metrics["loss_strong"]) + float(metrics["loss_weak"]))
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 10
    assert float(metrics["lr"]) > 0
    assert sup[-1] < sup[0]


def test_ema_alpha_schedule_and_teacher_tracks_student(rng):
    cfg = tiny_cfg()
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-2, rampup_steps=10)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    t0 = jax.tree_util.tree_leaves(state.teacher_params)[0].copy()
    s0 = jax.tree_util.tree_leaves(state.student_params)[0].copy()
    np.testing.assert_array_equal(t0, s0)  # teacher starts as a copy
    step = jax.jit(make_train_step(model, cfg, tx, sched))
    state, _ = step(state, batch, jax.random.key(1))
    s1 = jax.tree_util.tree_leaves(state.student_params)[0]
    t1 = jax.tree_util.tree_leaves(state.teacher_params)[0]
    # at step 0: alpha = min(1 - 1/2, 0.999) = 0.5 -> teacher halfway to new student
    np.testing.assert_allclose(np.asarray(t1), 0.5 * np.asarray(t0) + 0.5 * np.asarray(s1), atol=1e-6)
    # BN stats are NOT EMA'd: teacher stats come from its own forward
    if jax.tree_util.tree_leaves(state.teacher_stats):
        t_stats = jax.tree_util.tree_leaves(state.teacher_stats)[0]
        s_stats = jax.tree_util.tree_leaves(state.student_stats)[0]
        assert not np.allclose(np.asarray(t_stats), 0.0) or not np.allclose(
            np.asarray(s_stats), 0.0
        )


def test_train_step_data_parallel_8dev(rng):
    """Same math on a ('data',) mesh: global batch sharded over 8 devices."""
    assert jax.device_count() == 8
    mesh = make_mesh({"data": 8})
    cfg = tiny_cfg(sizes=(8, 8, 16))  # divisible by 8
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=50)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    state = jax.device_put(state, replicate(mesh))
    sbatch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(model, cfg, tx, sched))
    state, metrics = step(state, sbatch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, sbatch, jax.random.key(1))
    assert int(state.step) == 2


def test_predict_step_eval_mode(rng):
    cfg = tiny_cfg()
    model = tiny_model()
    tx, _ = make_optimizer(lr=1e-3, rampup_steps=50)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    predict = jax.jit(make_predict_step(model))
    audio = jnp.asarray(batch["synth"]["audio"])
    strong, weak = predict(state.student_params, state.student_stats, audio)
    assert strong.shape == (4, N_CLASS, 31)
    assert weak.shape == (4, N_CLASS)
    out = np.asarray(strong)
    assert (out >= 0).all() and (out <= 1).all()
    # deterministic (no dropout in eval)
    strong2, _ = predict(state.student_params, state.student_stats, audio)
    np.testing.assert_array_equal(out, np.asarray(strong2))


def test_sharded_step_matches_jit_collective_count(rng):
    """shard_map step runs on the 8-way mesh and trains; its compiled HLO has
    no all-to-all resharding (only pmean all-reduces)."""
    import re

    from desed_task_tpu.training.mean_teacher import make_train_step_sharded

    mesh = make_mesh({"data": 8})
    cfg = tiny_cfg(sizes=(8, 8, 16))
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=50)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    state = jax.device_put(state, replicate(mesh))
    sbatch = shard_batch(batch, mesh)
    step = make_train_step_sharded(model, cfg, tx, sched, mesh, batch)
    hlo = step.lower(state, sbatch, jax.random.key(1)).compile().as_text()
    assert len(re.findall("all-to-all", hlo)) == 0
    state, metrics = step(state, sbatch, jax.random.key(1))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    assert int(jax.device_get(state.step)) == 1


def test_e2e_embedder_in_train_step(rng):
    """True e2e mode: frozen BEATs computes embeddings inside the jitted step
    (the reference's e2e flag is NotImplementedError there)."""
    from desed_task_tpu.models.beats import BEATsConfig, BEATsModel

    beats_cfg = BEATsConfig(
        encoder_layers=1, encoder_embed_dim=32, embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2,
        conv_pos=8, conv_pos_groups=2, num_buckets=16, max_distance=32,
    )
    embedder = BEATsModel(beats_cfg)
    e_vars = embedder.init(jax.random.key(5), jnp.zeros((1, 32000), jnp.float32))
    emb_frames = embedder.apply(e_vars, jnp.zeros((1, 32000)))["frame"].shape[-1]

    cfg = tiny_cfg()
    model = CRNN(
        nclass=N_CLASS, n_RNN_cell=16, n_layers_RNN=1, kernel_size=[3, 3],
        padding=[1, 1], stride=[1, 1], nb_filters=[8, 8],
        pooling=[[2, 8], [2, 16]], dropout=0.1,
        use_embeddings=True, embedding_size=32, aggregation_type="pool1d",
    )
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=50)
    batch = make_batch(cfg, rng)
    init_batch = {
        k: dict(v, embeddings=np.zeros((v["audio"].shape[0], 32, emb_frames), np.float32))
        for k, v in batch.items()
    }
    state = create_state(model, cfg, tx, jax.random.key(0), init_batch)
    step = jax.jit(
        make_train_step(model, cfg, tx, sched, embedder=(embedder.apply, e_vars))
    )
    state, metrics = step(state, batch, jax.random.key(1))  # batch WITHOUT embeddings
    assert np.isfinite(float(metrics["loss"]))
    # frozen embedder: gradient must not touch its params (they're closed over)
    state, metrics = step(state, batch, jax.random.key(1))
    assert int(state.step) == 2


def det_model(dropout=0.0):
    """CRNN with every stochastic piece off (no dropout / specaugment), so a
    train-mode forward is deterministic given params — needed for exact
    gradient-accumulation equality checks."""
    return CRNN(
        nclass=N_CLASS,
        n_RNN_cell=16,
        n_layers_RNN=1,
        kernel_size=[3, 3],
        padding=[1, 1],
        stride=[1, 1],
        nb_filters=[8, 8],
        pooling=[[2, 8], [2, 16]],
        dropout=dropout,
        specaugm_t_p=0.0,
        specaugm_f_p=0.0,
    )


def test_accumulate_grads_match_full_batch(rng):
    """accumulate=2 over two identical micro-batches produces EXACTLY the
    full-batch update (grads are means; train-mode BN normalizes with the
    current batch stats, so the forward is identical). The only documented
    divergence is BN *running* stats, which see two momentum updates instead
    of one: new = m^2*old + (1-m^2)*batch_stat."""
    cfg = MeanTeacherConfig(
        slots=tiny_cfg().slots, mixup=None, rampup_steps=10, const_max=2.0
    )
    model = det_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    batch = make_batch(cfg, rng)
    state0 = create_state(model, cfg, tx, jax.random.key(0), batch)

    step1 = jax.jit(make_train_step(model, cfg, tx, sched))
    step2 = jax.jit(make_train_step(model, cfg, tx, sched, accumulate=2))
    stacked = jax.tree_util.tree_map(lambda x: np.stack([x, x], 0), batch)

    s_full, m_full = step1(state0, batch, jax.random.key(1))
    s_acc, m_acc = step2(state0, stacked, jax.random.key(1))

    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.student_params),
        jax.tree_util.tree_leaves(s_acc.student_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.teacher_params),
        jax.tree_util.tree_leaves(s_acc.teacher_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5
    )
    assert int(s_acc.step) == 1  # one optimizer step per accumulation window

    # BN running stats: two chained momentum updates on the same batch stat.
    m = 0.01  # flax momentum in the CNN stack (torch momentum 0.99, cnn.py:190)
    full_leaves = jax.tree_util.tree_leaves(s_full.student_stats)
    acc_leaves = jax.tree_util.tree_leaves(s_acc.student_stats)
    init_leaves = jax.tree_util.tree_leaves(state0.student_stats)
    for x0, x1, x2 in zip(init_leaves, full_leaves, acc_leaves):
        x0, x1, x2 = map(np.asarray, (x0, x1, x2))
        # solve batch_stat from the single update, apply momentum twice
        batch_stat = (x1 - m * x0) / (1.0 - m)
        np.testing.assert_allclose(
            x2, m * m * x0 + (1 - m * m) * batch_stat, atol=1e-4
        )


def test_accumulate_different_micros_runs_and_learns(rng):
    """Two DIFFERENT micro-batches per step: loss plumbing finite, one step
    increment per call, supervised loss drops on a fixed pair."""
    cfg = MeanTeacherConfig(
        slots=tiny_cfg().slots, mixup="soft", mixup_prob=0.5,
        mixup_groups=(("synth",), ("weak",)), rampup_steps=0, const_max=2.0,
    )
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=0)
    b1, b2 = make_batch(cfg, rng), make_batch(cfg, rng)
    stacked = jax.tree_util.tree_map(lambda a, b: np.stack([a, b], 0), b1, b2)
    state = create_state(model, cfg, tx, jax.random.key(0), b1)
    step = jax.jit(make_train_step(model, cfg, tx, sched, accumulate=2))
    sup = []
    for _ in range(8):
        state, metrics = step(state, stacked, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        sup.append(float(metrics["loss_strong"]) + float(metrics["loss_weak"]))
    assert int(state.step) == 8
    assert sup[-1] < sup[0]


def test_accumulate_sharded_8dev(rng):
    """Gradient accumulation under the shard_map step: micro axis leading,
    example axis sharded over the 8-way data mesh."""
    from desed_task_tpu.training.mean_teacher import make_train_step_sharded

    mesh = make_mesh({"data": 8})
    cfg = tiny_cfg(sizes=(8, 8, 16))
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=50)
    b1, b2 = make_batch(cfg, rng), make_batch(cfg, rng)
    stacked = jax.tree_util.tree_map(lambda a, b: np.stack([a, b], 0), b1, b2)
    state = create_state(model, cfg, tx, jax.random.key(0), b1)
    state = jax.device_put(state, replicate(mesh))
    sbatch = shard_batch(stacked, mesh, batch_axis=1)
    step = make_train_step_sharded(model, cfg, tx, sched, mesh, b1, accumulate=2)
    state, metrics = step(state, sbatch, jax.random.key(1))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    assert int(jax.device_get(state.step)) == 1


def test_2021_style_config_runs(rng):
    """2021 semantics: consistency over the whole batch, weak targets derived
    pre-mixup and soft-mixed directly (weak_labels_post_mixup=False)."""
    from desed_task_tpu.recipes_config import mean_teacher_2021

    cfg = mean_teacher_2021(batch_sizes=(4, 4, 8), steps_per_epoch=5)
    assert cfg.consistency_start_slot == 0
    assert not cfg.weak_labels_post_mixup
    model = tiny_model()
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=10)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    step = jax.jit(make_train_step(model, cfg, tx, sched))
    for i in range(3):
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


@pytest.mark.slow  # multi-device integration: 8-dev shard_map x interpret-mode
def test_sharded_step_with_fused_pallas_blocks(rng):
    """Pod-deployment path: the fused Pallas conv-block kernels must trace
    and execute inside shard_map (per-device local batch shapes). Runs the
    kernels in interpret mode on the 8-device CPU mesh."""
    assert jax.device_count() == 8
    mesh = make_mesh({"data": 8})
    cfg = tiny_cfg(sizes=(8, 8, 16))
    from desed_task_tpu.training.mean_teacher import make_train_step_sharded

    model = tiny_model().clone(fused_blocks="interpret")
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=50)
    batch = make_batch(cfg, rng)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    state = jax.device_put(state, replicate(mesh))
    step = make_train_step_sharded(
        model, cfg, tx, sched, mesh, batch
    )
    sbatch = shard_batch(batch, mesh)
    state, metrics = step(state, sbatch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
