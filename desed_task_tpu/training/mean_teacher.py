"""Generic mean-teacher SED trainer — one engine for all DCASE recipes.

Replaces the reference's four duplicated LightningModules
(recipes/dcase202{1,2,3,4}_task4_baseline/local/sed_trainer*.py) with a single
jittable train step parameterized by a static config:

    batch (per-slot audio/labels/embeddings/class-masks)
      -> on-device linear mel (ops/frontend)
      -> probabilistic within-group mixup of features+embeddings+labels
         (sed_trainer_pretrained.py:349-363)
      -> class-validity label masking (:366-370)
      -> log-dB + scaler -> student forward (train mode: dropout, SpecAugment,
         dropstep, BN batch stats)
      -> BCE on strong slots + BCE on weak slots (:381-392)
      -> teacher forward (train mode, no grad; its OWN BN running stats update
         via its own forward — teacher params are EMA'd but BN buffers are not,
         matching torch .parameters() iteration, :194-206)
      -> MSE/BCE student<->teacher consistency on the configured slot range,
         weighted by const_max * warmup ramp, frozen after `decay_steps`
         (:402-418)
      -> clip-by-global-norm + Adam (warmup schedule) + EMA teacher update
         with alpha = min(1 - 1/(step+1), ema_factor) applied to the UPDATED
         student (Lightning calls on_before_zero_grad after optimizer.step).

The whole step is one XLA program: augmentation, front-end, both forwards,
backward, optimizer and EMA all fuse into a single device launch. Batch
arrays are logically global; under a `('data',)` mesh they arrive sharded on
axis 0 and XLA inserts the gradient psum automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..ops.augment import add_noise, frame_shift, mixup
from ..ops.frontend import MelConfig, amplitude_to_db, mel_spectrogram
from ..ops.scaler import ScalerConfig, ScalerState, apply_scaler
from .losses import SELF_SUP_LOSSES, bce
from .schedulers import ExponentialWarmup


@dataclasses.dataclass(frozen=True)
class SlotSpec:
    """One fixed-ratio batch slot (ConcatDatasetBatchSampler semantics,
    desed_task/dataio/sampler.py:69-79)."""

    name: str
    size: int  # GLOBAL examples per step for this slot
    role: str  # "strong" | "weak" | "unlabeled"


@dataclasses.dataclass(frozen=True)
class MeanTeacherConfig:
    slots: tuple[SlotSpec, ...]
    # mixup
    mixup: Optional[str] = "soft"  # "soft" | "hard" | None
    mixup_prob: float = 0.5
    mixup_groups: tuple[tuple[str, ...], ...] = ()  # groups of slot names
    # consistency
    const_max: float = 2.0
    self_sup_loss: str = "mse"
    consistency_start_slot: int = 0  # slot index from which consistency applies
    rampup_steps: int = 1
    decay_steps: Optional[int] = None  # freeze weight at const_max afterwards
    # teacher
    ema_factor: float = 0.999
    # optional in-graph augmentations (off in all reference recipes' steps)
    frame_shift_std: float = 0.0
    add_noise_snrs: Optional[tuple[float, float]] = None
    net_pooling: int = 4
    # 2021-style: weak targets derived before mixup and soft-mixed directly
    weak_labels_post_mixup: bool = True

    # --- derived static ranges --------------------------------------------
    def _offsets(self):
        offs = [0]
        for s in self.slots:
            offs.append(offs[-1] + s.size)
        return offs

    @property
    def batch_size(self) -> int:
        return self._offsets()[-1]

    def slot_range(self, name: str) -> tuple[int, int]:
        offs = self._offsets()
        for i, s in enumerate(self.slots):
            if s.name == name:
                return offs[i], offs[i + 1]
        raise KeyError(name)

    def role_range(self, role: str) -> tuple[int, int]:
        """Contiguous range of all slots with `role` (asserted contiguous)."""
        offs = self._offsets()
        idx = [i for i, s in enumerate(self.slots) if s.role == role]
        if not idx:
            return (0, 0)
        assert idx == list(range(idx[0], idx[-1] + 1)), f"{role} slots not contiguous"
        return offs[idx[0]], offs[idx[-1] + 1]

    @property
    def consistency_range(self) -> tuple[int, int]:
        return self._offsets()[self.consistency_start_slot], self.batch_size


class MeanTeacherState(struct.PyTreeNode):
    step: jnp.ndarray
    student_params: Any
    teacher_params: Any
    student_stats: Any
    teacher_stats: Any
    opt_state: Any
    scaler: Optional[ScalerState] = None


def make_optimizer(
    lr: float,
    rampup_steps: int,
    max_grad_norm: float = 5.0,
    start_annealing: int | None = None,
    max_steps: int | None = None,
) -> tuple[optax.GradientTransformation, ExponentialWarmup]:
    """Adam + exponential warmup + global-norm clipping, as the reference
    (train_pretrained.py:469-482 + Trainer gradient_clip_val)."""
    schedule = ExponentialWarmup(
        max_lr=lr,
        rampup_length=rampup_steps,
        start_annealing=start_annealing,
        max_steps=max_steps,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm) if max_grad_norm else optax.identity(),
        optax.adam(learning_rate=schedule),
    )
    return tx, schedule


def create_state(
    model,
    cfg: MeanTeacherConfig,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: dict,
    scaler: ScalerState | None = None,
    mel_cfg: MelConfig = MelConfig(),
) -> MeanTeacherState:
    """Initialize student; teacher starts as an exact copy (reference
    deepcopies the student at init, train_pretrained.py:520-533)."""
    audio, labels, emb, cmask = _concat_batch(cfg, sample_batch)
    feats = mel_spectrogram(audio, mel_cfg)
    kp, kd, ka = jax.random.split(rng, 3)
    kwargs = {}
    if emb is not None:
        kwargs["embeddings"] = emb
    variables = model.init(
        {"params": kp, "dropout": kd, "augment": ka},
        amplitude_to_db(feats, mel_cfg),
        classes_mask=cmask,
        train=True,
        **kwargs,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", FrozenDict())
    # real copies (not aliases): student/teacher leaves must be distinct
    # buffers so the train step can donate the whole state.
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    return MeanTeacherState(
        step=jnp.zeros((), jnp.int32),
        student_params=params,
        teacher_params=copy(params),
        student_stats=stats,
        teacher_stats=copy(stats),
        opt_state=optimizer.init(params),
        scaler=scaler,
    )


def _concat_batch(cfg: MeanTeacherConfig, batch: dict):
    """Concatenate per-slot arrays in slot order -> global batch arrays."""
    audio = jnp.concatenate([batch[s.name]["audio"] for s in cfg.slots], 0)
    labels = jnp.concatenate([batch[s.name]["labels"] for s in cfg.slots], 0)
    embs = [batch[s.name].get("embeddings") for s in cfg.slots]
    emb = jnp.concatenate(embs, 0) if embs[0] is not None else None
    if emb is not None and emb.dtype != jnp.float32:
        # fp16 embedding stores transfer half the bytes; compute in f32
        emb = emb.astype(jnp.float32)
    masks = []
    n_class = labels.shape[1]
    for s in cfg.slots:
        m = batch[s.name].get("class_mask")
        if m is None:
            m = jnp.ones((batch[s.name]["audio"].shape[0], n_class), bool)
        masks.append(m)
    cmask = jnp.concatenate(masks, 0)
    return audio, labels, emb, cmask


def make_train_step(
    model,
    cfg: MeanTeacherConfig,
    optimizer: optax.GradientTransformation,
    schedule: ExponentialWarmup,
    mel_cfg: MelConfig = MelConfig(),
    scaler_cfg: ScalerConfig = ScalerConfig(),
    embedder=None,
    axis_name: str | None = None,
    accumulate: int = 1,
):
    """Build the jittable train step: (state, batch, rng) -> (state, metrics).

    accumulate: micro-batches per optimizer step (Lightning
    ``accumulate_grad_batches``, train_pretrained.py:567). When > 1 every
    batch leaf must carry a leading axis of size `accumulate`; the step scans
    over micro-batches inside one XLA program, averaging gradients and
    chaining BN batch-stats through the scan (matching torch buffer updates
    per forward), then applies ONE Adam update + ONE teacher EMA step —
    exactly one `state.step` increment per optimizer step, so schedules and
    the consistency ramp see optimizer steps, as Lightning's global_step.

    axis_name: set (e.g. "data") when the step body runs under shard_map —
    gradients, metrics, and BN batch-stats updates are psum-averaged over
    that axis so the replicated state stays identical on every device.

    embedder: optional (apply_fn, variables) computing frozen pretrained
    embeddings from raw audio INSIDE the jitted step (true e2e mode — the
    reference's e2e flag raises NotImplementedError,
    sed_trainer_pretrained.py:303-314). apply_fn(variables, audio) must
    return {"frame": [B, E, T_e], ...}; gradients are stopped. Under a
    ('data', 'model') mesh the embedder params may be tensor-parallel
    sharded (parallel/tp.py).
    """

    selfsup = SELF_SUP_LOSSES[cfg.self_sup_loss]
    strong_rng = cfg.role_range("strong")
    weak_rng = cfg.role_range("weak")
    cons_rng = cfg.consistency_range
    has_stats = True  # resolved at trace time from the state pytree

    def detect(params, stats, x, emb, cmask, rngs, scaler):
        """take_log + scaler + model forward (sed_trainer detect, :274-280)."""
        variables = {"params": params}
        mutable = []
        if stats:
            variables["batch_stats"] = stats
            mutable = ["batch_stats"]
        kwargs = {}
        if emb is not None:
            kwargs["embeddings"] = emb
        out = model.apply(
            variables,
            apply_scaler(x, scaler_cfg, scaler),
            classes_mask=cmask,
            train=True,
            rngs=rngs,
            mutable=mutable,
            **kwargs,
        )
        if mutable:
            (strong, weak), upd = out
            return strong, weak, upd.get("batch_stats", stats)
        strong, weak = out
        return strong, weak, stats

    def micro_step(state: MeanTeacherState, s_stats, t_stats, batch: dict,
                   rng: jax.Array, weight):
        """Grads + chained BN stats + losses for ONE micro-batch (params fixed)."""
        k_mix, k_gate, k_fs, k_noise, k_sd, k_sa, k_td, k_ta = jax.random.split(rng, 8)

        audio, labels, emb, cmask = _concat_batch(cfg, batch)
        if embedder is not None and emb is None:
            e_apply, e_vars = embedder
            emb = jax.lax.stop_gradient(e_apply(e_vars, audio)["frame"])
        features = mel_spectrogram(audio, mel_cfg)  # linear mel (power=1)

        # optional in-graph augmentations (reference ops, unused by recipes)
        if cfg.frame_shift_std > 0:
            features, labels = frame_shift(
                k_fs, features, labels, cfg.net_pooling, cfg.frame_shift_std,
                label_axis=-1,
            )
        if cfg.add_noise_snrs is not None:
            features = add_noise(k_noise, features, cfg.add_noise_snrs)

        # 2021-style weak targets: derived pre-mixup and soft-mixed
        wa, wb = weak_rng
        labels_weak_pre = (labels[wa:wb].sum(-1) > 0).astype(jnp.float32)

        # probabilistic within-group mixup (one gate per step, as reference)
        if cfg.mixup is not None and cfg.mixup_groups:
            do_mix = jax.random.bernoulli(k_gate, cfg.mixup_prob)
            for gi, group in enumerate(cfg.mixup_groups):
                a = min(cfg.slot_range(n)[0] for n in group)
                b = max(cfg.slot_range(n)[1] for n in group)
                kg = jax.random.fold_in(k_mix, gi)
                f_mix, l_mix, (perm, c) = mixup(
                    kg, features[a:b], labels[a:b], mixup_label_type=cfg.mixup)
                features = features.at[a:b].set(
                    jnp.where(do_mix, f_mix, features[a:b]))
                labels = labels.at[a:b].set(jnp.where(do_mix, l_mix, labels[a:b]))
                if emb is not None:
                    e_mix = c * emb[a:b] + (1.0 - c) * emb[a:b][perm]
                    emb = emb.at[a:b].set(jnp.where(do_mix, e_mix, emb[a:b]))
                if not cfg.weak_labels_post_mixup and (a, b) == weak_rng:
                    if cfg.mixup == "soft":
                        lw = jnp.clip(
                            c * labels_weak_pre + (1 - c) * labels_weak_pre[perm], 0, 1)
                    else:
                        lw = jnp.clip(labels_weak_pre + labels_weak_pre[perm], 0, 1)
                    labels_weak_pre = jnp.where(do_mix, lw, labels_weak_pre)

        # weak labels + class-validity masking (post-mixup, :366-370)
        if cfg.weak_labels_post_mixup:
            labels_weak = (labels[wa:wb].sum(-1) > 0).astype(jnp.float32)
        else:
            labels_weak = labels_weak_pre
        labels = jnp.where(cmask[:, :, None], labels, 0.0)
        labels_weak = jnp.where(cmask[wa:wb], labels_weak, 0.0)

        x = amplitude_to_db(features, mel_cfg)

        # teacher forward (train mode, no grad)
        t_strong, t_weak, new_t_stats = detect(
            state.teacher_params, t_stats, x, emb, cmask,
            {"dropout": k_td, "augment": k_ta}, state.scaler,
        )

        sa, sb = strong_rng
        ca, cb = cons_rng

        def loss_fn(params):
            s_strong, s_weak, new_s_stats = detect(
                params, s_stats, x, emb, cmask,
                {"dropout": k_sd, "augment": k_sa}, state.scaler,
            )
            loss_strong = bce(s_strong[sa:sb], labels[sa:sb])
            loss_weak = bce(s_weak[wa:wb], labels_weak)
            strong_self = selfsup(s_strong[ca:cb], jax.lax.stop_gradient(t_strong[ca:cb]))
            weak_self = selfsup(s_weak[ca:cb], jax.lax.stop_gradient(t_weak[ca:cb]))
            tot_self = (strong_self + weak_self) * weight
            total = loss_strong + loss_weak + tot_self
            aux = {
                "loss_strong": loss_strong,
                "loss_weak": loss_weak,
                "strong_self_sup_loss": strong_self,
                "weak_self_sup_loss": weak_self,
                "tot_self_loss": tot_self,
                "new_stats": new_s_stats,
            }
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student_params
        )
        losses = {
            "loss": total,
            "loss_strong": aux["loss_strong"],
            "loss_weak": aux["loss_weak"],
            "strong_self_sup_loss": aux["strong_self_sup_loss"],
            "weak_self_sup_loss": aux["weak_self_sup_loss"],
            "tot_self_loss": aux["tot_self_loss"],
        }
        return grads, aux["new_stats"], new_t_stats, losses

    def train_step(state: MeanTeacherState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            # decorrelate per-device randomness (dropout, mixup, masks)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        weight = cfg.const_max * schedule.scaling_factor(state.step)
        if cfg.decay_steps is not None:
            weight = jnp.where(state.step < cfg.decay_steps, weight, cfg.const_max)

        if accumulate == 1:
            grads, new_s_stats, new_t_stats, losses = micro_step(
                state, state.student_stats, state.teacher_stats, batch, rng, weight
            )
        else:
            def body(carry, xs):
                s_stats, t_stats, g_acc, l_acc = carry
                mb, i = xs
                g, ns, nt, losses = micro_step(
                    state, s_stats, t_stats, mb, jax.random.fold_in(rng, i), weight
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                l_acc = jax.tree_util.tree_map(jnp.add, l_acc, losses)
                return (ns, nt, g_acc, l_acc), None

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.student_params)
            l0 = {
                k: jnp.zeros((), jnp.float32)
                for k in ("loss", "loss_strong", "loss_weak",
                          "strong_self_sup_loss", "weak_self_sup_loss",
                          "tot_self_loss")
            }
            (new_s_stats, new_t_stats, g_sum, l_sum), _ = jax.lax.scan(
                body,
                (state.student_stats, state.teacher_stats, g0, l0),
                (batch, jnp.arange(accumulate)),
            )
            inv = 1.0 / accumulate
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
            losses = jax.tree_util.tree_map(lambda v: v * inv, l_sum)

        new_t_stats_synced = new_t_stats
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_s_stats = jax.lax.pmean(new_s_stats, axis_name)
            new_t_stats_synced = jax.lax.pmean(new_t_stats, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.student_params)
        new_student = optax.apply_updates(state.student_params, updates)

        # EMA teacher on UPDATED student params; BN stats NOT EMA'd.
        step1 = (state.step + 1).astype(jnp.float32)
        alpha = jnp.minimum(1.0 - 1.0 / (step1 + 1.0), cfg.ema_factor)
        new_teacher = jax.tree_util.tree_map(
            lambda t, s: alpha * t + (1.0 - alpha) * s,
            state.teacher_params,
            new_student,
        )

        new_state = state.replace(
            step=state.step + 1,
            student_params=new_student,
            teacher_params=new_teacher,
            student_stats=new_s_stats,
            teacher_stats=new_t_stats_synced,
            opt_state=new_opt,
        )
        if axis_name is not None:
            losses = jax.lax.pmean(losses, axis_name)
        metrics = losses | {
            "weight": weight,
            "lr": schedule(state.step),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    del has_stats
    return train_step


def make_predict_step(
    model,
    mel_cfg: MelConfig = MelConfig(),
    scaler_cfg: ScalerConfig = ScalerConfig(),
):
    """Inference forward: (params, stats, audio, emb?, scaler?) -> (strong, weak).

    Eval mode (no dropout/specaugment, BN running averages)."""

    def predict(params, stats, audio, embeddings=None, scaler=None, pad_mask=None):
        feats = amplitude_to_db(mel_spectrogram(audio, mel_cfg), mel_cfg)
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        kwargs = {}
        if embeddings is not None:
            kwargs["embeddings"] = embeddings
        return model.apply(
            variables,
            apply_scaler(feats, scaler_cfg, scaler),
            pad_mask=pad_mask,
            train=False,
            **kwargs,
        )

    return predict


def make_train_step_sharded(
    model,
    cfg: MeanTeacherConfig,
    optimizer: optax.GradientTransformation,
    schedule: ExponentialWarmup,
    mesh,
    sample_batch: dict,
    mel_cfg: MelConfig = MelConfig(),
    scaler_cfg: ScalerConfig = ScalerConfig(),
    embedder=None,
    axis: str = "data",
    accumulate: int = 1,
):
    """shard_map train step: every tensor stays device-local; the only
    cross-device traffic is the gradient / metric / BN-stats pmean.

    With accumulate > 1, batch leaves carry a leading micro-batch axis
    (replicated in time, sharded on the example axis 1).

    The plain jit step lets XLA reshard the slot-concatenated batch (measured:
    ~40 all-to-alls + ~47 collective-permutes per step on an 8-way mesh);
    here each device holds its own slot-structured mini-batch, so cfg.slots
    sizes must be divisible by the data-axis size.

    Semantics differences vs the global-batch step (documented): mixup pairs
    within each device's shard, and loss means are per-shard then averaged
    (equal shard sizes => identical value).
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_data = mesh.shape[axis]
    for s in cfg.slots:
        assert s.size % n_data == 0, (
            f"slot {s.name} size {s.size} not divisible by data axis {n_data}"
        )
    local_cfg = dataclasses.replace(
        cfg,
        slots=tuple(
            dataclasses.replace(s, size=s.size // n_data) for s in cfg.slots
        ),
    )
    inner = make_train_step(
        model, local_cfg, optimizer, schedule, mel_cfg, scaler_cfg,
        embedder=embedder, axis_name=axis, accumulate=accumulate,
    )
    spec = P(axis) if accumulate == 1 else P(None, axis)
    batch_specs = jax.tree_util.tree_map(lambda _: spec, sample_batch)
    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), batch_specs, P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(mapped, donate_argnums=0)
