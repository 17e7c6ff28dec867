"""Separation-ensemble mean-teacher step (2021 SEPSED recipe).

Re-designs recipes/dcase2021_task4_baseline/local/sepsed_trainer.py
(SEPSEDTask4_2021, :200-320): batches carry pre-separated sources
[b, n_src, N]; per-source linear mels are computed in-graph, the "mixture"
branch consumes the source-sum of the mels (sepsed_trainer detect,
:215-223), and the EnsembleModel (models/ensemble.py) blends the trainable
multisrc CRNN with a frozen monaural CRNN via the learned scalar q. The
mean-teacher loop (BCE strong/weak + MSE consistency + EMA) mirrors the
generic engine.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.frontend import MelConfig, amplitude_to_db, mel_spectrogram
from ..ops.scaler import ScalerConfig, apply_scaler
from .losses import SELF_SUP_LOSSES, bce
from .mean_teacher import MeanTeacherConfig, MeanTeacherState, _concat_batch
from .schedulers import ExponentialWarmup


def sepsed_featurize(audio, scaler, mel_cfg: MelConfig, scaler_cfg: ScalerConfig):
    """[B, n_src, N] separated waveforms -> per-source log-mel features plus
    the mixture branch's features from the source-SUM of the linear mels
    (sepsed_trainer detect, :215-223)."""
    b, n_src, n = audio.shape
    src_mel = mel_spectrogram(audio.reshape(b * n_src, n), mel_cfg)
    src_mel = src_mel.reshape(b, n_src, *src_mel.shape[1:])
    mix_mel = src_mel.sum(axis=1)
    log_scale = lambda m: apply_scaler(
        amplitude_to_db(m, mel_cfg), scaler_cfg, scaler
    )
    b2 = src_mel.reshape(b * n_src, *src_mel.shape[2:])
    sources = log_scale(b2).reshape(b, n_src, *b2.shape[1:])
    mixture = log_scale(mix_mel)
    return sources, mixture


def make_sepsed_predict_step(
    ensemble_model,
    monaural_variables: Optional[dict],
    mel_cfg: MelConfig = MelConfig(),
    scaler_cfg: ScalerConfig = ScalerConfig(),
):
    """Inference forward over separated sources: (params, stats,
    audio[B, n_src, N], scaler?) -> (strong, weak). Eval mode, blended with
    the frozen monaural branch."""

    def predict(params, stats, audio, scaler=None, pad_mask=None):
        sources, mixture = sepsed_featurize(audio, scaler, mel_cfg, scaler_cfg)
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        return ensemble_model.apply(
            variables,
            sources,
            mixture,
            monaural_variables=monaural_variables,
            train=False,
        )

    return predict


def make_sepsed_train_step(
    ensemble_model,
    monaural_variables: Optional[dict],
    cfg: MeanTeacherConfig,
    optimizer: optax.GradientTransformation,
    schedule: ExponentialWarmup,
    mel_cfg: MelConfig = MelConfig(),
    scaler_cfg: ScalerConfig = ScalerConfig(),
):
    """Batch slots carry "audio" of shape [b, n_src, N] (separated sources)."""

    selfsup = SELF_SUP_LOSSES[cfg.self_sup_loss]
    sa, sb = cfg.role_range("strong")
    wa, wb = cfg.role_range("weak")
    ca, cb = cfg.consistency_range

    def featurize(audio, scaler):
        return sepsed_featurize(audio, scaler, mel_cfg, scaler_cfg)

    def forward(params, stats, sources, mixture, rngs, train):
        variables = {"params": params}
        mutable = []
        if stats:
            variables["batch_stats"] = stats
            mutable = ["batch_stats"]
        out = ensemble_model.apply(
            variables,
            sources,
            mixture,
            monaural_variables=monaural_variables,
            train=train,
            rngs=rngs,
            mutable=mutable,
        )
        if mutable:
            (strong, weak), upd = out
            return strong, weak, upd.get("batch_stats", stats)
        strong, weak = out
        return strong, weak, stats

    def train_step(state: MeanTeacherState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        k_sd, k_sa, k_td, k_ta = jax.random.split(rng, 4)
        audio, labels, _, _ = _concat_batch(cfg, batch)
        sources, mixture = featurize(audio, state.scaler)
        labels_weak = (labels[wa:wb].sum(-1) > 0).astype(jnp.float32)

        t_strong, t_weak, new_t_stats = forward(
            state.teacher_params, state.teacher_stats, sources, mixture,
            {"dropout": k_td, "augment": k_ta}, True,
        )
        weight = cfg.const_max * schedule.scaling_factor(state.step)

        def loss_fn(params):
            s_strong, s_weak, new_s_stats = forward(
                params, state.student_stats, sources, mixture,
                {"dropout": k_sd, "augment": k_sa}, True,
            )
            loss_strong = bce(s_strong[sa:sb], labels[sa:sb])
            loss_weak = bce(s_weak[wa:wb], labels_weak)
            strong_self = selfsup(
                s_strong[ca:cb], jax.lax.stop_gradient(t_strong[ca:cb])
            )
            weak_self = selfsup(s_weak[ca:cb], jax.lax.stop_gradient(t_weak[ca:cb]))
            total = loss_strong + loss_weak + (strong_self + weak_self) * weight
            return total, {
                "loss_strong": loss_strong,
                "loss_weak": loss_weak,
                "tot_self_loss": (strong_self + weak_self) * weight,
                "new_stats": new_s_stats,
            }

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student_params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.student_params)
        new_student = optax.apply_updates(state.student_params, updates)
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
            student_stats=aux["new_stats"],
            teacher_stats=new_t_stats,
            opt_state=new_opt,
        )
        metrics = {k: v for k, v in aux.items() if k != "new_stats"}
        metrics["loss"] = total
        metrics["lr"] = schedule(state.step)
        return new_state, metrics

    return train_step


def create_sepsed_state(
    ensemble_model,
    monaural_variables,
    cfg: MeanTeacherConfig,
    optimizer,
    rng: jax.Array,
    sample_batch: dict,
    mel_cfg: MelConfig = MelConfig(),
    scaler=None,
) -> MeanTeacherState:
    audio, *_ = _concat_batch(cfg, sample_batch)
    b, n_src, n = audio.shape
    src_mel = mel_spectrogram(audio.reshape(b * n_src, n), mel_cfg)
    src_mel = src_mel.reshape(b, n_src, *src_mel.shape[1:])
    mix = src_mel.sum(1)
    kp, kd, ka = jax.random.split(rng, 3)
    variables = ensemble_model.init(
        {"params": kp, "dropout": kd, "augment": ka},
        amplitude_to_db(src_mel, mel_cfg),
        amplitude_to_db(mix, mel_cfg),
        monaural_variables=monaural_variables,
        train=True,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
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
