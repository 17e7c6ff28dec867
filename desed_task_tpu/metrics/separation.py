"""Separation-quality metrics: SI-SNR and MixIT-style SI-SNR improvement.

The reference consumes a pretrained MixIT separator but never measures
separation quality (recipes/dcase2021_task4_baseline/local/
apply_separation_model.py writes the sources and moves on). These metrics
close that gap for the in-framework TDCN++ (models/tdcn.py): given synthetic
two-source mixtures with known ground truth, score the separator by the best
assignment of its M estimates into the 2 reference sources — the evaluation
protocol of the MixIT paper (Wisdom et al. 2020, "What's all the FUSS?").

Everything is jax.numpy on static shapes, so the whole evaluation jits.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..training.mixit import _assignments

_EPS = 1e-8


def si_snr(target: jnp.ndarray, estimate: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis.

    Both inputs are mean-removed; the estimate is projected onto the target
    so any rescaling of the estimate leaves the value unchanged.
    target/estimate [..., N] -> [...].
    """
    t = target - jnp.mean(target, -1, keepdims=True)
    e = estimate - jnp.mean(estimate, -1, keepdims=True)
    # optimal scaling of t explaining e: s_target = <e, t> t / ||t||^2
    dot = jnp.sum(e * t, -1, keepdims=True)
    t_energy = jnp.sum(t * t, -1, keepdims=True)
    s_target = dot * t / (t_energy + _EPS)
    noise = e - s_target
    ratio = jnp.sum(s_target**2, -1) / (jnp.sum(noise**2, -1) + _EPS)
    return 10.0 * jnp.log10(ratio + _EPS)


def best_assignment_si_snr(
    sources: jnp.ndarray, estimates: jnp.ndarray
) -> jnp.ndarray:
    """Best mean SI-SNR over assignments of M estimates into 2 groups.

    sources [B, 2, N] (ground-truth pair), estimates [B, M, N]. Each of the
    2^M one-hot-per-column assignment matrices (training/mixit.py
    _assignments) remixes the estimates into two signals; returns the best
    assignment's mean-over-pair SI-SNR, shape [B].
    """
    A = jnp.asarray(_assignments(estimates.shape[1]))  # [K, 2, M]
    remix = jnp.einsum("kam,bmn->bkan", A, estimates)  # [B, K, 2, N]
    per = si_snr(sources[:, None], remix)  # [B, K, 2]
    return jnp.max(per.mean(-1), axis=1)


def si_snr_improvement(
    sources: jnp.ndarray, estimates: jnp.ndarray, mixture: jnp.ndarray
) -> jnp.ndarray:
    """SI-SNRi [B]: best-assignment SI-SNR minus the no-processing baseline
    (the mixture itself scored against each reference source)."""
    baseline = si_snr(sources, mixture[:, None]).mean(-1)  # [B]
    return best_assignment_si_snr(sources, estimates) - baseline
