"""MixIT: mixture-invariant training for unsupervised separation.

The reference only CONSUMES a MixIT-trained separator (frozen TF1 checkpoint,
recipes/dcase2021_task4_baseline/local/apply_separation_model.py); this
module makes the objective itself available so the TDCN++ in models/tdcn.py
can train on unlabeled audio in-framework.

MixIT (Wisdom et al. 2020): feed the model a mixture of two mixtures
x = x1 + x2; it estimates M sources s_1..s_M; the loss is the best (minimum)
over all 2^M binary assignments A in {0,1}^{2 x M} with exactly one '1' per
column of  sum_i loss(x_i, [A s]_i).  The assignment enumeration is a static
[2^M, 2, M] tensor contracted on-device — no data-dependent control flow, so
the whole objective jits onto the TPU.

Loss: negative thresholded SNR (the MixIT paper's, tau = 10^(-snr_max/10)):
  -10 log10( ||t||^2 / (||t - e||^2 + tau ||t||^2) ).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _assignments(n_src: int) -> np.ndarray:
    """[2^M, 2, M] one-hot-per-column binary assignment matrices."""
    combos = []
    for bits in range(2 ** n_src):
        a = np.zeros((2, n_src), np.float32)
        for m in range(n_src):
            a[(bits >> m) & 1, m] = 1.0
        combos.append(a)
    return np.stack(combos)


def neg_thresholded_snr(target, est, snr_max: float = 30.0):
    """[-10 log10(||t||^2 / (||t-e||^2 + tau||t||^2))], summed over last axis.

    Returns per-example values: target/est [..., N] -> [...]."""
    tau = 10.0 ** (-snr_max / 10.0)
    t2 = jnp.sum(target * target, -1)
    err = jnp.sum((target - est) ** 2, -1)
    return -10.0 * jnp.log10(t2 / (err + tau * t2 + 1e-12) + 1e-12)


def mixit_loss(est_sources: jnp.ndarray, mixtures: jnp.ndarray,
               snr_max: float = 30.0):
    """est_sources [B, M, N], mixtures [B, 2, N] -> scalar loss.

    Also returns the per-example best assignment index (for diagnostics)."""
    A = jnp.asarray(_assignments(est_sources.shape[1]))  # [K, 2, M]
    # remixes under every assignment: [B, K, 2, N]
    remix = jnp.einsum("kam,bmn->bkan", A, est_sources)
    per = neg_thresholded_snr(mixtures[:, None], remix, snr_max)  # [B, K, 2]
    per_assignment = per.sum(-1)  # [B, K]
    best = jnp.min(per_assignment, axis=1)
    idx = jnp.argmin(per_assignment, axis=1)
    return best.mean(), idx


def mixture_of_mixtures(audio: jnp.ndarray):
    """[2B, N] batch of mixtures -> (moms [B, N], pairs [B, 2, N])."""
    B2, N = audio.shape
    assert B2 % 2 == 0, "need an even batch to form mixtures of mixtures"
    pairs = audio.reshape(B2 // 2, 2, N)
    return pairs.sum(1), pairs
