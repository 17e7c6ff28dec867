"""Device-side, jittable data augmentations keyed by JAX PRNG.

Re-designs desed_task/data_augm.py (mixup :19, frame_shift :7, add_noise :56)
and the torchaudio TimeMasking used for SpecAugment / dropstep
(nnet/CRNN.py:207-219, 288-301) as pure functions that live INSIDE the jit
training graph (BASELINE.json north star: augmentation on device), instead of
host-side per-example Python loops.

Randomness semantics note (SURVEY.md §7.3): distributions match the reference
(Beta(0.2,0.2) mixup coefficient shared across the batch, per-example
Gauss(0, 90) frame shift, uniform SNR 6-30 dB noise, uniform mask lengths);
bit-identical torch RNG streams are explicitly not a goal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup(
    rng: jax.Array,
    data: jnp.ndarray,
    target: jnp.ndarray | None = None,
    alpha: float = 0.2,
    beta: float = 0.2,
    mixup_label_type: str = "soft",
    perm: jnp.ndarray | None = None,
    c: jnp.ndarray | None = None,
):
    """Batch mixup with one shared Beta coefficient, like the reference.

    Pass `perm`/`c` to reuse the same mixing across multiple tensors of the
    same batch (the reference mixes features and embeddings with one draw,
    sed_trainer_pretrained.py:282-301 — it re-draws for embeddings; we share,
    which is the stated intent "apply mixup also on embeddings").
    """
    k1, k2 = jax.random.split(rng)
    if c is None:
        c = jax.random.beta(k1, alpha, beta)
    if perm is None:
        perm = jax.random.permutation(k2, data.shape[0])
    mixed = c * data + (1.0 - c) * data[perm]
    if target is None:
        return mixed, (perm, c)
    if mixup_label_type == "soft":
        mixed_t = jnp.clip(c * target + (1.0 - c) * target[perm], 0.0, 1.0)
    elif mixup_label_type == "hard":
        mixed_t = jnp.clip(target + target[perm], 0.0, 1.0)
    else:
        raise NotImplementedError(f"mixup_label_type {mixup_label_type!r}")
    return mixed, mixed_t, (perm, c)


def frame_shift(
    rng: jax.Array,
    mels: jnp.ndarray,  # [B, n_mels, T]
    labels: jnp.ndarray,  # [B, T_lab, C] or [B, C, T_lab]; rolled on `label_axis`
    net_pooling: int = 4,
    std: float = 90.0,
    label_axis: int = -1,
):
    """Per-example circular time shift of features and (pooled) labels.

    Matches data_augm.frame_shift: shift ~ round(Gauss(0, 90)) frames on mels;
    labels shift by shift//net_pooling (toward zero for negative shifts).
    """
    b = mels.shape[0]
    shifts = jnp.round(jax.random.normal(rng, (b,)) * std).astype(jnp.int32)
    # reference: -abs(shift)//net_pooling if shift<0 else shift//net_pooling
    lab_shifts = jnp.where(
        shifts < 0, -(jnp.abs(shifts) // net_pooling), shifts // net_pooling
    )
    rolled_mels = jax.vmap(lambda x, s: jnp.roll(x, s, axis=-1))(mels, shifts)
    rolled_labels = jax.vmap(
        lambda y, s: jnp.roll(y, s, axis=label_axis)
    )(labels, lab_shifts)
    return rolled_mels, rolled_labels


def add_noise(
    rng: jax.Array,
    mels: jnp.ndarray,
    snrs: tuple[float, float] = (6.0, 30.0),
    dims: tuple[int, ...] = (1, 2),
):
    """White noise at a per-example uniform SNR (dB) vs feature std."""
    k1, k2 = jax.random.split(rng)
    b = mels.shape[0]
    shape = [b] + [1] * (mels.ndim - 1)
    snr_db = (snrs[0] - snrs[1]) * jax.random.uniform(k1, shape) + snrs[1]
    snr = 10.0 ** (snr_db / 20.0)
    # torch.std is unbiased (ddof=1)
    n = 1
    for d in dims:
        n *= mels.shape[d]
    mu = jnp.mean(mels, axis=dims, keepdims=True)
    sigma_feat = jnp.sqrt(jnp.sum((mels - mu) ** 2, axis=dims, keepdims=True) / max(n - 1, 1))
    sigma = sigma_feat / snr
    return mels + jax.random.normal(k2, mels.shape) * sigma


def time_mask(
    rng: jax.Array,
    x: jnp.ndarray,
    mask_param: int,
    p: float = 1.0,
    axis: int = -1,
    mask_value: float = 0.0,
    shared: bool = False,
):
    """torchaudio TimeMasking(iid_masks=True) semantics on an arbitrary axis.

    Per example: mask length ~ U[0, mask_param') where mask_param' =
    min(mask_param, floor(axis_len * p)) when p < 1; start ~ U[0, len - l).
    Used for SpecAugment (both axes) and recurrent dropstep.

    `shared=True` reproduces the reference's ACTUAL behavior (PARITY #8):
    torchaudio only applies iid masks to 4-D input, and CRNN.apply_specaugment
    (nnet/CRNN.py:207-219) feeds it 3-D, so ONE mask is drawn and shared by
    the whole batch. Default stays per-example (strictly more augmentation
    diversity); the flag exists for controlled divergence-attribution A/Bs.
    """
    axis = axis % x.ndim
    length = x.shape[axis]
    eff = mask_param if p >= 1.0 else min(mask_param, int(length * p))
    if eff <= 0:
        return x
    b = 1 if shared else x.shape[0]
    k1, k2 = jax.random.split(rng)
    val = jax.random.uniform(k1, (b,)) * eff  # mask length (float, like torch)
    start = jax.random.uniform(k2, (b,)) * (length - val)
    idx = jnp.arange(length, dtype=jnp.float32)
    # broadcast [B, length] mask to the target axis
    mask = (idx[None, :] >= start[:, None]) & (idx[None, :] < (start + val)[:, None])
    shape = [1] * x.ndim
    shape[0] = b
    shape[axis] = length
    mask = mask.reshape(shape)
    return jnp.where(mask, mask_value, x)


def specaugment(
    rng: jax.Array,
    x: jnp.ndarray,  # [B, n_mels, T]
    t_l: int,
    t_p: float,
    f_l: int,
    f_p: float,
    shared: bool = False,
):
    """SpecAugment as in CRNN.apply_specaugment (CRNN.py:207-219): a frequency
    mask then a time mask, each with torchaudio TimeMasking semantics.
    `shared=True` mirrors the reference's one-mask-per-batch quirk (PARITY #8,
    see time_mask)."""
    k1, k2 = jax.random.split(rng)
    x = time_mask(k1, x, f_l, f_p, axis=1, shared=shared)  # frequency axis
    x = time_mask(k2, x, t_l, t_p, axis=2, shared=shared)  # time axis
    return x
