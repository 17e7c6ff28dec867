"""Device-side augmentation op tests (semantics of data_augm.py + TimeMasking)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.ops.augment import add_noise, frame_shift, mixup, specaugment, time_mask


def test_mixup_soft_semantics(rng):
    x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    t = jnp.asarray((rng.random((8, 3)) > 0.5).astype(np.float32))
    mixed, mixed_t, (perm, c) = mixup(jax.random.key(0), x, t, mixup_label_type="soft")
    c = float(c)
    np.testing.assert_allclose(
        np.asarray(mixed), c * np.asarray(x) + (1 - c) * np.asarray(x)[np.asarray(perm)],
        rtol=1e-5,
    )
    assert np.asarray(mixed_t).max() <= 1.0 and np.asarray(mixed_t).min() >= 0.0
    # hard mode: union of labels
    _, hard_t, (perm2, _) = mixup(jax.random.key(1), x, t, mixup_label_type="hard")
    expected = np.clip(np.asarray(t) + np.asarray(t)[np.asarray(perm2)], 0, 1)
    np.testing.assert_array_equal(np.asarray(hard_t), expected)


def test_mixup_shared_draw(rng):
    """Passing (perm, c) reuses the same mixing for a second tensor."""
    x = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((6, 2)).astype(np.float32))
    mixed_x, (perm, c) = mixup(jax.random.key(0), x)
    mixed_e, _ = mixup(jax.random.key(99), e, perm=perm, c=c)
    np.testing.assert_allclose(
        np.asarray(mixed_e),
        float(c) * np.asarray(e) + (1 - float(c)) * np.asarray(e)[np.asarray(perm)],
        rtol=1e-5,
    )


def test_frame_shift_rolls_features_and_labels(rng):
    mels = jnp.asarray(rng.standard_normal((4, 8, 64)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((4, 3, 16)).astype(np.float32))
    out_m, out_l = frame_shift(jax.random.key(0), mels, labels, net_pooling=4)
    assert out_m.shape == mels.shape and out_l.shape == labels.shape
    # rolling preserves content per example
    np.testing.assert_allclose(
        np.sort(np.asarray(out_m), axis=-1), np.sort(np.asarray(mels), axis=-1), rtol=1e-6
    )


def test_add_noise_snr_scaling(rng):
    mels = jnp.asarray(np.abs(rng.standard_normal((16, 8, 100))).astype(np.float32))
    noisy = add_noise(jax.random.key(0), mels, snrs=(30.0, 30.0))
    # at 30 dB SNR the perturbation is ~3% of signal std
    err = np.asarray(noisy - mels)
    ratio = err.std() / np.asarray(mels).std(axis=(1, 2)).mean()
    assert 0.01 < ratio < 0.08
    noisy_loud = add_noise(jax.random.key(0), mels, snrs=(6.0, 6.0))
    assert np.asarray(noisy_loud - mels).std() > err.std()


def test_time_mask_length_bounds(rng):
    x = jnp.ones((32, 5, 100))
    out = np.asarray(time_mask(jax.random.key(0), x, mask_param=20, p=1.0, axis=2))
    masked = (out == 0).sum(axis=2)
    assert masked.max() <= 20 * 1.001
    # p caps the masked proportion
    out2 = np.asarray(time_mask(jax.random.key(1), x, mask_param=80, p=0.1, axis=2))
    assert (out2 == 0).sum(axis=2).max() <= 10
    # p=0 disables masking entirely (the 2024 conf sets specaugm_*_p: 0.0)
    out3 = np.asarray(time_mask(jax.random.key(2), x, mask_param=20, p=0.0, axis=2))
    assert (out3 == 1).all()


def test_specaugment_masks_both_axes(rng):
    x = jnp.ones((16, 64, 100))
    out = np.asarray(specaugment(jax.random.key(0), x, t_l=10, t_p=1.0, f_l=8, f_p=1.0))
    # some full-frequency rows and full-time columns zeroed
    assert (out == 0).any()
    assert out.shape == x.shape


def test_time_mask_shared_is_one_batch_mask(rng):
    """PARITY #8: shared=True reproduces torchaudio's 3-D fallback — every
    example in the batch gets the IDENTICAL mask (nnet/CRNN.py:207-219)."""
    x = jnp.ones((32, 5, 100))
    out = np.asarray(
        time_mask(jax.random.key(0), x, mask_param=20, p=1.0, axis=2, shared=True)
    )
    cols = out[:, 0, :] == 0  # [B, T] masked columns
    assert cols.any()  # a mask was drawn
    assert (cols == cols[0]).all()  # identical across the batch
    assert cols.sum(axis=1).max() <= 20 * 1.001
    # per-example (default) draws differing masks with overwhelming probability
    out_iid = np.asarray(
        time_mask(jax.random.key(0), x, mask_param=20, p=1.0, axis=2)
    )
    cols_iid = out_iid[:, 0, :] == 0
    assert not (cols_iid == cols_iid[0]).all()
