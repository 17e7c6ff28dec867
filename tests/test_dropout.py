"""Packed-bits dropout: statistics, scaling, determinism, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from desed_task_tpu.ops.dropout import PackedDropout, packed_keep_mask


def test_keep_rate_statistics():
    # rate 0.5 is exactly representable at 8 bits: keep fraction ~ Binomial
    key = jax.random.key(0)
    mask = packed_keep_mask(key, (512, 517), 0.5)  # odd size: exercises pad
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    n = 512 * 517
    assert abs(frac - 0.5) < 5.0 / np.sqrt(n)  # 5 sigma


def test_planes_are_independent():
    # elements sharing a word (plane-major layout: i and i + n_words) must
    # not be correlated
    n_words = 1000
    mask = packed_keep_mask(jax.random.key(3), (4 * n_words,), 0.5)
    m = np.asarray(mask).reshape(4, n_words).astype(np.float64)
    for a in range(4):
        for b in range(a + 1, 4):
            corr = np.corrcoef(m[a], m[b])[0, 1]
            assert abs(corr) < 0.16, (a, b, corr)


def test_module_scaling_and_eval():
    x = jnp.ones((64, 128), jnp.float32)
    mod = PackedDropout(0.5)
    y = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    vals = np.unique(np.asarray(y))
    assert set(vals.tolist()) <= {0.0, 2.0}  # kept elements scaled by 2
    y_eval = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))


def test_deterministic_per_key_and_grad_uses_same_mask():
    x = jnp.ones((33, 65), jnp.float32)
    mod = PackedDropout(0.5)
    rngs = {"dropout": jax.random.key(7)}
    y1 = mod.apply({}, x, deterministic=False, rngs=rngs)
    y2 = mod.apply({}, x, deterministic=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # d/dx sum(dropout(x)) == the mask * scale itself
    g = jax.grad(lambda x: mod.apply({}, x, deterministic=False, rngs=rngs).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(y1))


def test_quantized_rate_within_half_ulp():
    # rate 0.3 -> threshold round(0.7*256)=179 -> keep 179/256 = 0.69921875
    mask = packed_keep_mask(jax.random.key(11), (2048, 512), 0.7)
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    assert abs(frac - 179 / 256) < 5.0 / np.sqrt(2048 * 512)


def test_bf16_dtype_preserved():
    x = jnp.ones((16, 256), jnp.bfloat16)
    y = PackedDropout(0.5).apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert y.dtype == jnp.bfloat16


def test_unset_deterministic_raises_like_nn_dropout():
    import pytest

    x = jnp.ones((4, 4), jnp.float32)
    with pytest.raises(ValueError):
        PackedDropout(0.5).apply({}, x, rngs={"dropout": jax.random.key(0)})
