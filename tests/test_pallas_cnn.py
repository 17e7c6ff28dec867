"""Fused conv-block Pallas kernels vs a naive JAX reference (interpret mode).

Covers every block geometry of the 2024 CRNN (F x Ci x Co x pool), forward
and gradients, train (batch stats + dropout) and eval."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desed_task_tpu.ops.pallas_cnn import BlockDims, fused_glu_block


def naive_block(x, w, bias, gamma, beta, ra_mean, ra_var, wg, bg,
                pool, train, eps=1e-3, momentum=0.01, keep_mask=None):
    """Reference chain: conv3x3 SAME + BatchNorm(flax semantics) + GLU +
    (given mask) dropout + floor avgpool."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    if train:
        mean = y.mean((0, 1, 2))
        var = (y * y).mean((0, 1, 2)) - mean * mean
        new_mean = momentum * ra_mean + (1 - momentum) * mean
        new_var = momentum * ra_var + (1 - momentum) * var
    else:
        mean, var = ra_mean, ra_var
        new_mean, new_var = ra_mean, ra_var
    ybn = (y - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    z = (ybn @ wg + bg) * jax.nn.sigmoid(ybn)
    if keep_mask is not None:
        keep_prob = keep_mask[1]
        z = jnp.where(keep_mask[0], z / keep_prob, 0.0)
    pt, pf = pool
    B, T, F, C = z.shape
    z = z[:, : (T // pt) * pt, : (F // pf) * pf]
    z = z.reshape(B, T // pt, pt, F // pf, pf, C).mean((2, 4))
    return z, new_mean, new_var


GEOMS = [
    # (B, T, F, Ci, Co, pool) — the seven 2024 blocks at reduced B/T
    (3, 38, 128, 1, 16, (2, 2)),
    (3, 19, 64, 16, 32, (2, 2)),
    (3, 12, 32, 32, 64, (1, 2)),
    (3, 12, 16, 64, 128, (1, 2)),
    (3, 12, 8, 128, 128, (1, 2)),
    (3, 12, 4, 128, 128, (1, 2)),
    (3, 12, 2, 128, 128, (1, 2)),
]


def _inputs(B, T, F, Ci, Co, seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((B, T, F, Ci)), jnp.float32)
    w = jnp.asarray(r.standard_normal((3, 3, Ci, Co)) * 0.2, jnp.float32)
    bias = jnp.asarray(r.standard_normal((Co,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * r.standard_normal((Co,)), jnp.float32)
    beta = jnp.asarray(0.1 * r.standard_normal((Co,)), jnp.float32)
    ra_m = jnp.asarray(0.05 * r.standard_normal((Co,)), jnp.float32)
    ra_v = jnp.asarray(1.0 + 0.1 * r.random((Co,)), jnp.float32)
    wg = jnp.asarray(r.standard_normal((Co, Co)) * 0.2, jnp.float32)
    bg = jnp.asarray(r.standard_normal((Co,)) * 0.1, jnp.float32)
    return x, w, bias, gamma, beta, ra_m, ra_v, wg, bg


@pytest.mark.parametrize("geom", GEOMS)
@pytest.mark.parametrize("train", [True, False])
def test_fused_block_forward(geom, train):
    B, T, F, Ci, Co, pool = geom
    args = _inputs(B, T, F, Ci, Co)
    z, m, v = fused_glu_block(
        *args, pool=pool, train=train, dropout_rate=0.0,
        interpret=True,
    )
    z_ref, m_ref, v_ref = naive_block(*args, pool=pool, train=train)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("geom", [GEOMS[0], GEOMS[1], GEOMS[4]])
def test_fused_block_gradients(geom):
    B, T, F, Ci, Co, pool = geom
    args = _inputs(B, T, F, Ci, Co, seed=1)

    def loss_fused(x, w, bias, gamma, beta, wg, bg):
        z, _, _ = fused_glu_block(
            x, w, bias, gamma, beta, args[5], args[6], wg, bg,
            pool=pool, train=True, dropout_rate=0.0, interpret=True,
        )
        return jnp.sum(z * z)

    def loss_ref(x, w, bias, gamma, beta, wg, bg):
        z, _, _ = naive_block(
            x, w, bias, gamma, beta, args[5], args[6], wg, bg,
            pool=pool, train=True,
        )
        return jnp.sum(z * z)

    diff_args = (args[0], args[1], args[2], args[3], args[4], args[7], args[8])
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*diff_args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*diff_args)
    names = ["x", "w", "bias", "gamma", "beta", "wg", "bg"]
    for name, a, b in zip(names, g_fused, g_ref):
        # conv bias grad is ~0 in exact arithmetic (BatchNorm cancels the
        # bias), so it is pure cancellation noise — absolute tolerance only
        atol = 2e-3 if name == "bias" else 5e-4
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=atol,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_block_dropout_semantics():
    B, T, F, Ci, Co, pool = GEOMS[1]
    args = _inputs(B, T, F, Ci, Co, seed=2)
    key = jax.random.key(3)
    z, _, _ = fused_glu_block(
        *args, pool=pool, train=True, dropout_rate=0.5, dropout_key=key,
        interpret=True,
    )
    # deterministic per key
    z2, _, _ = fused_glu_block(
        *args, pool=pool, train=True, dropout_rate=0.5, dropout_key=key,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    # matches the reference chain given the same mask (PackedDropout bits)
    dims = BlockDims(B, T, F, Ci, Co, *pool)
    bits = jax.random.bits(key, (B, dims.Tp, dims.Lout), jnp.uint8)
    mask4 = (bits < 128)[:, :T].reshape(B, T, F, Co)
    z_ref, _, _ = naive_block(*args, pool=pool, train=True,
                              keep_mask=(mask4, 0.5))
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=2e-4, atol=2e-5)
    # gradient flows through the same mask
    g = jax.grad(lambda x: jnp.sum(fused_glu_block(
        x, *args[1:], pool=pool, train=True, dropout_rate=0.5,
        dropout_key=key, interpret=True,
    )[0] ** 2))(args[0])
    assert np.isfinite(np.asarray(g)).all()


def test_fused_block_bf16_close():
    B, T, F, Ci, Co, pool = GEOMS[1]
    args = _inputs(B, T, F, Ci, Co, seed=4)
    args_bf = (args[0].astype(jnp.bfloat16),) + args[1:]
    z, m, v = fused_glu_block(
        *args_bf, pool=pool, train=True, dropout_rate=0.0, interpret=True,
    )
    z_ref, m_ref, v_ref = naive_block(*args, pool=pool, train=True)
    assert z.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(z, np.float32), np.asarray(z_ref),
                               rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=0.05, atol=0.01)


def _cnn(fused, dropout=0.0):
    from desed_task_tpu.models.cnn import CNN

    return CNN(
        n_in_channel=1,
        activation="glu",
        conv_dropout=dropout,
        kernel_size=[3, 3, 3],
        padding=[1, 1, 1],
        stride=[1, 1, 1],
        nb_filters=[16, 32, 64],
        pooling=[[2, 2], [2, 2], [1, 2]],
        fused_blocks=fused,
    )


def test_cnn_fused_param_tree_matches_unfused():
    x = jnp.zeros((2, 44, 64, 1), jnp.float32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v_ref = _cnn(False).init(rngs, x, train=True)
    v_fused = _cnn("interpret").init(rngs, x, train=True)
    ref_tree = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v_ref)
    fused_tree = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v_fused)
    assert ref_tree == fused_tree  # checkpoint-compatible


@pytest.mark.parametrize("train", [False, True])
def test_cnn_fused_matches_unfused(train):
    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((2, 44, 64, 1)), jnp.float32)
    rngs = {"params": jax.random.key(0)}
    ref = _cnn(False)
    fused = _cnn("interpret")
    v = ref.init(rngs, x, train=False)

    def run(model):
        if train:
            out, upd = model.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2)},
            )
            return out, upd["batch_stats"]
        return model.apply(v, x, train=False), None

    z_ref, bs_ref = run(ref)
    z_fused, bs_fused = run(fused)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_ref),
                               rtol=3e-4, atol=3e-5)
    if train:
        ref_leaves = {
            jax.tree_util.keystr(k): a
            for k, a in jax.tree_util.tree_leaves_with_path(bs_ref)
        }
        fused_leaves = {
            jax.tree_util.keystr(k): a
            for k, a in jax.tree_util.tree_leaves_with_path(bs_fused)
        }
        assert ref_leaves.keys() == fused_leaves.keys()
        for k in ref_leaves:
            np.testing.assert_allclose(
                np.asarray(fused_leaves[k]), np.asarray(ref_leaves[k]),
                rtol=2e-4, atol=1e-5, err_msg=k,
            )


@pytest.mark.parametrize("geom", [GEOMS[0], GEOMS[1], GEOMS[4]])
@pytest.mark.parametrize("train", [True, False])
def test_fused_block_fpool_in_kernel_forward(geom, train):
    """In-kernel F-pool (lane-averaging matmul in kernel B) == XLA F-pool."""
    B, T, F, Ci, Co, pool = geom
    args = _inputs(B, T, F, Ci, Co, seed=7)
    z, m, v = fused_glu_block(
        *args, pool=pool, train=train, dropout_rate=0.0,
        interpret=True, fpool_in_kernel=True,
    )
    z_ref, m_ref, v_ref = naive_block(*args, pool=pool, train=train)
    assert z.shape == z_ref.shape
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-4, atol=1e-5)


def test_fused_block_fpool_in_kernel_gradients():
    B, T, F, Ci, Co, pool = GEOMS[1]
    args = _inputs(B, T, F, Ci, Co, seed=8)

    def loss(fpool):
        def fn(x, w, bias, gamma, beta, wg, bg):
            z, _, _ = fused_glu_block(
                x, w, bias, gamma, beta, args[5], args[6], wg, bg,
                pool=pool, train=True, dropout_rate=0.0, interpret=True,
                fpool_in_kernel=fpool,
            )
            return jnp.sum(z * z)
        return fn

    diff_args = (args[0], args[1], args[2], args[3], args[4], args[7], args[8])
    g_q = jax.grad(loss(True), argnums=tuple(range(7)))(*diff_args)
    g_x = jax.grad(loss(False), argnums=tuple(range(7)))(*diff_args)
    for name, a, b in zip(["x", "w", "bias", "gamma", "beta", "wg", "bg"],
                          g_q, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-3,
            err_msg=f"fpool grad mismatch for {name}",
        )
