"""Pallas BiGRU recurrence kernel vs the lax.scan path (interpret mode on
CPU): forward equality and full gradient equality (inputs, recurrent
weights, biases) through the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.models.rnn import _bigru_fused_scan
from desed_task_tpu.ops import pallas_gru


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pallas_gru.INTERPRET
    pallas_gru.INTERPRET = True
    yield
    pallas_gru.INTERPRET = old


def _setup(B=3, T=5, H=8, in_dim=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    wi_f = rng.standard_normal((3 * H, in_dim)).astype(np.float32) * 0.3
    wi_b = rng.standard_normal((3 * H, in_dim)).astype(np.float32) * 0.3
    wh_f = rng.standard_normal((3 * H, H)).astype(np.float32) * 0.3
    wh_b = rng.standard_normal((3 * H, H)).astype(np.float32) * 0.3
    bi_f = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    bi_b = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    bh_f = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    bh_b = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    return map(jnp.asarray, (x, wi_f, wi_b, wh_f, wh_b, bi_f, bi_b, bh_f, bh_b))


def _scan_path(x, wi_f, wi_b, wh_f, wh_b, bi_f, bi_b, bh_f, bh_b):
    xg_f = x @ wi_f.T + bi_f
    xg_b = x @ wi_b.T + bi_b
    fwd, bwd = _bigru_fused_scan(x, wh_f, bh_f, wh_b, bh_b, xg_f, xg_b)
    return jnp.concatenate([fwd, bwd], -1)


def _pallas_path(x, wi_f, wi_b, wh_f, wh_b, bi_f, bi_b, bh_f, bh_b):
    xg_f = x @ wi_f.T + bi_f
    xg_b = x @ wi_b.T + bi_b
    fwd, bwd = pallas_gru.bigru_pallas(xg_f, xg_b, wh_f, bh_f, wh_b, bh_b)
    return jnp.concatenate([fwd, bwd], -1)


def test_forward_matches_scan():
    args = tuple(_setup())
    out_scan = _scan_path(*args)
    out_pl = _pallas_path(*args)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_scan), atol=2e-6, rtol=0
    )


def test_gradients_match_scan():
    args = tuple(_setup(B=2, T=4, H=8, in_dim=5, seed=3))

    def loss(path, *a):
        out = path(*a)
        # non-uniform weighting exercises per-step cotangents
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * jnp.sin(w))

    g_scan = jax.grad(lambda *a: loss(_scan_path, *a), argnums=tuple(range(9)))(*args)
    g_pl = jax.grad(lambda *a: loss(_pallas_path, *a), argnums=tuple(range(9)))(*args)
    names = ["x", "wi_f", "wi_b", "wh_f", "wh_b", "bi_f", "bi_b", "bh_f", "bh_b"]
    for name, a, b in zip(names, g_scan, g_pl):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4, err_msg=name
        )


def test_module_backend_equivalence():
    """BidirectionalGRU with pallas_recurrence='interpret-forced' equals the
    scan backend on the same params."""
    from desed_task_tpu.models.rnn import BidirectionalGRU

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 6, 10)).astype(np.float32))
    mod_scan = BidirectionalGRU(hidden=8, num_layers=2, pallas_recurrence=False)
    variables = mod_scan.init(jax.random.key(0), x)
    out_scan = mod_scan.apply(variables, x)
    mod_pl = BidirectionalGRU(hidden=8, num_layers=2, pallas_recurrence=True)
    out_pl = mod_pl.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_scan), atol=2e-6, rtol=0
    )
