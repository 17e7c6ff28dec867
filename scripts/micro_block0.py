#!/usr/bin/env python
"""Op-level microbenchmark of CNN block 0/1 (v5e): which op eats the time,
and does an F-minor / folded layout fix it? Dev tool."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_default_prng_impl", "unsafe_rbg")

import jax.numpy as jnp  # noqa: E402

B, T, F, C = 60, 626, 128, 16


def timeit(fn, *args, n=20, rounds=3):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best.append((time.perf_counter() - t0) / n)
    return float(np.median(best)) * 1e3


def main():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((B, T, F, 1)), jnp.bfloat16)  # conv in
    y = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.bfloat16)  # conv out
    yf = y.reshape(B, T, F * C)  # folded view
    yt = jnp.asarray(rng.standard_normal((B, T, C, F)), jnp.bfloat16)  # F-minor
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.1, jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.bfloat16)
    beta = jnp.zeros((C,), jnp.bfloat16)
    gam_f = jnp.tile(gamma, F)
    bet_f = jnp.tile(beta, F)
    key = jax.random.key(0)

    tests = {}

    tests["conv0 NHWC"] = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))), (x1,)

    # conv0 in F-minor layout: spatial dims (T, F), feature at axis 2
    x1t = x1[..., 0][:, :, None, :]  # [B, T, 1, F]
    tests["conv0 NHCW"] = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHCW", "HWIO", "NHCW"))), (x1t,)

    # BN train-style stats + apply (C minor vs folded)
    def bn_c(y):
        m = jnp.mean(y.astype(jnp.float32), (0, 1, 2))
        v = jnp.mean(jnp.square(y.astype(jnp.float32)), (0, 1, 2)) - m * m
        return ((y - m.astype(y.dtype)) * jax.lax.rsqrt(v + 1e-3).astype(y.dtype)
                * gamma + beta)

    def bn_folded(yf):
        s = jnp.mean(yf.astype(jnp.float32), (0, 1)).reshape(F, C).mean(0)
        q = jnp.mean(jnp.square(yf.astype(jnp.float32)), (0, 1)).reshape(F, C).mean(0)
        v = q - s * s
        scale = (jax.lax.rsqrt(v + 1e-3) * gamma.astype(jnp.float32))
        scale_f = jnp.tile(scale.astype(yf.dtype), F)
        bias_f = jnp.tile((beta.astype(jnp.float32) - s * scale).astype(yf.dtype), F)
        return yf * scale_f + bias_f

    tests["bn C-minor"] = jax.jit(bn_c), (y,)
    tests["bn folded"] = jax.jit(bn_folded), (yf,)

    # GLU dense (C minor vs F minor einsum)
    tests["glu C-minor"] = jax.jit(
        lambda y: (y @ wg) * jax.nn.sigmoid(y)), (y,)
    tests["glu F-minor"] = jax.jit(
        lambda yt: jnp.einsum("btcf,cd->btdf", yt, wg) * jax.nn.sigmoid(yt)), (yt,)

    # dropout (uint8) on C-minor vs folded
    def drop(z):
        bits = jax.random.bits(key, z.shape, jnp.uint8)
        return jnp.where(bits < 128, z * 2.0, jnp.zeros((), z.dtype))
    tests["drop C-minor"] = jax.jit(drop), (y,)
    tests["drop folded"] = jax.jit(drop), (yf,)

    # avgpool 2x2 (C minor) vs folded-equivalent
    tests["pool C-minor"] = jax.jit(lambda y: jax.lax.reduce_window(
        y, jnp.zeros((), y.dtype), jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID") * 0.25), (y,)

    def pool_folded(yf):
        z = yf.reshape(B, T // 2, 2, F // 2, 2 * C)
        return (z[:, :, 0, :, :C] + z[:, :, 0, :, C:] +
                z[:, :, 1, :, :C] + z[:, :, 1, :, C:]) * 0.25
    tests["pool folded"] = jax.jit(pool_folded), (yf,)

    # whole epilogue fused in folded layout: BN+GLU(block-diag skipped)+drop+pool
    for name, (fn, args) in tests.items():
        print(f"{name:16s} {timeit(fn, *args):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
