#!/usr/bin/env python
"""Microbenchmark: dropout mask strategies on the block-0 tensor (v5e).

Variants time y = dropout(x) on bf16 [60, 626, 128, 16] (the largest conv
activation of the 2024 CRNN) with the tunneled-TPU sync discipline.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_default_prng_impl", "unsafe_rbg")

import jax.numpy as jnp
import numpy as np

from desed_task_tpu.ops.dropout import packed_keep_mask

SHAPE = (60, 626, 128, 16)
N = int(np.prod(SHAPE))


def flax_style(key, x):
    mask = jax.random.bernoulli(key, 0.5, x.shape)
    return jnp.where(mask, x * 2.0, jnp.zeros((), x.dtype))


def packed8(key, x):
    mask = packed_keep_mask(key, x.shape, 0.5, bits=8)
    return jnp.where(mask, x * 2.0, jnp.zeros((), x.dtype))


def packed16(key, x):
    mask = packed_keep_mask(key, x.shape, 0.5, bits=16)
    return jnp.where(mask, x * 2.0, jnp.zeros((), x.dtype))


def uint8_direct(key, x):
    bits = jax.random.bits(key, x.shape, jnp.uint8)
    return jnp.where(bits < 128, x * 2.0, jnp.zeros((), x.dtype))


def sign_bit(key, x):
    # 1 bit per element from a full word: sign test on uint32 (same word
    # count as flax but no float conversion)
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    return jnp.where(bits >> 31 == 0, x * 2.0, jnp.zeros((), x.dtype))


def no_dropout(key, x):
    return x * 2.0


VARIANTS = {
    "flax": flax_style,
    "packed8": packed8,
    "packed16": packed16,
    "uint8": uint8_direct,
    "signbit": sign_bit,
    "none": no_dropout,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(SHAPE), jnp.bfloat16
    )
    key = jax.random.key(0)
    fns = {}
    for name in names:
        f = jax.jit(VARIANTS[name])
        y = f(key, x)
        float(jnp.sum(y.astype(jnp.float32)))  # sync
        fns[name] = f
    for r in range(3):
        for name in names:
            f = fns[name]
            t0 = time.perf_counter()
            for _ in range(20):
                y = f(key, x)
            float(jnp.sum(y.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / 20
            print(f"round {r} {name}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
