#!/usr/bin/env python
"""Fine-grained attribution of the 2024 train step: CNN stack fwd/bwd
(eval vs train mode), per-block timing, GRU, mel. Dev tool (real TPU).

Usage: python scripts/profile_cnn.py [stages...]
  stages: cnn gru mel blocks (default: all)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_default_prng_impl", "unsafe_rbg")

import jax.numpy as jnp  # noqa: E402

from desed_task_tpu.models.cnn import CNN  # noqa: E402

B = 60
FILTERS = [16, 32, 64, 128, 128, 128, 128]
POOL = [[2, 2], [2, 2], [1, 2], [1, 2], [1, 2], [1, 2], [1, 2]]


def timeit(fn, sync, n=10, rounds=3):
    out = fn()
    sync(out)  # compile+warm
    best = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        best.append((time.perf_counter() - t0) / n)
    return float(np.median(best)) * 1e3


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def cnn_model(n_blocks=7, dropout=0.5):
    return CNN(
        n_in_channel=1,
        activation="glu",
        conv_dropout=dropout,
        kernel_size=[3] * n_blocks,
        padding=[1] * n_blocks,
        stride=[1] * n_blocks,
        nb_filters=FILTERS[:n_blocks],
        pooling=POOL[:n_blocks],
        dtype=jnp.bfloat16,
    )


def bench_cnn(n_blocks=7, dropout=0.5, label=""):
    model = cnn_model(n_blocks, dropout)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 626, 128, 1)), jnp.bfloat16
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True
    )
    params, stats = variables["params"], variables["batch_stats"]
    key = jax.random.key(2)

    def fwd(train):
        def f(p, x_):
            kw = dict(train=train)
            if train:
                out, _ = model.apply(
                    {"params": p, "batch_stats": stats}, x_,
                    rngs={"dropout": key}, mutable=["batch_stats"], **kw,
                )
                return out
            return model.apply({"params": p, "batch_stats": stats}, x_, **kw)
        return f

    f_e = jax.jit(fwd(False))
    f_t = jax.jit(fwd(True))
    g_t = jax.jit(jax.grad(lambda p, x_: jnp.sum(fwd(True)(p, x_).astype(jnp.float32) ** 2)))
    te = timeit(lambda: f_e(params, x), sync)
    tt = timeit(lambda: f_t(params, x), sync)
    tg = timeit(lambda: g_t(params, x), sync)
    print(f"CNN[{label or n_blocks}] fwd_eval {te:6.2f}  fwd_train {tt:6.2f}  "
          f"fwd+bwd_train {tg:6.2f} ms", flush=True)
    return te, tt, tg


def main():
    stages = sys.argv[1:] or ["cnn", "blocks", "gru", "mel"]
    if "cnn" in stages:
        bench_cnn(7, 0.5, "full")
        bench_cnn(7, 0.0, "nodrop")
    if "blocks" in stages:
        prev = (0.0, 0.0, 0.0)
        for nb in range(1, 8):
            cur = bench_cnn(nb, 0.5, f"1..{nb}")
            print(f"   block {nb-1} delta: eval {cur[0]-prev[0]:6.2f}  "
                  f"train {cur[1]-prev[1]:6.2f}  bwd {cur[2]-prev[2]:6.2f} ms",
                  flush=True)
            prev = cur
    if "gru" in stages:
        from desed_task_tpu.models.rnn import BidirectionalGRU

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, 156, 256)), jnp.float32
        )
        gru = BidirectionalGRU(hidden=192, num_layers=1)
        params = gru.init(jax.random.key(0), x)["params"]
        f = jax.jit(lambda p, x_: gru.apply({"params": p}, x_))
        g = jax.jit(jax.grad(lambda p, x_: jnp.sum(f(p, x_) ** 2)))
        print(f"GRU fwd {timeit(lambda: f(params, x), sync):6.2f}  "
              f"fwd+bwd {timeit(lambda: g(params, x), sync):6.2f} ms", flush=True)
    if "mel" in stages:
        from desed_task_tpu.ops.frontend import MelConfig, amplitude_to_db, mel_spectrogram

        cfg = MelConfig(compute_dtype="bfloat16")
        audio = jnp.asarray(
            np.random.default_rng(2).standard_normal((B, 160000)) * 0.05, jnp.float32
        )
        f = jax.jit(lambda a: amplitude_to_db(mel_spectrogram(a, cfg), cfg))
        print(f"mel {timeit(lambda: f(audio), sync):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
