#!/usr/bin/env python
"""A/B the Pallas BiGRU recurrence vs the lax.scan path, one process,
alternating variants (the only valid timing method on the tunneled TPU).

Measures (flagship shapes B=60, T=156, H=192, in=256):
  1. isolated BiGRU fwd and fwd+bwd (jitted closures)
  2. the FULL mean-teacher train step with pallas_recurrence True vs False

Usage: python scripts/ab_gru.py [--iters 30] [--full]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench(fn, iters, *args):
    import jax

    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--full", action="store_true",
                   help="also A/B the full train step (2 x ~2 min compiles)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from desed_task_tpu.models.rnn import BidirectionalGRU

    B, T, H, IN = 60, 156, 192, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))

    mod_scan = BidirectionalGRU(hidden=H, num_layers=2, pallas_recurrence=False)
    mod_pl = BidirectionalGRU(hidden=H, num_layers=2, pallas_recurrence=True)
    variables = mod_scan.init(jax.random.key(0), x)

    f_scan = jax.jit(lambda v, x: mod_scan.apply(v, x))
    f_pl = jax.jit(lambda v, x: mod_pl.apply(v, x))
    g_scan = jax.jit(jax.grad(lambda v, x: jnp.sum(mod_scan.apply(v, x) ** 2)))
    g_pl = jax.jit(jax.grad(lambda v, x: jnp.sum(mod_pl.apply(v, x) ** 2)))

    # numerical agreement on-device first
    o1, o2 = f_scan(variables, x), f_pl(variables, x)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"fwd max|diff| = {err:.2e}")

    for _ in range(3):  # alternate to wash out tunnel variance
        t = bench(f_scan, args.iters, variables, x)
        tp = bench(f_pl, args.iters, variables, x)
        print(f"fwd: scan {t:.2f} ms | pallas {tp:.2f} ms")
    for _ in range(3):
        t = bench(g_scan, args.iters, variables, x)
        tp = bench(g_pl, args.iters, variables, x)
        print(f"fwd+bwd: scan {t:.2f} ms | pallas {tp:.2f} ms")

    if args.full:
        from desed_task_tpu.ops.frontend import MelConfig
        from desed_task_tpu.recipes_config import crnn_2024, mean_teacher_2024
        from desed_task_tpu.training import (
            create_state, make_optimizer, make_train_step,
        )

        jax.config.update("jax_default_prng_impl", "unsafe_rbg")
        cfg = mean_teacher_2024()
        n_class, t_lab = 27, 156
        batch = {}
        for s in cfg.slots:
            batch[s.name] = {
                "audio": rng.standard_normal((s.size, 160000)).astype(np.float32) * 0.05,
                "labels": (rng.random((s.size, n_class, t_lab)) > 0.95).astype(np.float32),
                "embeddings": rng.standard_normal((s.size, 768, 496)).astype(np.float32),
                "class_mask": np.ones((s.size, n_class), bool),
            }
        mel_cfg = MelConfig(compute_dtype="bfloat16")
        tx, sched = make_optimizer(lr=1e-3, rampup_steps=1000)
        key = jax.random.key(1)

        def build(pallas):
            model = crnn_2024(compute_dtype=jnp.bfloat16, rnn_pallas=pallas)
            state = create_state(model, cfg, tx, jax.random.key(0), batch)
            step = jax.jit(make_train_step(model, cfg, tx, sched, mel_cfg=mel_cfg))
            db = jax.device_put(batch)
            st, m = step(state, db, key)
            sync(m["loss"])
            def run():
                nonlocal st
                st, m = step(st, db, key)
                return m["loss"]
            return run

        runs = {False: build(False), True: build(True)}
        for _ in range(3):  # alternate measurement blocks
            for pallas, run in runs.items():
                times = []
                for _ in range(20):
                    t0 = time.perf_counter()
                    sync(run())
                    times.append((time.perf_counter() - t0) * 1e3)
                print(f"full step pallas={pallas}: {np.median(times):.2f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
