#!/usr/bin/env python
"""A/B benchmark harness for train-step variants on the tunneled TPU.

Timing variance across sessions is +-50%, so variants are built in ONE
process and timed in alternating rounds. Synchronization is a host fetch of
a device-side reduction (block_until_ready is unreliable through the relay).

Usage: python scripts/ab_step.py variantA variantB ...
Variants are keys of VARIANTS below; edit freely — this is a dev tool.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build(variant: str):
    import jax
    import jax.numpy as jnp

    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.recipes_config import crnn_2024, mean_teacher_2024
    from desed_task_tpu.training import create_state, make_optimizer, make_train_step

    cfg = mean_teacher_2024(batch_scale=1)
    kwargs = {"compute_dtype": jnp.bfloat16}
    if variant.startswith("fp32"):
        # the reference-parity path (fp32 activations everywhere); suffixes
        # toggle the fused Pallas blocks / GRU kernel on it (VERDICT r4 #2)
        kwargs = {}
        if "fused" in variant:
            kwargs["fused_blocks"] = True
        if "nogru" in variant:
            kwargs["rnn_pallas"] = False
    elif variant == "nofast":
        kwargs["fast_conv"] = False
    elif variant in ("folded", "shift_add"):
        kwargs["fast_conv"] = variant
    elif variant == "unpacked":
        kwargs["packed_dropout"] = False
    elif variant == "nofused":
        kwargs["fused_blocks"] = False
    elif variant in ("gru_scan", "gru_pallas"):
        kwargs["rnn_pallas"] = variant == "gru_pallas"
    elif variant == "fpool_kernel":
        kwargs["fused_fpool"] = True
    elif variant == "nofpool":
        kwargs["fused_fpool"] = False
    model = crnn_2024(**kwargs)
    n_class, t_lab = 27, 156
    rng = np.random.default_rng(0)
    batch = {}
    for s in cfg.slots:
        batch[s.name] = {
            "audio": rng.standard_normal((s.size, 160000)).astype(np.float32) * 0.05,
            "labels": (rng.random((s.size, n_class, t_lab)) > 0.95).astype(np.float32),
            "embeddings": rng.standard_normal((s.size, 768, 496)).astype(np.float32),
            "class_mask": np.ones((s.size, n_class), bool),
        }
    mel_cfg = MelConfig(compute_dtype="bfloat16")
    if variant.startswith("fp32"):
        mel_cfg = MelConfig()  # fp32 DFT, like single_run(fast=False)
    elif variant == "mel_chunked":
        mel_cfg = MelConfig(compute_dtype="bfloat16", backend="chunked")
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=1000)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    step = jax.jit(
        make_train_step(model, cfg, tx, sched, mel_cfg=mel_cfg), donate_argnums=0
    )
    batch = jax.device_put(batch)
    return step, state, batch, cfg.batch_size


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    variants = sys.argv[1:] or ["nofast", "fast"]

    def key_for(v):
        # fp32 parity variants use threefry like single_run(fast=False);
        # an "rbg" suffix opts into the fast PRNG to isolate mask-gen cost
        if v.startswith("fp32") and "rbg" not in v:
            return jax.random.key(1, impl="threefry2x32")
        return jax.random.key(1, impl="unsafe_rbg")

    built = {}
    for v in variants:
        t0 = time.perf_counter()
        step, state, batch, bs = build(v)
        key = key_for(v)
        state, metrics = step(state, batch, key)  # compile + warmup
        loss = float(jax.device_get(metrics["loss"]))
        print(f"[{v}] compiled in {time.perf_counter()-t0:.0f}s loss={loss:.4f}",
              flush=True)
        built[v] = [step, state, batch, bs]

    rounds = {v: [] for v in variants}
    for r in range(4):
        for v in variants:
            step, state, batch, bs = built[v]
            key = key_for(v)
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = step(state, batch, key)
            float(jax.device_get(metrics["loss"]))
            dt = (time.perf_counter() - t0) / n
            built[v][1] = state
            rounds[v].append(dt)
            print(f"round {r} [{v}]: {dt*1e3:.2f} ms/step "
                  f"({bs/dt:.0f} clips/s)", flush=True)
    print("--- medians ---")
    for v in variants:
        med = float(np.median(rounds[v]))
        print(f"{v}: {med*1e3:.2f} ms/step ({built[v][3]/med:.0f} clips/s)")


if __name__ == "__main__":
    main()
