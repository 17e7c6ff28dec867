#!/usr/bin/env python
"""Attribute scale-run step time: host batch build vs tunnel transfer vs compute.

Usage: python scripts/profile_datapath.py --workdir /root/scale_data [--steps 8]

Phases measured independently (one process, real TPU):
  build    — next() on the batcher with prefetch disabled (pure host work)
  build2   — second pass over the same items (OS page cache warm)
  put      — jax.device_put of a built batch + sync
  step     — jitted train step on an on-device batch (post-compile)
  loop     — the TrainLoop-equivalent serial iteration (build+put+step)
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/root/scale_data")
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()

    from examples.scale_run_2024 import build_config
    import jax
    import jax.numpy as jnp

    from desed_task_tpu.training import single_run as sr
    from desed_task_tpu.data import MultiSourceBatcher
    from desed_task_tpu.training.mean_teacher import (
        create_state, make_optimizer, make_train_step,
    )

    config = build_config(Path(args.workdir), epochs=45)
    t = config["training"]
    key = sr.seed_everything(42)
    encoder = sr.build_encoder(config)
    model = sr.build_model(config, fast=True)
    mel = sr.mel_config(config, fast=True)
    scal = sr.scaler_config(config)
    datasets, batch_sizes, slots = sr.build_train_datasets(config, encoder)
    datasets.pop("_weak_val"); datasets.pop("_maestro_val_tsv", None)

    batcher = MultiSourceBatcher(datasets, batch_sizes, seed=42, num_workers=1)
    sizes = {}

    def batch_bytes(b):
        tot = 0
        for slot in b.values():
            for k, v in slot.items():
                if isinstance(v, np.ndarray):
                    tot += v.nbytes
        return tot

    # --- build (serial, no prefetch thread) ---
    it = iter(batcher.epoch(steps=args.steps + 2))
    b0 = next(it)  # warm lazy handles
    sizes["batch_MB"] = batch_bytes(b0) / 1e6
    t0 = time.monotonic()
    builds = []
    for i in range(args.steps):
        s = time.monotonic()
        b0 = next(it)
        builds.append(time.monotonic() - s)
    print(f"build: mean {np.mean(builds)*1e3:.0f} ms  (per-batch {sizes['batch_MB']:.1f} MB)"
          f"  each={[f'{x*1e3:.0f}' for x in builds]}")

    # second pass over same dataset (page cache warm now)
    it2 = iter(batcher.epoch(steps=args.steps))
    builds2 = []
    for i in range(args.steps):
        s = time.monotonic()
        next(it2)
        builds2.append(time.monotonic() - s)
    print(f"build2: mean {np.mean(builds2)*1e3:.0f} ms  each={[f'{x*1e3:.0f}' for x in builds2]}")

    # --- breakdown of one item ---
    ds = datasets["synth"]
    s = time.monotonic(); item = ds[0]; one = time.monotonic() - s
    s = time.monotonic()
    from desed_task_tpu.data.audio_io import read_audio
    read_audio(ds.examples[ds.examples_list[0]]["path"], pad_to=ds.pad_to)
    dec = time.monotonic() - s
    emb = 0.0
    if ds.embeddings is not None:
        s = time.monotonic()
        ds.embeddings.get(Path(ds.examples[ds.examples_list[0]]["path"]).stem)
        emb = time.monotonic() - s
    print(f"item: total {one*1e3:.2f} ms  decode {dec*1e3:.2f} ms  embed {emb*1e3:.2f} ms")

    # --- device put ---
    puts = []
    dev_batches = []
    for i in range(4):
        s = time.monotonic()
        db = jax.device_put(b0)
        # force completion: sum one leaf per slot
        for slot in db.values():
            float(jnp.sum(slot["audio"][0]))
        puts.append(time.monotonic() - s)
        dev_batches.append(db)
    print(f"put+sync: each={[f'{x*1e3:.0f}' for x in puts]} ms")

    # --- step ---
    steps_per_epoch = max(batcher.steps_per_epoch, 1)
    cfg = sr.mean_teacher_config(config, slots, steps_per_epoch)
    tx, sched = make_optimizer(lr=config["opt"]["lr"], rampup_steps=cfg.rampup_steps,
                               max_grad_norm=t.get("gradient_clip", 5.0))
    state = create_state(model, cfg, tx, key, b0, scaler=None, mel_cfg=mel)
    step_fn = jax.jit(make_train_step(model, cfg, tx, sched, mel_cfg=mel,
                                      scaler_cfg=scal), donate_argnums=0)
    rng = jax.random.key(1)
    print("compiling step...", flush=True)
    s = time.monotonic()
    state, m = step_fn(state, dev_batches[0], rng)
    float(next(iter(m.values())))
    print(f"compile+first: {time.monotonic()-s:.1f} s", flush=True)
    stimes = []
    for i in range(1, 4):
        s = time.monotonic()
        state, m = step_fn(state, dev_batches[i % len(dev_batches)], rng)
        float(next(iter(m.values())))
        stimes.append(time.monotonic() - s)
    print(f"step(on-device batch): each={[f'{x*1e3:.0f}' for x in stimes]} ms")

    # --- serial loop (what TrainLoop does today) ---
    it3 = iter(batcher.epoch(steps=args.steps))
    ltimes = []
    for b in it3:
        s = time.monotonic()
        db = jax.device_put(b)
        state, m = step_fn(state, db, rng)
        float(next(iter(m.values())))
        ltimes.append(time.monotonic() - s)
    print(f"loop(build outside timer; put+step): each={[f'{x*1e3:.0f}' for x in ltimes]} ms")
    print(f"SUMMARY build={np.mean(builds2)*1e3:.0f}ms put={np.mean(puts)*1e3:.0f}ms "
          f"step={np.mean(stimes)*1e3:.0f}ms loop={np.mean(ltimes)*1e3:.0f}ms")


if __name__ == "__main__":
    main()
