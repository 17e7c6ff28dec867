#!/usr/bin/env python
"""Attribute the flagship train step against the HBM bandwidth roofline.

VERDICT r4 weak #5: the step-level MFU (~10-15% of v5e bf16 peak) needs a
resource attribution — is the step at the measured HBM roofline, or is
there a kernel left on the table? This script:

  1. compiles the benchmark train step (bf16 fast path AND fp32 parity path),
  2. reads XLA's cost analysis (bytes accessed = HBM traffic estimate,
     flops) from the compiled executable,
  3. measures the actual step time (alternating rounds, host-fetch sync),
  4. prints implied GB/s and the roofline statement next to the
     micro-benchmarked streaming bandwidth (scripts/micro_bw.py measured
     ~450-650 GB/s on this chip/tunnel).

    python scripts/roofline_step.py [bf16 fp32]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0  # bf16 MXU peak, public v5e spec
V5E_FP32_PEAK_TFLOPS = 49.0   # fp32 (no MXU bf16 packing)
MEASURED_BW_GBPS = (450.0, 650.0)  # scripts/micro_bw.py range on this setup


def build(variant: str):
    import jax
    import jax.numpy as jnp

    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.recipes_config import crnn_2024, mean_teacher_2024
    from desed_task_tpu.training import (
        create_state, make_optimizer, make_train_step,
    )

    cfg = mean_teacher_2024(batch_scale=1)
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
    if variant == "bf16":
        model = crnn_2024(compute_dtype=jnp.bfloat16)
        mel_cfg = MelConfig(compute_dtype="bfloat16")
        key = jax.random.key(1, impl="unsafe_rbg")
    else:
        model = crnn_2024()
        mel_cfg = MelConfig()
        key = jax.random.key(1, impl="threefry2x32")
    tx, sched = make_optimizer(lr=1e-3, rampup_steps=1000)
    state = create_state(model, cfg, tx, jax.random.key(0), batch)
    step = jax.jit(make_train_step(model, cfg, tx, sched, mel_cfg=mel_cfg))
    return step, state, jax.device_put(batch), key, cfg.batch_size


def main():
    import jax

    variants = sys.argv[1:] or ["bf16", "fp32"]
    built = {}
    for v in variants:
        step, state, batch, key, bs = build(v)
        lowered = step.lower(state, batch, key)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        float(jax.device_get(metrics["loss"]))
        print(f"[{v}] compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
        built[v] = (step, state, batch, key, bs, ca)

    times = {v: [] for v in variants}
    for r in range(4):
        for v in variants:
            step, state, batch, key, bs, _ = built[v]
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = step(state, batch, key)
            float(jax.device_get(metrics["loss"]))
            times[v].append((time.perf_counter() - t0) / n)
            built[v] = (step, state, batch, key, bs, built[v][5])

    for v in variants:
        _, _, _, _, bs, ca = built[v]
        dt = float(np.median(times[v]))
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        tflops = float(ca.get("flops", 0.0)) / 1e12
        peak = V5E_BF16_PEAK_TFLOPS if v == "bf16" else V5E_FP32_PEAK_TFLOPS
        implied_bw = gb / dt
        bw_floor = gb / MEASURED_BW_GBPS[1] * 1e3
        bw_ceil = gb / MEASURED_BW_GBPS[0] * 1e3
        print(
            f"\n[{v}] step {dt*1e3:.1f} ms ({bs/dt:.0f} clips/s)\n"
            f"  XLA cost analysis: {gb:.2f} GB accessed, {tflops:.3f} TFLOP\n"
            f"  implied HBM rate: {implied_bw:.0f} GB/s "
            f"(micro_bw streaming: {MEASURED_BW_GBPS[0]:.0f}-"
            f"{MEASURED_BW_GBPS[1]:.0f} GB/s)\n"
            f"  bandwidth roofline for this traffic: "
            f"{bw_floor:.1f}-{bw_ceil:.1f} ms\n"
            f"  MFU: {tflops / dt / peak * 100:.1f}% of {peak:.0f} TFLOP/s peak"
        )


if __name__ == "__main__":
    main()
