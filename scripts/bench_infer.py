#!/usr/bin/env python
"""Serving-path inference throughput on the real TPU.

Times the InferencePipeline's jitted device program — mel -> scaler ->
CRNN(+frame-embedding fusion) -> per-class median filter -> full
50-threshold sweep — on device-resident 10 s batches (the wav-decode stage
overlaps the device in production and is benchmarked separately in
scripts/profile_datapath.py). Reports clips/s/chip and ms/batch for the
2024 flagship model in both the bf16 fast and fp32 parity configurations.

    python scripts/bench_infer.py [batch_sizes ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from desed_task_tpu.inference.pipeline import InferencePipeline
    from desed_task_tpu.labels.encoder import ManyHotEncoder
    from desed_task_tpu.ops.frontend import MelConfig
    from desed_task_tpu.recipes_config import MEDIAN_2024, crnn_2024
    from desed_task_tpu.utils.classes_dict import (
        CLASSES_DESED, CLASSES_MAESTRO_REAL,
    )

    batch_sizes = [int(a) for a in sys.argv[1:]] or [64, 256]
    classes = list(CLASSES_DESED) + [
        c for c in CLASSES_MAESTRO_REAL if c not in CLASSES_DESED
    ]
    enc = ManyHotEncoder(classes, 10, 2048, 256, 4, 16000)
    thresholds = tuple(np.arange(1 / 100, 1, 1 / 50))
    rng = np.random.default_rng(0)

    for label, dtype, mel in [
        ("bf16_fast", jnp.bfloat16, MelConfig(compute_dtype="bfloat16")),
        ("fp32", None, MelConfig()),
    ]:
        model = crnn_2024(**({"compute_dtype": dtype} if dtype else {}))
        variables = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((2, 128, 626), jnp.float32),
            embeddings=jnp.zeros((2, 768, 496), jnp.float32),
            train=False,
        )
        pipe = InferencePipeline(
            model, variables, enc, mel_cfg=mel,
            median_filter=MEDIAN_2024, thresholds=thresholds,
        )
        fwd = jax.jit(pipe._forward_impl)
        for bs in batch_sizes:
            audio = jnp.asarray(
                rng.standard_normal((bs, 160000)).astype(np.float32) * 0.05
            )
            emb = jnp.asarray(
                rng.standard_normal((bs, 768, 496)).astype(np.float32)
            )
            strong, _, act = fwd(audio, emb)  # compile + warmup
            float(jnp.sum(strong))
            times = []
            for _ in range(3):
                n = 10
                t0 = time.perf_counter()
                for _ in range(n):
                    strong, _, act = fwd(audio, emb)
                float(jnp.sum(strong))
                times.append((time.perf_counter() - t0) / n)
            dt = float(np.median(times))
            print(f"[{label}] batch {bs}: {dt*1e3:.2f} ms/batch "
                  f"({bs/dt:.0f} clips/s/chip, 50-threshold sweep on device)",
                  flush=True)


if __name__ == "__main__":
    main()
