#!/usr/bin/env python
"""HBM bandwidth + dispatch-overhead calibration on the tunneled v5e."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=30, rounds=5):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[:8, :8]))
    meds = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)[:8, :8]))
        meds.append((time.perf_counter() - t0) / n)
    return float(np.median(meds))


def main():
    rng = np.random.default_rng(0)
    f = jax.jit(lambda x: x * 1.0001 + 1.0)
    tiny = jnp.zeros((8, 128), jnp.float32)
    t_tiny = timeit(f, tiny)
    print(f"tiny dispatch:        {t_tiny*1e3:7.3f} ms", flush=True)
    for shape, dt in [((2048, 8192), jnp.float32),   # 64MB
                      ((8192, 8192), jnp.float32),   # 256MB
                      ((16384, 8192), jnp.float32),  # 512MB
                      ((8192, 8192), jnp.bfloat16),  # 128MB
                      ((60 * 626, 2048), jnp.bfloat16)]:  # folded block0 154MB
        x = jnp.asarray(rng.standard_normal(shape), dt)
        t = timeit(f, x)
        nbytes = x.size * x.dtype.itemsize
        bw = 2 * nbytes / t / 1e9
        print(f"{str(shape):18s} {str(dt.__name__ if hasattr(dt,'__name__') else dt):9s}"
              f" {t*1e3:7.3f} ms  {bw:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
