"""Loss functions matching torch.nn.{BCELoss, MSELoss} semantics."""

from __future__ import annotations

import jax.numpy as jnp


def bce(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy on probabilities, mean reduction.

    Matches torch.nn.BCELoss: log terms are clamped at -100 so that p in
    {0, 1} with the opposite target yields a large-but-finite loss.
    """
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
    return -(t * log_p + (1.0 - t) * log_1p).mean()


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2).mean()


SELF_SUP_LOSSES = {"mse": mse, "bce": bce}
