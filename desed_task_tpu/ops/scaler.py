"""Feature normalization (TPU-native re-design of desed_task/utils/scaler.py).

Instance normalization is a pure jittable function; dataset-statistic
normalization carries its fitted state as an explicit pytree (fit on host by
streaming a data iterator), so it can be donated/replicated under pjit and
checkpointed alongside model params — unlike the reference's torch buffers
(scaler.py:60-120) which live on a Module.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScalerConfig:
    statistic: str = "instance"  # "instance" | "dataset" | "none"
    normtype: str = "minmax"  # "standard" | "mean" | "minmax" | "none"
    dims: tuple[int, ...] = (1, 2)
    eps: float = 1e-8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ScalerState:
    """Fitted statistics for statistic="dataset" (else empty)."""

    mean: jnp.ndarray | None = None
    mean_squared: jnp.ndarray | None = None

    def tree_flatten(self):
        return (self.mean, self.mean_squared), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def fit_scaler(
    cfg: ScalerConfig,
    batches: Iterable,
    transform: Callable = lambda b: b,
) -> ScalerState:
    """Stream mean / mean-of-squares over an iterator of feature batches.

    Matches reference TorchScaler.fit (scaler.py:60-88): per-batch mean over
    cfg.dims (keepdims) then over the batch axis, averaged across batches.
    """
    mean = None
    mean_sq = None
    n = 0
    for batch in batches:
        feats = np.asarray(transform(batch))
        m = feats.mean(axis=cfg.dims, keepdims=True).mean(0)[None]
        m2 = (feats**2).mean(axis=cfg.dims, keepdims=True).mean(0)[None]
        mean = m if mean is None else mean + m
        mean_sq = m2 if mean_sq is None else mean_sq + m2
        n += 1
    if n == 0:
        raise ValueError("fit_scaler received an empty iterator")
    return ScalerState(jnp.asarray(mean / n), jnp.asarray(mean_sq / n))


def apply_scaler(
    x: jnp.ndarray, cfg: ScalerConfig, state: ScalerState | None = None
) -> jnp.ndarray:
    """Normalize features. Jittable; cfg is static, state is a pytree."""
    if cfg.statistic in ("none", None) or cfg.normtype in ("none", None):
        return x
    if cfg.statistic == "dataset":
        if state is None or state.mean is None:
            raise ValueError("dataset scaler must be fitted (ScalerState)")
        if cfg.normtype == "mean":
            return x - state.mean
        if cfg.normtype == "standard":
            std = jnp.sqrt(state.mean_squared - state.mean**2)
            return (x - state.mean) / (std + cfg.eps)
        raise NotImplementedError(
            "statistic=dataset supports normtype mean|standard (as reference)"
        )
    # instance
    if cfg.normtype == "mean":
        return x - jnp.mean(x, axis=cfg.dims, keepdims=True)
    if cfg.normtype == "standard":
        mu = jnp.mean(x, axis=cfg.dims, keepdims=True)
        # torch.std uses the unbiased (ddof=1) estimator
        cnt = np.prod([x.shape[d] for d in cfg.dims])
        var = jnp.sum((x - mu) ** 2, axis=cfg.dims, keepdims=True) / max(cnt - 1, 1)
        return (x - mu) / (jnp.sqrt(var) + cfg.eps)
    if cfg.normtype == "minmax":
        lo = jnp.min(x, axis=cfg.dims, keepdims=True)
        hi = jnp.max(x, axis=cfg.dims, keepdims=True)
        out = (x - lo) / (hi - lo + cfg.eps)
        return out * 2.0 - 1.0
    raise ValueError(f"unknown normtype {cfg.normtype!r}")
