"""Convolutional feature extractor (flax.linen, NHWC layout for TPU).

Re-design of desed_task/nnet/CNN.py (CNN :33, GLU :5, ContextGating :19):
a stack of [Conv -> BatchNorm/GroupNorm -> activation -> dropout -> AvgPool]
blocks. Uses NHWC (channels-last) which is the native TPU convolution layout,
so the per-block GLU/ContextGating linear layers (channel-last in the
reference too) need no transposes at all.

Numerics matched to the reference:
  * BatchNorm eps=1e-3; torch momentum 0.99 (running ~= latest batch) maps to
    flax momentum 0.01 (flax: ra = m*ra + (1-m)*batch).
  * GLU(x) = Linear(x) * sigmoid(x)    (gate is the raw input!)
  * ContextGating(x) = x * sigmoid(Linear(x))
  * AvgPool window == stride, floor semantics (torch AvgPool2d default).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class GLU(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(x.shape[-1], dtype=self.dtype)(x)
        return lin * nn.sigmoid(x)


class ContextGating(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(x.shape[-1], dtype=self.dtype)(x)
        return x * nn.sigmoid(lin)


class CNN(nn.Module):
    """Input [B, T, F, n_in_channel] -> [B, T', F', C_last]."""

    n_in_channel: int = 1
    activation: str = "relu"
    conv_dropout: float = 0.0
    kernel_size: Sequence[int] = (3, 3, 3)
    padding: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    nb_filters: Sequence[int] = (64, 64, 64)
    pooling: Sequence[Sequence[int]] = ((1, 4), (1, 4), (1, 4))
    normalization: str = "batch"  # "batch" | "layer" (GroupNorm(1))
    # computation dtype: jnp.bfloat16 feeds the MXU at 4x fp32 throughput on
    # v5e; params/BN stats stay fp32 (flax param_dtype default)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, filters in enumerate(self.nb_filters):
            k, s, p = self.kernel_size[i], self.stride[i], self.padding[i]
            x = nn.Conv(
                features=filters,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(p, p), (p, p)],
                use_bias=True,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if self.normalization == "batch":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.01,  # torch momentum 0.99
                    epsilon=1e-3,
                    dtype=self.dtype,
                    name=f"batchnorm{i}",
                )(x)
            elif self.normalization == "layer":
                # reference "layer" is GroupNorm(num_groups=1) over channels
                x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"layernorm{i}")(x)
            act = self.activation.lower()
            if act == "relu":
                x = nn.relu(x)
            elif act == "leakyrelu":
                x = nn.leaky_relu(x, negative_slope=0.2)
            elif act == "glu":
                x = GLU(dtype=self.dtype, name=f"glu{i}")(x)
            elif act == "cg":
                x = ContextGating(dtype=self.dtype, name=f"cg{i}")(x)
            else:
                raise ValueError(f"unknown activation {self.activation!r}")
            if self.conv_dropout > 0:
                x = nn.Dropout(self.conv_dropout, deterministic=not train)(x)
            pt, pf = self.pooling[i]
            x = nn.avg_pool(x, window_shape=(pt, pf), strides=(pt, pf), padding="VALID")
        return x
