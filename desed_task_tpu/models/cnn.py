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

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dropout import PackedDropout


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


def _folded_conv3x3(x, kernel):
    """3x3 pad-1 stride-1 conv on [B, T, F, C] as an equivalent 1-D conv over
    time on [B, T, F*C] with a block-banded kernel (no bias).

    Bit-exact (same contraction, different tiling): once the frequency axis
    has been pooled below a TPU sublane tile (F <= 8), the NHWC conv wastes
    most of the (8, 128) register tile on F padding; folding F into the
    channel axis gives the MXU K = 3*F*C, N = F*C GEMM shapes instead
    (~25-30% faster per block measured on v5e).
    """
    B, T, F, Cin = x.shape
    Cout = kernel.shape[-1]
    w1d = jnp.zeros((3, F * Cin, F * Cout), kernel.dtype)
    for fo in range(F):
        for df in (-1, 0, 1):
            fi = fo + df
            if 0 <= fi < F:
                w1d = w1d.at[
                    :, fi * Cin : (fi + 1) * Cin, fo * Cout : (fo + 1) * Cout
                ].set(kernel[:, df + 1])
    out = jax.lax.conv_general_dilated(
        x.reshape(B, T, F * Cin),
        w1d,
        window_strides=(1,),
        padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out.reshape(B, T, F, Cout)


def _shift_add_conv3x3(x, kernel):
    """3x3 pad-1 conv for tiny channel counts as 9 shifted FMAs (no bias).

    With C_in < 8 the MXU/im2col path wastes nearly the whole 128-lane tile;
    9 broadcast multiply-adds on the VPU are ~1.7x faster for the first CRNN
    conv (C_in=1, measured on v5e).
    """
    B, T, F, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for i in range(3):
        for j in range(3):
            win = xp[:, i : i + T, j : j + F, :]  # [B,T,F,Cin]
            term = jnp.einsum("btfc,co->btfo", win, kernel[i, j])
            out = term if out is None else out + term
    return out


def _plain_conv3x3(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fast_conv3x3(x, kernel, bias, path: str):
    """3x3 pad-1 stride-1 conv with a TPU-tiled forward AND backward.

    Round-1 finding (docs/performance.md): the folded/shift-add forwards are
    25-70% faster than the NHWC conv, but XLA's autodiff differentiates the
    MATERIALIZED banded weight (dense [3, F*C, F*C] wgrad) / the 9-term
    einsum, losing more than the forward gains. This custom VJP keeps the
    fast tilings for the forward and the input-gradient (the transpose of a
    SAME 3x3 conv is the same conv with a flipped, channel-transposed
    kernel — identical banded structure) while routing the weight gradient
    through XLA's native conv transpose (efficient im2col GEMM on the true
    [3, 3, Cin, Cout] parameter). Bit-exact vs the plain path.
    """
    core = _folded_conv3x3 if path == "folded" else _shift_add_conv3x3
    return core(x, kernel) + bias


def _fast_conv3x3_fwd(x, kernel, bias, path):
    return fast_conv3x3(x, kernel, bias, path), (x, kernel)


def _fast_conv3x3_bwd(path, res, dy):
    x, kernel = res
    # dgrad: full correlation = SAME conv of dy with the spatially flipped,
    # channel-transposed kernel -> same fast tiling applies
    kt = jnp.flip(kernel, (0, 1)).transpose(0, 1, 3, 2)
    if path == "folded":
        dx = _folded_conv3x3(dy, kt)
    else:
        dx = _shift_add_conv3x3(dy, kt)
    # wgrad on the true 3x3 parameter via XLA's conv transpose rule
    dw = jax.linear_transpose(lambda k: _plain_conv3x3(x, k), kernel)(dy)[0]
    db = dy.sum((0, 1, 2))
    return dx, dw, db


fast_conv3x3.defvjp(_fast_conv3x3_fwd, _fast_conv3x3_bwd)


class _Conv2dAuto(nn.Module):
    """Conv2d with nn.Conv's exact parameter layout (kernel [kh, kw, in, out]
    + bias) that automatically switches to bit-exact TPU-tiled fast paths
    (banded fold for tile-small freq axes, shift-add for tiny channel
    counts) — now safe for training via fast_conv3x3's custom VJP."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Any = None
    # Round-2 default: OFF. The folded/shift-add tilings measured faster
    # per-block in round 1 but LOSE end-to-end now — eval fp32 full CRNN
    # 21.7 vs 17.6 ms plain, and the fused Pallas blocks (ops/pallas_cnn.py)
    # own the bf16 path outright (10.5 ms). True = fast paths at inference;
    # "folded"/"shift_add" force a path in training too (custom VJP).
    fast: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        is_same3x3 = self.kernel == 3 and self.stride == 1 and self.pad == 1
        infer = not train
        use_folded = self.fast == "folded" or (self.fast is True and infer)
        use_shift = self.fast == "shift_add" or (self.fast is True and infer)
        if use_folded and is_same3x3 and x.shape[2] <= 8 and in_ch >= 8:
            return fast_conv3x3(x, kernel, bias, "folded")
        if use_shift and is_same3x3 and in_ch < 8:
            return fast_conv3x3(x, kernel, bias, "shift_add")
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class _ConvP(nn.Module):
    """Parameter holder matching _Conv2dAuto's tree (conv{i}/kernel, bias)."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_ch, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _BNP(nn.Module):
    """Parameter/stats holder matching nn.BatchNorm's tree."""

    @nn.compact
    def __call__(self, feats: int):
        scale = self.param("scale", nn.initializers.ones, (feats,))
        bias = self.param("bias", nn.initializers.zeros, (feats,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feats,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feats,), jnp.float32)
        )
        return scale, bias, mean, var


class _DenseP(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _GLUP(nn.Module):
    """Matches GLU's tree: glu{i}/Dense_0/{kernel, bias}."""

    features: int

    @nn.compact
    def __call__(self):
        return _DenseP(self.features, name="Dense_0")()


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
    # bit-exact TPU-tiled conv paths (banded fold / shift-add), custom VJP.
    # True = inference-only auto (training measured slower on v5e);
    # "folded"/"shift_add" force in training; False = always plain conv.
    fast_conv: Any = False
    # packed-bits dropout masks (8 bits of entropy/element instead of a full
    # uint32 word — 4x less RBG work + HBM; exact for rate 0.5, ops/dropout.py)
    packed_dropout: bool = True
    # fused Pallas block kernels (ops/pallas_cnn.py): conv+BN+GLU+dropout+pool
    # in two kernels per block. None = auto (on on TPU for bf16 AND fp32
    # compute: fp32 fused measured 33.3 vs 81.4 ms/step on the 2024 flagship
    # train step, accumulation-order-equal to the golden XLA chain —
    # scripts/check_fp32_fused.py gates the real-Mosaic lowering, the
    # interpret tests pin math + dropout semantics). True/False force;
    # "interpret" runs the kernels in interpreter mode (CPU tests).
    fused_blocks: Any = None
    # run the F-pool inside kernel B as a lane-averaging matmul instead of
    # the XLA reshape-mean after it. None = auto (on whenever the fused
    # blocks are on: A/B-measured 29.1 -> 23.6 ms/step on the 2024 flagship
    # train step, docs/performance.md round-4). True/False force.
    fused_fpool: Any = None

    def _use_fused(self, i: int) -> bool:
        mode = self.fused_blocks
        if mode is None:
            import jax as _jax

            mode = (
                self.dtype in (jnp.bfloat16, None, jnp.float32)
                and _jax.default_backend() == "tpu"
            )
        if not mode:
            return False
        return (
            self.activation.lower() == "glu"
            and self.normalization == "batch"
            and self.kernel_size[i] == 3
            and self.stride[i] == 1
            and self.padding[i] == 1
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, filters in enumerate(self.nb_filters):
            if self._use_fused(i):
                x = self._fused_block(x, i, filters, train)
                continue
            k, s, p = self.kernel_size[i], self.stride[i], self.padding[i]
            x = _Conv2dAuto(
                features=filters,
                kernel=k,
                stride=s,
                pad=p,
                dtype=self.dtype,
                fast=self.fast_conv,
                name=f"conv{i}",
            )(x, train=train)
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
                drop = PackedDropout if self.packed_dropout else nn.Dropout
                x = drop(self.conv_dropout, deterministic=not train)(x)
            pt, pf = self.pooling[i]
            x = nn.avg_pool(x, window_shape=(pt, pf), strides=(pt, pf), padding="VALID")
        return x

    def _fused_block(self, x, i: int, filters: int, train: bool):
        """conv+BN+GLU+dropout+pool via ops/pallas_cnn.fused_glu_block with
        the exact parameter tree of the unfused chain (checkpoint compatible)."""
        from ..ops.pallas_cnn import fused_glu_block

        kern, cbias = _ConvP(filters, name=f"conv{i}")(x.shape[-1])
        scale, bbias, ra_m, ra_v = _BNP(name=f"batchnorm{i}")(filters)
        wg, bg = _GLUP(filters, name=f"glu{i}")()
        key = None
        if train and self.conv_dropout > 0:
            key = self.make_rng("dropout")
        z, new_m, new_v = fused_glu_block(
            x, kern, cbias, scale, bbias, ra_m.value, ra_v.value, wg, bg,
            pool=tuple(self.pooling[i]),
            train=train,
            dropout_rate=self.conv_dropout if train else 0.0,
            dropout_key=key,
            eps=1e-3,
            momentum=0.01,  # torch momentum 0.99 (flax convention)
            interpret=self.fused_blocks == "interpret",
            fpool_in_kernel=(
                self.fused_fpool if self.fused_fpool is not None else True
            ),
        )
        if train and not self.is_initializing():
            ra_m.value = new_m
            ra_v.value = new_v
        return z
