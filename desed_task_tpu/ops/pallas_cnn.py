"""Fused CNN-block Pallas kernels: conv3x3 + BatchNorm + GLU + dropout + pool.

The 2024 CRNN's conv stack (desed_task/nnet/CNN.py:66-98 semantics) spends
most of its time streaming 77M-element activations through 4-6 separate XLA
kernels per block, with the small channel counts (16/32) wasting most of each
(sublane, lane) register tile (measured: blocks 0-1 are 25 ms of the 32 ms
CNN fwd+bwd, scripts/profile_cnn.py / micro_block0.py, docs/performance.md).

This module fuses each block into TWO Pallas kernels over a (clips,) grid —
one padded clip fits VMEM whole, so there is no halo machinery:

  kernel A  conv+stats:  folded lanes [T, F*Ci] -> banded group-matmuls on
            the MXU (K=(Gf+2)*Ci, N=Gf*Co picked >= MXU-friendly sizes)
            -> y [T, F*Co] + masked per-(f,c) sum/sumsq accumulated fp32
            across the sequential grid (TPU grid programs run in order).
  glue      BN batch/running statistics (tiny [C] math, XLA autodiff
            handles the stats backward), dropout bits (uint8), GLU group
            weight, F-pool after the kernel (cheap: tensor is pt*pf x
            smaller; lane-compaction inside the kernel is not worth it).
  kernel B  epilogue: BN-apply + GLU (lane-group block-diagonal weight
            [G*C, G*C], G=128//C, so every matmul runs at full MXU width
            regardless of C) + dropout + T-pool, one read of y, one write.

Both kernels carry custom VJPs whose backward passes are single fused Pallas
kernels with fp32 reduction accumulators (dW bands, dWg, dscale/dbias) that
live in VMEM scratch across the grid and are written at the last program.

Numerics: matmuls accumulate fp32 (`preferred_element_type`); activations
stay in the requested dtype (bf16 on TPU, fp32 for parity tests). BatchNorm
matches flax.linen.BatchNorm (biased variance for both normalization and the
running update, momentum on the running side).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# static per-block geometry
# --------------------------------------------------------------------------


def _pick_group(F: int, Ci: int, Co: int) -> int:
    """Smallest divisor g of F with a K >= 96 and N >= 64 matmul; else F."""
    for g in range(1, F + 1):
        if F % g == 0 and (g + 2) * Ci >= 96 and g * Co >= 64:
            return g
    return F


@dataclasses.dataclass(frozen=True)
class BlockDims:
    B: int
    T: int          # valid input rows
    F: int
    Ci: int
    Co: int
    pt: int
    pf: int
    dtype: str = "bfloat16"

    @property
    def Tp(self) -> int:  # padded rows (multiple of 8 sublanes, >= T)
        return -(-self.T // 8) * 8

    @property
    def Tout(self) -> int:  # valid pooled rows (torch floor semantics)
        return self.T // self.pt

    @property
    def Tpout(self) -> int:
        return self.Tp // self.pt

    @property
    def Gf(self) -> int:
        return _pick_group(self.F, self.Ci, self.Co)

    @property
    def Gg(self) -> int:  # GLU lane group
        return max(1, 128 // self.Co)

    @property
    def Lin(self) -> int:  # padded folded input lanes
        return (self.F + 2) * self.Ci

    @property
    def Lout(self) -> int:
        return self.F * self.Co


def _band_weight(w: jnp.ndarray, F: int, Gf: int) -> jnp.ndarray:
    """[3, 3, Ci, Co] -> banded group weight [3, (Gf+2)*Ci, Gf*Co].

    Wband[dt][(j + df)*Ci + ci, j*Co + co] = w[dt, df, ci, co], j in [0, Gf).
    The group weight is translation invariant: the same band serves every
    f-group when the input is lane-padded by Ci on each side.
    """
    three, three2, Ci, Co = w.shape
    assert three == 3 and three2 == 3
    band = jnp.zeros((3, (Gf + 2) * Ci, Gf * Co), w.dtype)
    for j in range(Gf):
        for df in range(3):
            band = band.at[
                :, (j + df) * Ci : (j + df + 1) * Ci, j * Co : (j + 1) * Co
            ].set(w[:, df])
    return band


def _band_to_w(dband: jnp.ndarray, F: int, Gf: int, Ci: int, Co: int):
    """Adjoint of _band_weight: [3, (Gf+2)Ci, Gf*Co] -> [3, 3, Ci, Co]."""
    d = dband.reshape(3, Gf + 2, Ci, Gf, Co)
    out = []
    for df in range(3):
        # sum_j d[:, j+df, :, j, :]
        diag = jnp.diagonal(d, offset=-df, axis1=1, axis2=3)  # [3, Ci, Co, Gf]
        out.append(diag.sum(-1))
    return jnp.stack(out, axis=1)  # [3, 3, Ci, Co]


def _glu_group_weight(wg: jnp.ndarray, G: int) -> jnp.ndarray:
    """[C, C] -> block-diag [G*C, G*C] with G copies (full-width MXU GLU)."""
    C = wg.shape[0]
    out = jnp.zeros((G * C, G * C), wg.dtype)
    for g in range(G):
        out = out.at[g * C : (g + 1) * C, g * C : (g + 1) * C].set(wg)
    return out


def _group_to_wg(dwgg: jnp.ndarray, G: int, C: int) -> jnp.ndarray:
    d = dwgg.reshape(G, C, G, C)
    return jnp.einsum("gcgd->cd", d) if G > 1 else dwgg

# --------------------------------------------------------------------------
# kernel A: conv3x3 (banded group matmuls) + bias + masked stats
# --------------------------------------------------------------------------


def _conv_stats_kernel(x_ref, w_ref, b_ref, y_ref, s_ref, q_ref, acc,
                       *, dims: BlockDims):
    b = pl.program_id(0)
    Tp, T, F, Ci, Co, Gf = dims.Tp, dims.T, dims.F, dims.Ci, dims.Co, dims.Gf
    Lout = dims.Lout
    x = x_ref[0]  # [Tp + 2, Lin]
    bias = b_ref[0]  # [Lout]

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
    valid = rows < T  # [Tp, 1]

    ngroups = F // Gf
    gw = Gf * Co
    gk = (Gf + 2) * Ci
    for g in range(ngroups):
        accum = None
        for dt in range(3):
            c0 = g * Gf * Ci
            xg = x[dt : dt + Tp, c0 : c0 + gk]
            part = jnp.dot(xg, w_ref[dt],
                           preferred_element_type=jnp.float32)
            accum = part if accum is None else accum + part
        yg32 = accum + bias[g * gw : (g + 1) * gw].astype(jnp.float32)
        yg = yg32.astype(y_ref.dtype)
        y_ref[0, :, g * gw : (g + 1) * gw] = yg
        ygm = jnp.where(valid, yg.astype(jnp.float32), 0.0)
        acc[0, g * gw : (g + 1) * gw] += jnp.sum(ygm, axis=0)
        acc[1, g * gw : (g + 1) * gw] += jnp.sum(ygm * ygm, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        s_ref[0] = acc[0]
        q_ref[0] = acc[1]


def _conv_stats_bwd_kernel(x_ref, y_ref, dy_ref, ds_ref, dq_ref,
                           wt_ref, dx_ref, dw_ref, db_ref,
                           accw, accb, *, dims: BlockDims):
    """dx (banded transposed conv), dW bands, dbias — one fused pass."""
    b = pl.program_id(0)
    Tp, T, F, Ci, Co, Gf = dims.Tp, dims.T, dims.F, dims.Ci, dims.Co, dims.Gf
    GfB = _pick_group(F, Co, Ci)
    Lout = dims.Lout

    @pl.when(b == 0)
    def _():
        accw[...] = jnp.zeros_like(accw)
        accb[...] = jnp.zeros_like(accb)

    rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
    valid = rows < T

    y = y_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    ds = ds_ref[0].astype(jnp.float32)   # [Lout]
    dq = dq_ref[0].astype(jnp.float32)
    dy_eff = jnp.where(valid, dy + ds[None, :] + 2.0 * y * dq[None, :], 0.0)
    dyc = dy_eff.astype(x_ref.dtype)

    # dbias (per folded lane; folded->channel sum happens in glue)
    accb[0] += jnp.sum(dy_eff, axis=0)

    # dW bands: accw[dt] += x[dt:dt+Tp, g cols]^T @ dy_eff[:, g cols]
    x = x_ref[0]
    gw = Gf * Co
    gk = (Gf + 2) * Ci
    for dt in range(3):
        for g in range(F // Gf):
            c0 = g * Gf * Ci
            xg = x[dt : dt + Tp, c0 : c0 + gk]
            accw[dt] += jax.lax.dot_general(
                xg, dyc[:, g * gw : (g + 1) * gw],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # dx: transposed conv = banded group matmuls of row/lane-padded dy_eff
    dyp = jnp.pad(dyc, ((2, 2), (Co, Co)))  # [Tp+4, (F+2)*Co]
    gwB = GfB * Ci
    gkB = (GfB + 2) * Co
    for g in range(F // GfB):
        accum = None
        for dtp in range(3):
            c0 = g * GfB * Co
            dg = dyp[dtp : dtp + Tp + 2, c0 : c0 + gkB]
            part = jnp.dot(dg, wt_ref[dtp],
                           preferred_element_type=jnp.float32)
            accum = part if accum is None else accum + part
        dx_ref[0, :, Ci + g * gwB : Ci + (g + 1) * gwB] = accum.astype(dx_ref.dtype)

    # lane padding columns of dxpad (constants): zero
    dx_ref[0, :, :Ci] = jnp.zeros((Tp + 2, Ci), dx_ref.dtype)
    dx_ref[0, :, Ci + F * Ci :] = jnp.zeros(
        (Tp + 2, dims.Lin - Ci - F * Ci), dx_ref.dtype
    )

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = accw[...]
        db_ref[0] = accb[0]

# --------------------------------------------------------------------------
# kernel B: BN-apply + GLU (lane-grouped) + dropout + T-pool
# --------------------------------------------------------------------------


def _glu_lin(ybn, wgg_ref, bg, Lout):
    """lin = blockdiag-GLU dense via full-width lane groups."""
    L128 = wgg_ref.shape[0]
    parts = []
    for j in range(Lout // L128):
        blk = ybn[:, j * L128 : (j + 1) * L128]
        parts.append(jnp.dot(blk, wgg_ref[...],
                             preferred_element_type=jnp.float32))
    lin = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return lin + bg[None, :] if bg.ndim == 1 else lin + bg


def _epilogue_kernel(y_ref, sc_ref, bi_ref, wgg_ref, bg_ref, bits_ref,
                     p_ref, q_ref, o_ref, *, dims: BlockDims,
                     keep_thresh: int, inv_keep: float):
    Tp, T, pt, Lout = dims.Tp, dims.T, dims.pt, dims.Lout
    y = y_ref[0].astype(jnp.float32)
    sc = sc_ref[0].astype(jnp.float32)
    bi = bi_ref[0].astype(jnp.float32)
    ybn = y * sc[None, :] + bi[None, :]
    lin = _glu_lin(ybn.astype(y_ref.dtype).astype(jnp.float32),
                   wgg_ref, bg_ref[0].astype(jnp.float32), Lout)
    z = lin * jax.nn.sigmoid(ybn)
    if bits_ref is not None:
        # int32 compare: v5e Mosaic lacks unsigned 8-bit vector compares
        bits = bits_ref[0].astype(jnp.int32)
        z = jnp.where(bits < keep_thresh, z * inv_keep, 0.0)
    # T-pool (window == stride == pt) as a tiny MXU matmul P @ z — Mosaic
    # rejects strided sublane slices (strides confined to [1, 2))
    if p_ref is not None:
        z = jnp.dot(p_ref[...], z, preferred_element_type=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (dims.Tpout, 1), 0)
    z = jnp.where(rows < dims.Tout, z, 0.0)
    if q_ref is not None:  # in-kernel F-pool: lane-averaging matmul z @ Q
        z = jnp.dot(z, q_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = z.astype(o_ref.dtype)


def _epilogue_bwd_kernel(y_ref, sc_ref, bi_ref, wgg_ref, bg_ref, bits_ref,
                         p_ref, q_ref, g_ref, dy_ref, dsc_ref, dbi_ref,
                         dwgg_ref, dbg_ref, accs, accwg, *, dims: BlockDims,
                         keep_thresh: int, inv_keep: float):
    b = pl.program_id(0)
    Tp, T, pt, Lout = dims.Tp, dims.T, dims.pt, dims.Lout
    L128 = wgg_ref.shape[0]

    @pl.when(b == 0)
    def _():
        accs[...] = jnp.zeros_like(accs)
        accwg[...] = jnp.zeros_like(accwg)

    y = y_ref[0].astype(jnp.float32)
    sc = sc_ref[0].astype(jnp.float32)
    bi = bi_ref[0].astype(jnp.float32)
    ybn = y * sc[None, :] + bi[None, :]
    ybn_c = ybn.astype(y_ref.dtype).astype(jnp.float32)
    lin = _glu_lin(ybn_c, wgg_ref, bg_ref[0].astype(jnp.float32), Lout)
    s = jax.nn.sigmoid(ybn)

    # incoming grad: mask invalid pooled rows, unpool over F then T
    g = g_ref[0].astype(jnp.float32)
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (dims.Tpout, 1), 0)
    g = jnp.where(rows_o < dims.Tout, g, 0.0)
    if q_ref is not None:  # F-unpool = g @ Q^T (Q already carries the 1/pf)
        g = jax.lax.dot_general(
            g, q_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if p_ref is not None:  # unpool = P^T @ g (P already carries the 1/pt)
        g = jax.lax.dot_general(
            p_ref[...], g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if bits_ref is not None:
        bits = bits_ref[0].astype(jnp.int32)
        g = jnp.where(bits < keep_thresh, g * inv_keep, 0.0)

    dlin = g * s
    # dybn = dlin @ WgG^T + g * lin * s * (1 - s)
    parts = []
    for j in range(Lout // L128):
        blk = dlin[:, j * L128 : (j + 1) * L128]
        parts.append(jax.lax.dot_general(
            blk, wgg_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        accwg[...] += jax.lax.dot_general(
            ybn_c[:, j * L128 : (j + 1) * L128].astype(y_ref.dtype), blk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dglu = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    dybn = dglu + g * lin * s * (1.0 - s)

    dy_ref[0] = (dybn * sc[None, :]).astype(dy_ref.dtype)
    accs[0] += jnp.sum(dybn * y, axis=0)
    accs[1] += jnp.sum(dybn, axis=0)
    accs[2] += jnp.sum(dlin, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dsc_ref[0] = accs[0]
        dbi_ref[0] = accs[1]
        dbg_ref[0] = accs[2]
        dwgg_ref[...] = accwg[...]

# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJPs
# --------------------------------------------------------------------------


def _vspec(shape, imap):
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _const2(shape):
    return _vspec(shape, lambda b: (0, 0))


def _const3(shape):
    return _vspec(shape, lambda b: (0, 0, 0))


def _per_b(shape):
    return _vspec(shape, lambda b: (b, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_bn_stats(xpad, w, bias, dims: BlockDims, interpret: bool = False):
    """Banded conv3x3 + bias + masked per-lane sum/sumsq.

    xpad: [B, Tp+2, (F+2)*Ci] (zero row/lane padding), w: [3, 3, Ci, Co],
    bias: [Co]. Returns y [B, Tp, F*Co], sums [F*Co] f32, sumsq [F*Co] f32
    (over the T valid rows of every clip).
    """
    y, s, q = _conv_bn_stats_fwd_impl(xpad, w, bias, dims, interpret)
    return y, s, q


def _conv_bn_stats_fwd_impl(xpad, w, bias, dims, interpret):
    wband = _band_weight(w, dims.F, dims.Gf).astype(xpad.dtype)
    bias_f = jnp.tile(bias, dims.F).reshape(1, dims.Lout).astype(xpad.dtype)
    gk, gw = (dims.Gf + 2) * dims.Ci, dims.Gf * dims.Co
    y, s, q = pl.pallas_call(
        functools.partial(_conv_stats_kernel, dims=dims),
        grid=(dims.B,),
        in_specs=[
            _per_b((1, dims.Tp + 2, dims.Lin)),
            _const3((3, gk, gw)),
            _const2((1, dims.Lout)),
        ],
        out_specs=[
            _per_b((1, dims.Tp, dims.Lout)),
            _const2((1, dims.Lout)),
            _const2((1, dims.Lout)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dims.B, dims.Tp, dims.Lout), xpad.dtype),
            jax.ShapeDtypeStruct((1, dims.Lout), jnp.float32),
            jax.ShapeDtypeStruct((1, dims.Lout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, dims.Lout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xpad, wband, bias_f)
    return y, s[0], q[0]


def _conv_bn_stats_fwd(xpad, w, bias, dims, interpret):
    y, s, q = _conv_bn_stats_fwd_impl(xpad, w, bias, dims, interpret)
    return (y, s, q), (xpad, w, y)


def _conv_bn_stats_bwd(dims, interpret, res, cots):
    xpad, w, y = res
    dy, ds, dq = cots
    GfB = _pick_group(dims.F, dims.Co, dims.Ci)
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # [3, 3, Co, Ci]
    wtband = _band_weight(wt, dims.F, GfB).astype(xpad.dtype)
    gk, gw = (dims.Gf + 2) * dims.Ci, dims.Gf * dims.Co
    gkB, gwB = (GfB + 2) * dims.Co, GfB * dims.Ci
    dxpad, dwband, dbias_f = pl.pallas_call(
        functools.partial(_conv_stats_bwd_kernel, dims=dims),
        grid=(dims.B,),
        in_specs=[
            _per_b((1, dims.Tp + 2, dims.Lin)),
            _per_b((1, dims.Tp, dims.Lout)),
            _per_b((1, dims.Tp, dims.Lout)),
            _const2((1, dims.Lout)),
            _const2((1, dims.Lout)),
            _const3((3, gkB, gwB)),
        ],
        out_specs=[
            _per_b((1, dims.Tp + 2, dims.Lin)),
            _const3((3, gk, gw)),
            _const2((1, dims.Lout)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dims.B, dims.Tp + 2, dims.Lin), xpad.dtype),
            jax.ShapeDtypeStruct((3, gk, gw), jnp.float32),
            jax.ShapeDtypeStruct((1, dims.Lout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, gk, gw), jnp.float32),
            pltpu.VMEM((1, dims.Lout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xpad, y, dy, ds.reshape(1, -1), dq.reshape(1, -1), wtband)
    dw = _band_to_w(dwband, dims.F, dims.Gf, dims.Ci, dims.Co).astype(w.dtype)
    dbias = dbias_f.reshape(dims.F, dims.Co).sum(0).astype(w.dtype)
    return dxpad, dw, dbias


conv_bn_stats.defvjp(_conv_bn_stats_fwd, _conv_bn_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def glu_drop_pool(y, scale_f, bias_f, wg, bg, bits,
                  dims: BlockDims, keep_prob: float, interpret: bool = False,
                  fpool: bool = False):
    """BN-apply + GLU + (optional) dropout + T-pool (+ optional F-pool).

    y: [B, Tp, F*Co]; scale_f/bias_f: [1, F*Co] fp32 (per-lane BN affine);
    wg/bg: GLU dense [Co, Co]/[Co]; bits: uint8 [B, Tp, F*Co] or None.
    Returns z [B, Tp//pt, F*Co] with rows >= T//pt zeroed — or, with
    fpool=True (requires pf > 1 and F % pf == 0), the F-pool runs in-kernel
    as a lane matmul and z is [B, Tp//pt, (F//pf)*Co].
    """
    return _glu_drop_pool_impl(y, scale_f, bias_f, wg, bg, bits,
                               dims, keep_prob, interpret, fpool)


def _pool_matrix(dims) -> jnp.ndarray | None:
    """[Tpout, Tp] fp32 averaging matrix for the T-pool (None when pt == 1).

    Mosaic rejects strided sublane slices, so the in-kernel pool/unpool is a
    tiny full-width MXU matmul (P @ z forward, P^T @ g backward)."""
    if dims.pt == 1:
        return None
    P = np.zeros((dims.Tpout, dims.Tp), np.float32)
    for r in range(dims.Tpout):
        P[r, r * dims.pt : (r + 1) * dims.pt] = 1.0 / dims.pt
    return jnp.asarray(P)


def _fpool_matrix(dims) -> jnp.ndarray | None:
    """[Lout, (F//pf)*Co] fp32 lane-averaging matrix for an in-kernel F-pool.

    Lanes are f-major (lane f*Co + c), so the F-pool is a structured linear
    map on the lane axis: out[:, fo*Co + c] = mean_j z[:, (fo*pf + j)*Co + c]
    — expressed as z @ Q on the MXU (the lanes of one output block are
    non-contiguous in the input, so no slice-based form exists). None when
    pf == 1 or F is not divisible by pf (the XLA reshape-mean handles those).
    """
    if dims.pf == 1 or dims.F % dims.pf:
        return None
    Fo, Co, pf = dims.F // dims.pf, dims.Co, dims.pf
    Q = np.zeros((dims.Lout, Fo * Co), np.float32)
    fo = np.repeat(np.arange(Fo), pf * Co)
    j = np.tile(np.repeat(np.arange(pf), Co), Fo)
    c = np.tile(np.arange(Co), Fo * pf)
    Q[(fo * pf + j) * Co + c, fo * Co + c] = 1.0 / pf
    return jnp.asarray(Q)


def _epilogue_specs(dims, has_bits, has_pool, wgL, lf=None):
    in_specs = [
        _per_b((1, dims.Tp, dims.Lout)),
        _const2((1, dims.Lout)),
        _const2((1, dims.Lout)),
        _const2((wgL, wgL)),
        _const2((1, dims.Lout)),
    ]
    if has_bits:
        in_specs.append(_per_b((1, dims.Tp, dims.Lout)))
    if has_pool:
        in_specs.append(_const2((dims.Tpout, dims.Tp)))
    if lf is not None:
        in_specs.append(_const2((dims.Lout, lf)))
    return in_specs


def _epi_fwd_dispatch(*refs, has_bits, has_pool, has_fpool, **kw):
    it = iter(refs)
    y, sc, bi, wgg, bg = (next(it) for _ in range(5))
    bits = next(it) if has_bits else None
    p = next(it) if has_pool else None
    q = next(it) if has_fpool else None
    o = next(it)
    _epilogue_kernel(y, sc, bi, wgg, bg, bits, p, q, o, **kw)


def _epi_bwd_dispatch(*refs, has_bits, has_pool, has_fpool, **kw):
    it = iter(refs)
    y, sc, bi, wgg, bg = (next(it) for _ in range(5))
    bits = next(it) if has_bits else None
    p = next(it) if has_pool else None
    q = next(it) if has_fpool else None
    g, dy, dsc, dbi, dwgg, dbg, accs, accwg = (next(it) for _ in range(8))
    _epilogue_bwd_kernel(y, sc, bi, wgg, bg, bits, p, q, g,
                         dy, dsc, dbi, dwgg, dbg, accs, accwg, **kw)


def _glu_drop_pool_impl(y, scale_f, bias_f, wg, bg, bits,
                        dims, keep_prob, interpret, fpool=False):
    wgL = dims.Gg * dims.Co
    wgg = _glu_group_weight(wg, dims.Gg).astype(y.dtype)
    bg_f = jnp.tile(bg, dims.F).reshape(1, dims.Lout).astype(jnp.float32)
    thresh = min(int(round(keep_prob * 256)), 255) if keep_prob < 1.0 else 256
    P = _pool_matrix(dims)
    Q = _fpool_matrix(dims) if fpool else None
    lout = Q.shape[1] if Q is not None else dims.Lout
    kernel = functools.partial(
        _epi_fwd_dispatch, has_bits=bits is not None, has_pool=P is not None,
        has_fpool=Q is not None,
        dims=dims, keep_thresh=thresh, inv_keep=1.0 / keep_prob,
    )
    args = [y, scale_f, bias_f, wgg, bg_f]
    if bits is not None:
        args.append(bits)
    if P is not None:
        args.append(P)
    if Q is not None:
        args.append(Q)
    z = pl.pallas_call(
        kernel,
        grid=(dims.B,),
        in_specs=_epilogue_specs(dims, bits is not None, P is not None, wgL,
                                 lf=None if Q is None else lout),
        out_specs=_per_b((1, dims.Tpout, lout)),
        out_shape=jax.ShapeDtypeStruct((dims.B, dims.Tpout, lout), y.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return z


def _glu_drop_pool_fwd(y, scale_f, bias_f, wg, bg, bits,
                       dims, keep_prob, interpret, fpool=False):
    z = _glu_drop_pool_impl(y, scale_f, bias_f, wg, bg, bits,
                            dims, keep_prob, interpret, fpool)
    return z, (y, scale_f, bias_f, wg, bg, bits)


def _glu_drop_pool_bwd(dims, keep_prob, interpret, fpool, res, g):
    y, scale_f, bias_f, wg, bg, bits = res
    wgL = dims.Gg * dims.Co
    wgg = _glu_group_weight(wg, dims.Gg).astype(y.dtype)
    bg_f = jnp.tile(bg, dims.F).reshape(1, dims.Lout).astype(jnp.float32)
    thresh = min(int(round(keep_prob * 256)), 255) if keep_prob < 1.0 else 256
    P = _pool_matrix(dims)
    Q = _fpool_matrix(dims) if fpool else None
    lf = Q.shape[1] if Q is not None else None
    kernel = functools.partial(
        _epi_bwd_dispatch, has_bits=bits is not None, has_pool=P is not None,
        has_fpool=Q is not None,
        dims=dims, keep_thresh=thresh, inv_keep=1.0 / keep_prob,
    )
    args = [y, scale_f, bias_f, wgg, bg_f]
    if bits is not None:
        args.append(bits)
    if P is not None:
        args.append(P)
    if Q is not None:
        args.append(Q)
    args.append(g)
    in_specs = _epilogue_specs(dims, bits is not None, P is not None, wgL,
                               lf=lf) + [
        _per_b((1, dims.Tpout, lf if Q is not None else dims.Lout))
    ]
    dy, dsc, dbi, dwgg, dbg = pl.pallas_call(
        kernel,
        grid=(dims.B,),
        in_specs=in_specs,
        out_specs=[
            _per_b((1, dims.Tp, dims.Lout)),
            _const2((1, dims.Lout)),
            _const2((1, dims.Lout)),
            _const2((wgL, wgL)),
            _const2((1, dims.Lout)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dims.B, dims.Tp, dims.Lout), y.dtype),
            jax.ShapeDtypeStruct((1, dims.Lout), jnp.float32),
            jax.ShapeDtypeStruct((1, dims.Lout), jnp.float32),
            jax.ShapeDtypeStruct((wgL, wgL), jnp.float32),
            jax.ShapeDtypeStruct((1, dims.Lout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, dims.Lout), jnp.float32),
            pltpu.VMEM((wgL, wgL), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    dscale = dsc.reshape(1, -1)
    dbias = dbi.reshape(1, -1)
    dwg = _group_to_wg(dwgg, dims.Gg, dims.Co).astype(wg.dtype)
    dbg = dbg.reshape(dims.F, dims.Co).sum(0).astype(wg.dtype)
    return dy, dscale, dbias, dwg, dbg, None


glu_drop_pool.defvjp(_glu_drop_pool_fwd, _glu_drop_pool_bwd)

# --------------------------------------------------------------------------
# block-level glue: pad/fold -> conv+stats -> BN math -> epilogue -> F-pool
# --------------------------------------------------------------------------


def fused_glu_block(
    x: jnp.ndarray,        # [B, T, F, Ci]
    w: jnp.ndarray,        # [3, 3, Ci, Co]
    bias: jnp.ndarray,     # [Co]
    gamma: jnp.ndarray,    # [Co]
    beta: jnp.ndarray,     # [Co]
    ra_mean: jnp.ndarray,  # [Co] fp32 running stats
    ra_var: jnp.ndarray,   # [Co]
    wg: jnp.ndarray,       # [Co, Co] GLU dense
    bg: jnp.ndarray,       # [Co]
    *,
    pool: tuple[int, int],
    train: bool,
    dropout_rate: float = 0.0,
    dropout_key=None,
    eps: float = 1e-3,
    momentum: float = 0.01,
    interpret: bool = False,
    fpool_in_kernel: bool = False,
):
    """One CNN block: conv3x3(SAME) + BatchNorm + GLU + dropout + avgpool.

    Returns (z [B, T//pt, F//pf, Co], new_ra_mean, new_ra_var). Matches the
    flax chain in models/cnn.py (reference desed_task/nnet/CNN.py:66-98):
    biased batch variance, running update ra = m*ra + (1-m)*batch, torch
    floor pooling, PackedDropout uint8-threshold masks (PARITY.md #18).
    """
    B, T, F, Ci = x.shape
    Co = w.shape[-1]
    pt, pf = pool
    dims = BlockDims(B, T, F, Ci, Co, pt, pf)
    dt = x.dtype

    xf = x.reshape(B, T, F * Ci)
    xpad = jnp.pad(xf, ((0, 0), (1, 1 + dims.Tp - T), (Ci, Ci)))
    y, s, q = conv_bn_stats(xpad, w.astype(dt), bias.astype(dt), dims,
                            interpret)

    if train:
        n = B * T * F
        mean = s.reshape(F, Co).sum(0) / n
        var = q.reshape(F, Co).sum(0) / n - mean * mean
        new_mean = momentum * ra_mean + (1.0 - momentum) * jax.lax.stop_gradient(mean)
        new_var = momentum * ra_var + (1.0 - momentum) * jax.lax.stop_gradient(var)
    else:
        mean, var = ra_mean, ra_var
        new_mean, new_var = ra_mean, ra_var
    scale = gamma * jax.lax.rsqrt(var + eps)
    bias_bn = beta - mean * scale
    scale_f = jnp.tile(scale, F).reshape(1, dims.Lout).astype(jnp.float32)
    bias_f = jnp.tile(bias_bn, F).reshape(1, dims.Lout).astype(jnp.float32)

    bits = None
    keep = 1.0
    if train and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        bits = jax.random.bits(
            dropout_key, (B, dims.Tp, dims.Lout), jnp.uint8
        )
    fpool = fpool_in_kernel and pf > 1 and F % pf == 0
    z = glu_drop_pool(y, scale_f, bias_f, wg.astype(dt), bg.astype(dt),
                      bits, dims, keep, interpret, fpool)
    if fpool:
        return (z[:, : dims.Tout].reshape(B, dims.Tout, F // pf, Co),
                new_mean, new_var)
    z = z[:, : dims.Tout].reshape(B, dims.Tout, F, Co)
    if pf > 1:
        z = z.reshape(B, dims.Tout, F // pf, pf, Co).mean(3, dtype=jnp.float32)
        z = z.astype(dt)
    return z, new_mean, new_var
