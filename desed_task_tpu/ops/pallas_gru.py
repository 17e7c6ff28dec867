"""Pallas bidirectional-GRU recurrence kernel (hidden state resident in VMEM).

The lax.scan BiGRU (models/rnn.py) is latency-bound: each of the T=156 loop
iterations is a handful of tiny XLA kernels (a [B,H]x[H,3H] GEMM is ~0.1 us
of MXU time) whose fixed per-iteration overhead dominates — measured 2-3 ms
of the 32 ms train step (docs/performance.md "Remaining targets" #1).

This kernel runs the whole recurrence (BOTH directions) as ONE Pallas call
with a sequential (T,) grid: the hidden state and the recurrent weights stay
in VMEM scratch across grid steps, the per-step input gates stream in as
[1, 2, B, H] blocks, and each step is three small MXU matmuls + VPU gate
math. The backward pass is a second kernel walking the grid in reverse
(index_map T-1-i), recomputing gates from the saved hidden states (no extra
residuals beyond the forward outputs) and accumulating dW/db in fp32 VMEM
scratch written out at the last program.

Layout notes (Mosaic v5e):
  * gates are passed as three separate [T, 2, B, H] arrays — H=192 is not a
    multiple of 128, so in-kernel lane slicing of a packed [B, 3H] at
    H-offsets would be rejected; separate arrays avoid slicing entirely.
  * matmul operands need no alignment (Mosaic pads tiles); only slices do.
  * fp32 throughout (the CRNN casts to f32 before the RNN, crnn.py:148).

Gate math is torch.nn.GRU's r/z/n order — bit-compatible with the scan path
(equality-tested in tests/test_pallas_gru.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(xr, xz, xn, wr, wz, wn, br, bz, bn, y, h_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_s[...] = jnp.zeros_like(h_s)

    for d in range(2):
        h = h_s[d]
        hr = jnp.dot(h, wr[d], preferred_element_type=jnp.float32) + br[d]
        hz = jnp.dot(h, wz[d], preferred_element_type=jnp.float32) + bz[d]
        hn = jnp.dot(h, wn[d], preferred_element_type=jnp.float32) + bn[d]
        r = jax.nn.sigmoid(xr[0, d] + hr)
        z = jax.nn.sigmoid(xz[0, d] + hz)
        n = jnp.tanh(xn[0, d] + r * hn)
        hnew = (1.0 - z) * n + z * h
        h_s[d] = hnew
        y[0, d] = hnew


def _bwd_kernel(xr, xz, xn, wr, wz, wn, br, bz, bn, ys_prev, dy,
                dxr, dxz, dxn, dwr, dwz, dwn, dbr, dbz, dbn,
                dh_s, dwr_s, dwz_s, dwn_s, dbr_s, dbz_s, dbn_s):
    i = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - i  # time index this program handles

    @pl.when(i == 0)
    def _init():
        dh_s[...] = jnp.zeros_like(dh_s)
        dwr_s[...] = jnp.zeros_like(dwr_s)
        dwz_s[...] = jnp.zeros_like(dwz_s)
        dwn_s[...] = jnp.zeros_like(dwn_s)
        dbr_s[...] = jnp.zeros_like(dbr_s)
        dbz_s[...] = jnp.zeros_like(dbz_s)
        dbn_s[...] = jnp.zeros_like(dbn_s)

    first_step = t == 0
    for d in range(2):
        # h_{t-1}: the saved output of step t-1 (zeros at t == 0; the
        # ys_prev block is clamped to index 0 there, mask it out)
        h_prev = jnp.where(first_step, 0.0, ys_prev[0, d])
        hr = jnp.dot(h_prev, wr[d], preferred_element_type=jnp.float32) + br[d]
        hz = jnp.dot(h_prev, wz[d], preferred_element_type=jnp.float32) + bz[d]
        hn = jnp.dot(h_prev, wn[d], preferred_element_type=jnp.float32) + bn[d]
        r = jax.nn.sigmoid(xr[0, d] + hr)
        z = jax.nn.sigmoid(xz[0, d] + hz)
        n = jnp.tanh(xn[0, d] + r * hn)

        dh_tot = dh_s[d] + dy[0, d]
        dn = dh_tot * (1.0 - z)
        dz = dh_tot * (h_prev - n)
        dnin = dn * (1.0 - n * n)
        dr = dnin * hn
        dhn = dnin * r
        dzin = dz * z * (1.0 - z)
        drin = dr * r * (1.0 - r)

        contract_out = (((1,), (1,)), ((), ()))  # [B,H] x [H,H]^T -> [B,H]
        dh_prev = (
            dh_tot * z
            + jax.lax.dot_general(drin, wr[d], contract_out,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(dzin, wz[d], contract_out,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(dhn, wn[d], contract_out,
                                  preferred_element_type=jnp.float32)
        )
        contract_b = (((0,), (0,)), ((), ()))  # [B,H]^T x [B,H] -> [H,H]
        dwr_s[d] += jax.lax.dot_general(h_prev, drin, contract_b,
                                        preferred_element_type=jnp.float32)
        dwz_s[d] += jax.lax.dot_general(h_prev, dzin, contract_b,
                                        preferred_element_type=jnp.float32)
        dwn_s[d] += jax.lax.dot_general(h_prev, dhn, contract_b,
                                        preferred_element_type=jnp.float32)
        dbr_s[d] += jnp.sum(drin, axis=0)
        dbz_s[d] += jnp.sum(dzin, axis=0)
        dbn_s[d] += jnp.sum(dhn, axis=0)

        dh_s[d] = dh_prev
        dxr[0, d] = drin
        dxz[0, d] = dzin
        dxn[0, d] = dnin  # n = tanh(xn + r*hn): d/dxn is the pre-tanh grad

    @pl.when(i == T - 1)
    def _flush():
        dwr[...] = dwr_s[...]
        dwz[...] = dwz_s[...]
        dwn[...] = dwn_s[...]
        dbr[...] = dbr_s[...]
        dbz[...] = dbz_s[...]
        dbn[...] = dbn_s[...]


# trace-time switch for CPU tests (Pallas interpret mode); set
# `pallas_gru.INTERPRET = True` before building the jitted function
INTERPRET = False


@functools.partial(jax.custom_vjp)
def _bigru_core(xr, xz, xn, wr, wz, wn, br, bz, bn):
    return _bigru_core_fwd(xr, xz, xn, wr, wz, wn, br, bz, bn)[0]


def _run_fwd(xr, xz, xn, wr, wz, wn, br, bz, bn):
    T, two, B, H = xr.shape
    step_spec = pl.BlockSpec((1, 2, B, H), lambda t: (t, 0, 0, 0))
    full = lambda *s: pl.BlockSpec(s, lambda t: (0,) * len(s))
    return pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            step_spec, step_spec, step_spec,
            full(2, H, H), full(2, H, H), full(2, H, H),
            full(2, H), full(2, H), full(2, H),
        ],
        out_specs=step_spec,
        out_shape=jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(xr, xz, xn, wr, wz, wn, br, bz, bn)


def _bigru_core_fwd(xr, xz, xn, wr, wz, wn, br, bz, bn):
    ys = _run_fwd(xr, xz, xn, wr, wz, wn, br, bz, bn)
    return ys, (xr, xz, xn, wr, wz, wn, br, bz, bn, ys)


def _bigru_core_bwd(res, dy):
    xr, xz, xn, wr, wz, wn, br, bz, bn, ys = res
    T, two, B, H = xr.shape
    rev = lambda i: (T - 1 - i, 0, 0, 0)
    step_rev = pl.BlockSpec((1, 2, B, H), rev)
    prev_rev = pl.BlockSpec(
        (1, 2, B, H), lambda i: (jnp.maximum(T - 2 - i, 0), 0, 0, 0)
    )
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    out = pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[
            step_rev, step_rev, step_rev,
            full(2, H, H), full(2, H, H), full(2, H, H),
            full(2, H), full(2, H), full(2, H),
            prev_rev, step_rev,
        ],
        out_specs=[
            step_rev, step_rev, step_rev,
            full(2, H, H), full(2, H, H), full(2, H, H),
            full(2, H), full(2, H), full(2, H),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, H, H), jnp.float32),
            pltpu.VMEM((2, H, H), jnp.float32),
            pltpu.VMEM((2, H, H), jnp.float32),
            pltpu.VMEM((2, H), jnp.float32),
            pltpu.VMEM((2, H), jnp.float32),
            pltpu.VMEM((2, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(xr, xz, xn, wr, wz, wn, br, bz, bn, ys, dy)
    dxr, dxz, dxn, dwr, dwz, dwn, dbr, dbz, dbn = out
    return dxr, dxz, dxn, dwr, dwz, dwn, dbr, dbz, dbn


_bigru_core.defvjp(_bigru_core_fwd, _bigru_core_bwd)


def bigru_pallas(xg_f, xg_b, w_hh_f, b_hh_f, w_hh_b, b_hh_b):
    """Both GRU directions in one Pallas recurrence.

    xg_f/xg_b: [B, T, 3H] precomputed input gates (x @ W_ih^T + b_ih),
    torch gate order (r, z, n); xg_b is for the ORIGINAL time order (this
    function handles the reversal). w_hh_*: [3H, H] torch layout.
    Returns (fwd [B, T, H], bwd [B, T, H]) — same contract as
    models.rnn._bigru_fused_scan.
    """
    B, T, H3 = xg_f.shape
    H = H3 // 3

    def split3(a):
        return a[..., :H], a[..., H:2 * H], a[..., 2 * H:]

    def to_tm(a):  # [B, T, H] -> [T, B, H]
        return jnp.swapaxes(a, 0, 1)

    fr, fz, fn = split3(xg_f.astype(jnp.float32))
    br_, bz_, bn_ = split3(xg_b.astype(jnp.float32))
    # backward direction rides the grid on reversed time
    xr = jnp.stack([to_tm(fr), to_tm(br_)[::-1]], 1)  # [T, 2, B, H]
    xz = jnp.stack([to_tm(fz), to_tm(bz_)[::-1]], 1)
    xn = jnp.stack([to_tm(fn), to_tm(bn_)[::-1]], 1)

    def wsplit(w):  # [3H, H] -> ([H, H], [H, H], [H, H]) as h @ w layouts
        return w[:H].T, w[H:2 * H].T, w[2 * H:].T

    wr_f, wz_f, wn_f = wsplit(w_hh_f.astype(jnp.float32))
    wr_b, wz_b, wn_b = wsplit(w_hh_b.astype(jnp.float32))
    wr = jnp.stack([wr_f, wr_b])
    wz = jnp.stack([wz_f, wz_b])
    wn = jnp.stack([wn_f, wn_b])
    bhr_f, bhz_f, bhn_f = split3(b_hh_f.astype(jnp.float32))
    bhr_b, bhz_b, bhn_b = split3(b_hh_b.astype(jnp.float32))
    br = jnp.stack([bhr_f, bhr_b])
    bz = jnp.stack([bhz_f, bhz_b])
    bn = jnp.stack([bhn_f, bhn_b])

    ys = _bigru_core(xr, xz, xn, wr, wz, wn, br, bz, bn)  # [T, 2, B, H]
    fwd = jnp.swapaxes(ys[:, 0], 0, 1)
    bwd = jnp.swapaxes(ys[::-1, 1], 0, 1)
    return fwd, bwd
