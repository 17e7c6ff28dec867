"""Pallas TPU kernel: fused log-mel front-end.

One kernel fuses the whole chain the XLA path materializes in HBM
(frontend.py: frame slices -> windowed DFT GEMMs -> magnitude -> mel GEMM
-> log-dB): per grid step a frame tile is built in VMEM straight from the
audio (manual DMA of the overlapping sample span), multiplied against
freq-tiles of the windowed DFT basis on the MXU, magnitudes reduced into a
mel accumulator, and only the final [B, T, n_mels] log-mel block is written
back. HBM traffic drops from ~600 MB of intermediates (frames + re/im) to
audio-in + mel-out (~60 MB for B=60 10-s clips).

Grid: (batch_tiles, time_tiles, freq_tiles) with freq innermost; frames are
built once per (b, t) at f == 0 and the mel accumulator lives in scratch
across the freq loop (TPU grids execute sequentially, so scratch persists).

Compute dtype: bf16 GEMMs with fp32 accumulation (MelConfig.compute_dtype
"bfloat16") or full fp32.

Measured on v5e (B=60 10-s clips): 4.4 ms vs 3.6 ms for the XLA matmul path
— XLA already pipelines this chain well, and the in-kernel frame assembly
(8-way chunk interleave) eats the HBM-traffic savings. The kernel is kept as
an alternative backend and as the substrate for future fusion of the scaler
+ first conv; frontend.log_mel_spectrogram remains the default.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import MelConfig, _dft_basis, mel_filterbank

# tile sizes: TB batch rows x TT frames per step; freq in 128-wide tiles
TB = 8
TT = 64
TF = 128


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_log_mel(audio: jnp.ndarray, cfg: MelConfig, interpret: bool = False):
    """[B, N] waveform -> [B, n_mels, n_frames] log-mel dB.

    Semantically identical to frontend.log_mel_spectrogram (power=1 path).
    """
    assert cfg.power == 1.0, "pallas kernel implements the power=1 path"
    B, n = audio.shape
    hop = cfg.hop_length
    n_fft = cfg.n_fft
    n_frames = cfg.num_frames(n)
    n_mels = cfg.n_mels

    # center reflect pad on host graph (cheap, once)
    p = n_fft // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (p, p)), mode=cfg.pad_mode)

    # pad batch/time so the grid divides evenly
    Bp = _pad_to(B, TB)
    Tp = _pad_to(n_frames, TT)
    span = (TT - 1) * hop + n_fft  # samples needed for one time tile
    total_needed = (Tp - 1) * hop + n_fft
    x = jnp.pad(x, ((0, Bp - B), (0, max(0, total_needed - x.shape[1]))))

    # windowed DFT basis + mel weights, padded to TF multiples
    cos_b, sin_b = _dft_basis(cfg)
    fb = mel_filterbank(cfg)  # [n_freqs, n_mels]
    Fp = _pad_to(cos_b.shape[1], TF)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    cos_p = jnp.asarray(
        np.pad(cos_b, ((0, 0), (0, Fp - cos_b.shape[1]))), cdt
    )
    sin_p = jnp.asarray(
        np.pad(sin_b, ((0, 0), (0, Fp - sin_b.shape[1]))), cdt
    )
    Mp = _pad_to(n_mels, 128)
    fb_p = jnp.asarray(
        np.pad(fb, ((0, Fp - fb.shape[0]), (0, Mp - n_mels))), cdt
    )

    n_freq_tiles = Fp // TF
    grid = (Bp // TB, Tp // TT, n_freq_tiles)

    db_mult = 10.0 if cfg.power == 2.0 else 20.0
    db_shift = db_mult * math.log10(max(cfg.amin, 1.0))
    log10e = math.log10(math.e)

    def kernel(x_hbm, cos_ref, sin_ref, fb_ref, out_ref, frames, acc, sem):
        b, t, f = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(f == 0)
        def _build_frames():
            def body(audio_tile):
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(b * TB, TB), pl.ds(t * TT * hop, span)],
                    audio_tile,
                    sem,
                )
                dma.start()
                dma.wait()
                # frames[i, j] = audio_tile[i, j*hop : j*hop + n_fft]
                ratio = n_fft // hop
                chunks = audio_tile[:, : (span // hop) * hop].reshape(
                    TB, span // hop, hop
                )
                parts = [
                    chunks[:, k : k + TT].reshape(TB, TT, 1, hop)
                    for k in range(ratio)
                ]
                fr = jnp.concatenate(parts, axis=2).reshape(TB * TT, n_fft)
                frames[:] = fr.astype(cdt)

            pl.run_scoped(body, pltpu.VMEM((TB, span), jnp.float32))

        re = jnp.dot(frames[:], cos_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(frames[:], sin_ref[:], preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im)  # [TB*TT, TF]

        contrib = jnp.dot(
            mag.astype(cdt), fb_ref[:], preferred_element_type=jnp.float32
        )

        @pl.when(f == 0)
        def _init():
            acc[:] = contrib

        @pl.when(f > 0)
        def _accum():
            acc[:] = acc[:] + contrib

        @pl.when(f == n_freq_tiles - 1)
        def _finalize():
            mel = jnp.maximum(acc[:], cfg.amin)
            db = db_mult * (jnp.log(mel) * log10e) - db_shift
            if cfg.db_clamp_min is not None or cfg.db_clamp_max is not None:
                db = jnp.clip(db, cfg.db_clamp_min, cfg.db_clamp_max)
            out_ref[:] = db.reshape(TB, TT, Mp)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # audio stays in HBM
            pl.BlockSpec(
                (n_fft, TF), lambda b, t, f: (0, f), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft, TF), lambda b, t, f: (0, f), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TF, Mp), lambda b, t, f: (f, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TB, TT, Mp), lambda b, t, f: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, Mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB * TT, n_fft), cdt),
            pltpu.VMEM((TB * TT, Mp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, cos_p, sin_p, fb_p)

    return jnp.swapaxes(out[:B, :n_frames, :n_mels], 1, 2)
