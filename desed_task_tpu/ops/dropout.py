"""Packed-bits dropout masks (TPU throughput).

flax ``nn.Dropout`` draws a full uint32 word of entropy per element
(``jax.random.bernoulli`` -> uniform floats), so the seven conv-stack masks
of the 2024 CRNN cost ~170M words (~680 MB of RngBitGenerator output + HBM
round trip) per train-mode forward — measured ~5.6 ms/forward on v5e
(docs/performance.md).  A dropout decision only needs enough bits to compare
against the keep threshold: with ``bits=8`` each uint32 word yields FOUR
masks, cutting RBG work and the bits' HBM traffic 4x.  The byte-plane
expansion (shift / and / compare) is elementwise, so XLA fuses it into the
dropout multiply — nothing but the packed words ever materializes.

Semantics: keep probability is quantized to ``round(keep_prob * 2**bits) /
2**bits`` — EXACT for the reference configs' rate 0.5 (threshold 128/256) and
within 1/512 otherwise (PARITY.md).  Masks are deterministic per key, and the
backward pass reuses the identical mask (it is a constant of the jnp.where).

Reference: torch.nn.Dropout used by desed_task/nnet/CNN.py:60 (conv blocks).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def packed_keep_mask(key, shape, keep_prob: float, *, bits: int = 8):
    """Boolean keep-mask of `shape`, drawing `bits` bits of entropy/element.

    Implemented as a narrow-dtype threshold test: ``random.bits(uint8) <
    round(keep_prob * 256)``.  Measured on v5e (scripts/micro_dropout.py,
    bf16 [60, 626, 128, 16]): 1.9 ms vs 2.85 ms for jax.random.bernoulli
    under unsafe_rbg — i.e. indistinguishable from NO dropout (the pure
    read+write is 2.0 ms), because XLA fuses the narrow RBG + compare into
    the consuming multiply.  An explicit uint32-word bit-plane expansion was
    measured SLOWER (4.5 ms; 17 ms for 1-bit planes) — the manual
    shift/broadcast defeats fusion.  See docs/performance.md.
    """
    if not (0.0 < keep_prob <= 1.0):
        raise ValueError(f"keep_prob must be in (0, 1], got {keep_prob}")
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    dtype = jnp.uint8 if bits == 8 else jnp.uint16
    if keep_prob >= 1.0:
        return jnp.ones(shape, bool)
    thresh = min(int(round(keep_prob * (1 << bits))), (1 << bits) - 1)
    return jax.random.bits(key, shape, dtype) < dtype(thresh)


class PackedDropout(nn.Module):
    """Drop-in nn.Dropout replacement backed by packed_keep_mask.

    Output matches nn.Dropout's semantics: kept elements are scaled by
    1/keep_prob, dropped elements are zero; eval mode is the identity.
    """

    rate: float
    bits: int = 8
    rng_collection: str = "dropout"
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        # nn.merge_param raises when both sources are None — same contract as
        # flax nn.Dropout (a silent train-mode default would hide misuse)
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if self.rate == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.rate
        key = self.make_rng(self.rng_collection)
        keep = packed_keep_mask(key, x.shape, keep_prob, bits=self.bits)
        scale = jnp.asarray(1.0 / keep_prob, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
