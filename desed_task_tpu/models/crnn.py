"""CRNN sound-event-detection model (flax.linen).

TPU-first re-design of desed_task/nnet/CRNN.py (CRNN :11-323): log-mel input
-> (train-only SpecAugment) -> CNN stack -> optional frozen-pretrained
embedding fusion (global/frame/interpolate/pool1d aggregation, CRNN.py:246-283)
-> optional recurrent dropstep masking -> bidirectional GRU -> per-frame
sigmoid "strong" head + class-axis-softmax attention-pooled "weak" head with
pad and class-validity masking at -1e30 (CRNN.py:152-177). Multi-head variant
(list-typed nclass) concatenates per-dataset heads (CRNN.py:183-198).

Intentional divergences from the reference (documented, both are latent bugs
there that its shipped configs never hit):
  * "global" embedding aggregation is fused through the same single
    cat_tf(dropout(cat(x, emb))) path as the other modes; the reference's
    second fusion block would hit an undefined `reshape_emb` (CRNN.py:285-301).
  * the multi-head + attention combination allocates its per-head softmax
    dense list correctly (reference appends to a never-created ModuleList,
    CRNN.py:112-115).

Layouts: features enter as [B, n_mels, T] (reference layout); internally NHWC.
Outputs: strong [B, C, T'], weak [B, C] — same as reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.augment import specaugment, time_mask
from .cnn import CNN
from .rnn import BidirectionalGRU


def _adaptive_avg_pool_matrix(in_len: int, out_len: int) -> np.ndarray:
    """[in_len, out_len] averaging matrix == torch adaptive_avg_pool1d."""
    m = np.zeros((in_len, out_len))
    for i in range(out_len):
        a = (i * in_len) // out_len
        b = -((-(i + 1) * in_len) // out_len)  # ceil
        m[a:b, i] = 1.0 / (b - a)
    return m


def _nearest_exact_indices(in_len: int, out_len: int) -> np.ndarray:
    """Gather indices == torch F.interpolate(mode='nearest-exact')."""
    scale = in_len / out_len
    idx = np.floor((np.arange(out_len) + 0.5) * scale).astype(np.int64)
    return np.clip(idx, 0, in_len - 1)


class CRNN(nn.Module):
    n_in_channel: int = 1
    nclass: Union[int, Sequence[int]] = 10
    attention: Union[bool, str] = True
    activation: str = "glu"
    dropout: float = 0.5
    rnn_type: str = "BGRU"
    n_RNN_cell: int = 128
    n_layers_RNN: int = 2
    rnn_layers: Optional[int] = None  # YAML alias for n_layers_RNN
    dropout_recurrent: float = 0.0
    cnn_integration: bool = False
    freeze_bn: bool = False
    use_embeddings: bool = False
    embedding_size: int = 527
    embedding_type: str = "global"
    frame_emb_enc_dim: int = 512
    aggregation_type: str = "global"
    specaugm_t_p: float = 0.2
    specaugm_t_l: int = 5
    specaugm_f_p: float = 0.2
    specaugm_f_l: int = 10
    # reproduce the reference's one-SpecAugment-mask-per-batch quirk
    # (PARITY #8; torchaudio 3-D fallback) for divergence-attribution A/Bs
    specaugm_shared: bool = False
    dropstep_recurrent: float = 0.0
    dropstep_recurrent_len: int = 5
    # CNN kwargs (reference forwards **kwargs to CNN)
    kernel_size: Sequence[int] = (3, 3, 3)
    padding: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    nb_filters: Sequence[int] = (64, 64, 64)
    pooling: Sequence[Sequence[int]] = ((1, 4), (1, 4), (1, 4))
    normalization: str = "batch"
    # computation dtype for the CNN stack (bf16 on TPU; fp32 default keeps
    # bit-parity with the reference). The RNN and heads stay fp32.
    compute_dtype: Any = None
    # bit-exact TPU-tiled conv paths with custom VJP (see models/cnn.py)
    fast_conv: Any = False
    # packed-bits conv-dropout masks (ops/dropout.py; exact for rate 0.5)
    packed_dropout: bool = True
    # fused Pallas conv-block kernels (ops/pallas_cnn.py); None = auto
    fused_blocks: Any = None
    # in-kernel F-pool for the fused blocks (models/cnn.py fused_fpool);
    # None = auto (on whenever the fused blocks run)
    fused_fpool: Any = None
    # Pallas BiGRU recurrence kernel (ops/pallas_gru.py); None = auto (TPU)
    rnn_pallas: Any = None

    @property
    def _n_layers(self) -> int:
        return self.rnn_layers if self.rnn_layers is not None else self.n_layers_RNN

    @property
    def _nb_in(self) -> int:
        nb_in = self.nb_filters[-1]
        if self.cnn_integration:
            nb_in = nb_in * self.n_in_channel
        return nb_in

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, n_mels, T] (or [B, n_chan, n_mels, T] w/ cnn_integration)
        pad_mask: Optional[jnp.ndarray] = None,  # [B, T'] True = padded frame
        embeddings: Optional[jnp.ndarray] = None,
        classes_mask: Optional[jnp.ndarray] = None,  # [B, C_total] True = valid
        train: bool = False,
    ):
        if train and (self.specaugm_t_p > 0 or self.specaugm_f_p > 0):
            x = specaugment(
                self.make_rng("augment"),
                x,
                self.specaugm_t_l,
                self.specaugm_t_p,
                self.specaugm_f_l,
                self.specaugm_f_p,
                shared=self.specaugm_shared,
            )

        # [B, n_mels, T] -> NHWC [B, T, n_mels, 1]
        if self.cnn_integration:
            bs_in, nc_in = x.shape[0], x.shape[1]
            x = x.reshape(bs_in * nc_in, *x.shape[2:])
        x = jnp.swapaxes(x, -1, -2)[..., None]

        bn_train = train and not self.freeze_bn
        x = CNN(
            n_in_channel=1 if self.cnn_integration else self.n_in_channel,
            activation=self.activation,
            conv_dropout=self.dropout,
            kernel_size=self.kernel_size,
            padding=self.padding,
            stride=self.stride,
            nb_filters=self.nb_filters,
            pooling=self.pooling,
            normalization=self.normalization,
            dtype=self.compute_dtype,
            fast_conv=self.fast_conv,
            packed_dropout=self.packed_dropout,
            fused_blocks=self.fused_blocks,
            fused_fpool=self.fused_fpool,
            name="cnn",
        )(x, train=bn_train)
        x = x.astype(jnp.float32)

        # [B, T', F', C]
        bs, frames, freq, chan = x.shape
        if self.cnn_integration:
            x = x.reshape(bs_in, nc_in, frames, freq, chan)
            x = jnp.moveaxis(x, 1, -1).reshape(bs_in, frames, freq, chan * nc_in)
            bs, chan = bs_in, chan * nc_in
        if freq != 1:
            x = x.reshape(bs, frames, freq * chan)
        else:
            x = x[:, :, 0, :]  # [B, T', C]

        dropout = nn.Dropout(self.dropout, deterministic=not train)

        if self.use_embeddings:
            reshape_emb = self._aggregate_embeddings(embeddings, frames)
            if self.dropstep_recurrent > 0 and train:
                k1, k2 = (
                    self.make_rng("augment"),
                    self.make_rng("augment"),
                )
                x = time_mask(
                    k1, x, self.dropstep_recurrent_len, self.dropstep_recurrent, axis=1
                )
                reshape_emb = time_mask(
                    k2,
                    reshape_emb,
                    self.dropstep_recurrent_len,
                    self.dropstep_recurrent,
                    axis=1,
                )
            x = nn.Dense(self._nb_in, name="cat_tf")(
                dropout(jnp.concatenate([x, reshape_emb], axis=-1))
            )
        else:
            if self.dropstep_recurrent > 0 and train:
                x = time_mask(
                    self.make_rng("augment"),
                    x,
                    self.dropstep_recurrent_len,
                    self.dropstep_recurrent,
                    axis=1,
                )
                x = dropout(x)

        if self.rnn_type != "BGRU":
            raise NotImplementedError("Only BGRU supported for CRNN (as reference)")
        x = BidirectionalGRU(
            hidden=self.n_RNN_cell,
            num_layers=self._n_layers,
            dropout=self.dropout_recurrent,
            pallas_recurrence=self.rnn_pallas,
            name="rnn",
        )(x, train=train)
        x = dropout(x)

        return self._get_logits(x, pad_mask, classes_mask)

    # --- embedding fusion ---------------------------------------------------
    def _aggregate_embeddings(self, embeddings, n_frames):
        if embeddings is None:
            raise ValueError("use_embeddings=True but no embeddings passed")
        # stores may hold float16 (fp16 HDF5 embedding stores); promote here so
        # every consumer (train concat path and eval/predict) aggregates in f32
        embeddings = embeddings.astype(jnp.float32)
        agg = self.aggregation_type
        if agg == "global":
            # [B, E] -> shrink (Dense+LayerNorm) -> tile over frames
            emb = nn.Dense(self._nb_in, name="shrink_emb_dense")(embeddings)
            emb = nn.LayerNorm(name="shrink_emb_ln")(emb)
            return jnp.repeat(emb[:, None, :], n_frames, axis=1)
        if agg == "frame":
            # [B, E, F] -> BiGRU(frame_emb_enc_dim) over frames, take last step
            seq = jnp.swapaxes(embeddings, 1, 2)  # [B, F, E]
            enc = BidirectionalGRU(
                hidden=self.frame_emb_enc_dim, num_layers=1, name="frame_embs_encoder"
            )(seq)
            last = enc[:, -1]  # [B, 2*enc_dim]
            emb = nn.Dense(self._nb_in, name="shrink_emb_dense")(last)
            emb = nn.LayerNorm(name="shrink_emb_ln")(emb)
            return jnp.repeat(emb[:, None, :], n_frames, axis=1)
        if agg == "interpolate":
            idx = _nearest_exact_indices(embeddings.shape[-1], n_frames)
            return jnp.swapaxes(embeddings[..., idx], 1, 2)  # [B, T', E]
        if agg == "pool1d":
            m = jnp.asarray(
                _adaptive_avg_pool_matrix(embeddings.shape[-1], n_frames),
                embeddings.dtype,
            )
            pooled = jnp.einsum("bef,ft->bet", embeddings, m)
            return jnp.swapaxes(pooled, 1, 2)  # [B, T', E]
        raise NotImplementedError(f"aggregation_type {agg!r}")

    # --- prediction heads -----------------------------------------------------
    def _head(self, x, pad_mask, classes_mask, nclass, suffix=""):
        strong = nn.sigmoid(nn.Dense(nclass, name=f"dense{suffix}")(x))  # [B,T,C]
        invalid = None
        if classes_mask is not None:
            invalid = ~classes_mask[:, None, :]  # [B,1,C]
        if self.attention in (True, "legacy"):
            sof = nn.Dense(nclass, name=f"dense_softmax{suffix}")(x)  # [B,T,C]
            if pad_mask is not None:
                sof = jnp.where(pad_mask[:, :, None], -1e30, sof)
            if invalid is not None:
                sof = jnp.where(invalid, -1e30, sof)
            sof = nn.softmax(sof, axis=-1)  # softmax over CLASSES (reference)
            sof = jnp.clip(sof, 1e-7, 1.0)
            weak = (strong * sof).sum(axis=1) / sof.sum(axis=1)  # [B, C]
        else:
            weak = strong.mean(axis=1)
        if invalid is not None:
            strong = jnp.where(invalid, 0.0, strong)
            weak = jnp.where(~classes_mask, 0.0, weak)
        return jnp.swapaxes(strong, 1, 2), weak  # [B,C,T'], [B,C]

    def _get_logits(self, x, pad_mask, classes_mask):
        if isinstance(self.nclass, (tuple, list)) and len(self.nclass) > 1:
            strongs, weaks = [], []
            offset = 0
            for i, c in enumerate(self.nclass):
                # slice the global validity mask to this head's class range
                # (reference would broadcast-fail here; see module docstring)
                cm = (
                    classes_mask[:, offset : offset + c]
                    if classes_mask is not None
                    else None
                )
                offset += c
                s, w = self._head(x, pad_mask, cm, c, suffix=f"_{i}")
                strongs.append(s)
                weaks.append(w)
            return jnp.concatenate(strongs, axis=1), jnp.concatenate(weaks, axis=1)
        nclass = (
            self.nclass[0] if isinstance(self.nclass, (tuple, list)) else self.nclass
        )
        return self._head(x, pad_mask, classes_mask, nclass)
