"""BEATs audio transformer encoder (flax.linen), TPU-native.

Ground-up JAX implementation of the frozen BEATs embedder vendored by the
2023/2024 recipes (recipes/dcase2024_task4_baseline/local/beats/: BEATs.py
:83-208, backbone.py :23-700). Semantics matched:

  * Kaldi-fbank front-end (ops/kaldi.beats_preprocess), 16x16 patch embed
    conv (stride 16, no bias), LayerNorm(512), projection 512->768
    (BEATs.py:156-180).
  * Convolutional positional embedding: weight-normed Conv1d(768, 768,
    k=128, groups=16) + SamePad(remove last) + GELU, added residually
    (backbone.py:30-43, 117-120).
  * Post-pos-conv LayerNorm (layer_norm_first=False path, backbone.py:122).
  * 12 post-LN transformer layers with deep-norm residual scaling
    alpha=(2L)^(1/4) (backbone.py:226-284), GELU FFN 3072.
  * Attention with T5-style bucketed relative position bias (320 buckets,
    max distance 800) shared from layer 0 (backbone.py:75-84, 404-444), the
    max-subtraction alpha=32 stabilization trick (backbone.py:532-645), and
    gated relative position bias (gru_rel_pos): per-head gates from
    grep_linear over the scaled query (backbone.py:669-687).

The wrapper returns {"global": mean over tokens, "frame": [B, 768, T*F]}
exactly like BEATsModel.forward (BEATs.py:201-208). Inference is the only
supported mode (the reference trains nothing in BEATs either; e2e is
NotImplementedError there, sed_trainer_pretrained.py:303-314).
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kaldi import beats_preprocess


@dataclasses.dataclass(frozen=True)
class BEATsConfig:
    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    deep_norm: bool = True
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    dropout: float = 0.0  # inference-only: dropouts inactive

    @property
    def deep_norm_alpha(self) -> float:
        return math.pow(2 * self.encoder_layers, 1 / 4) if self.deep_norm else 1.0


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """T5 bidirectional relative position buckets (backbone.py:404-432)."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets  # [q_len, k_len]


class WeightNormConvPos(nn.Module):
    """Weight-normalized grouped Conv1d positional encoder.

    Parameters are stored exactly as torch weight_norm(dim=2) does:
    weight_v [C_out, C_in/g, K] and weight_g [1, 1, K], so reference
    checkpoints convert without renormalization.
    """

    dim: int
    kernel: int
    groups: int

    @nn.compact
    def __call__(self, x):  # x: [B, T, C]
        v = self.param(
            "weight_v",
            nn.initializers.normal(0.02),
            (self.dim, self.dim // self.groups, self.kernel),
        )
        g = self.param("weight_g", nn.initializers.ones, (1, 1, self.kernel))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        # ||v|| over all dims except dim=2 (per kernel position)
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        w = v * (g / norm)  # [C_out, C_in/g, K]
        # lax conv with feature_group_count; NCW layout
        x_ncw = jnp.swapaxes(x, 1, 2)
        pad = self.kernel // 2
        out = jax.lax.conv_general_dilated(
            x_ncw,
            w,
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
        )
        out = out + b[None, :, None]
        if self.kernel % 2 == 0:  # SamePad: drop trailing element
            out = out[..., :-1]
        return nn.gelu(jnp.swapaxes(out, 1, 2), approximate=False)


class BEATsSelfAttention(nn.Module):
    cfg: BEATsConfig
    has_relative_attention_bias: bool

    @nn.compact
    def __call__(self, x, pos_bias=None, padding_mask=None):
        cfg = self.cfg
        D = cfg.encoder_embed_dim
        H = cfg.encoder_attention_heads
        hd = D // H
        scaling = hd**-0.5
        alpha = 32.0

        q = nn.Dense(D, name="q_proj")(x)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)
        B, T, _ = x.shape
        # q scaled by scaling/alpha (backbone.py:532-534)
        q = q * (scaling / alpha)
        qh = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # [B, H, T, hd]
        kh = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        attn = (attn - attn.max(axis=-1, keepdims=True)) * alpha

        if self.has_relative_attention_bias and pos_bias is None:
            rel_bias = self.param(
                "relative_attention_bias",
                nn.initializers.normal(0.02),
                (cfg.num_buckets, H),
            )
            buckets = relative_position_buckets(
                T, T, cfg.num_buckets, cfg.max_distance
            )
            pos_bias = rel_bias[buckets].transpose(2, 0, 1)  # [H, T, T]

        if pos_bias is not None:
            bias = jnp.broadcast_to(pos_bias[None], (B, H, T, T))
            if cfg.gru_rel_pos:
                grep_a = self.param(
                    "grep_a", nn.initializers.ones, (1, H, 1, 1)
                )
                # gates from the unscaled query (q * alpha / scaling undoes
                # the earlier scaling, backbone.py:672-676)
                query_layer = qh * (alpha / scaling)
                gates = nn.Dense(8, name="grep_linear")(query_layer)
                gates = jax.nn.sigmoid(
                    gates.reshape(B, H, T, 2, 4).sum(-1)
                )  # [B, H, T, 2]
                gate_a = gates[..., 0:1]  # [B, H, T, 1]
                gate_b = gates[..., 1:2]
                gate_a_1 = gate_a * (gate_b * grep_a[..., 0:1] - 1.0) + 2.0
                bias = gate_a_1 * pos_bias[None]  # [B,H,T,1] * [1,H,T,T]
            attn = attn + bias

        if padding_mask is not None:
            attn = jnp.where(padding_mask[:, None, None, :], -jnp.inf, attn)
        probs = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out), pos_bias


class BEATsLayer(nn.Module):
    cfg: BEATsConfig
    has_relative_attention_bias: bool

    @nn.compact
    def __call__(self, x, pos_bias=None, padding_mask=None):
        cfg = self.cfg
        a = cfg.deep_norm_alpha
        residual = x
        attn_out, pos_bias = BEATsSelfAttention(
            cfg, self.has_relative_attention_bias, name="self_attn"
        )(x, pos_bias, padding_mask)
        if cfg.layer_norm_first:
            raise NotImplementedError("BEATs released checkpoints are post-LN")
        x = residual * a + attn_out
        x = nn.LayerNorm(name="self_attn_layer_norm")(x)
        residual = x
        h = nn.Dense(cfg.encoder_ffn_embed_dim, name="fc1")(x)
        if cfg.activation_fn == "gelu":
            h = nn.gelu(h, approximate=False)
        elif cfg.activation_fn == "relu":
            h = nn.relu(h)
        else:
            raise NotImplementedError(cfg.activation_fn)
        h = nn.Dense(cfg.encoder_embed_dim, name="fc2")(h)
        x = residual * a + h
        x = nn.LayerNorm(name="final_layer_norm")(x)
        return x, pos_bias


class BEATsTransformer(nn.Module):
    """The TransformerEncoder part (backbone.py:23-159): conv positional
    embedding + post LayerNorm + the layer stack with shared layer-0
    relative position bias."""

    cfg: BEATsConfig = BEATsConfig()

    @nn.compact
    def __call__(self, x, padding_mask=None):
        cfg = self.cfg
        if padding_mask is not None:
            x = jnp.where(padding_mask[..., None], 0.0, x)
        x = x + WeightNormConvPos(
            cfg.encoder_embed_dim, cfg.conv_pos, cfg.conv_pos_groups, name="pos_conv"
        )(x)
        if not cfg.layer_norm_first:
            x = nn.LayerNorm(name="layer_norm")(x)
        pos_bias = None
        for i in range(cfg.encoder_layers):
            x, pos_bias = BEATsLayer(
                cfg,
                has_relative_attention_bias=(
                    cfg.relative_position_embedding and i == 0
                ),
                name=f"layer_{i}",
            )(x, pos_bias, padding_mask)
        if cfg.layer_norm_first:
            x = nn.LayerNorm(name="layer_norm")(x)
        return x


class BEATsEncoder(nn.Module):
    """fbank [B, T_frames, 128] -> token features [B, T_tokens, 768].

    ``mask_indices`` ([B, T_tokens] bool) replaces the embeddings of masked
    tokens with a learned mask token before the transformer — the BERT-style
    seam used by training/beats_pretrain.py for in-environment
    self-supervised pretraining (the released checkpoint has no mask_token;
    the param is only created when masking is used)."""

    cfg: BEATsConfig = BEATsConfig()

    @nn.compact
    def __call__(self, fbank, padding_mask=None, mask_indices=None):
        cfg = self.cfg
        p = cfg.input_patch_size
        # patch embedding: Conv2d(1, 512, k=16, s=16) over [B, T, F]
        x = fbank[..., None]  # NHWC [B, T, F, 1]
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=cfg.conv_bias,
            name="patch_embedding",
        )(x)
        B, tt, ff, D = x.shape
        # torch: features.reshape(B, 512, -1).transpose(1, 2) on NCHW output
        # = tokens ordered time-major then freq (row-major over [tt, ff])
        x = x.reshape(B, tt * ff, D)
        x = nn.LayerNorm(name="layer_norm")(x)
        if cfg.embed_dim != cfg.encoder_embed_dim:
            x = nn.Dense(cfg.encoder_embed_dim, name="post_extract_proj")(x)
        if mask_indices is not None:
            mask_token = self.param(
                "mask_token",
                nn.initializers.normal(0.02),
                (cfg.encoder_embed_dim,),
            )
            x = jnp.where(mask_indices[..., None], mask_token, x)
        return BEATsTransformer(cfg, name="encoder")(x, padding_mask)


class BEATsModel(nn.Module):
    """Waveform wrapper matching BEATsModel (BEATs.py:190-208)."""

    cfg: BEATsConfig = BEATsConfig()

    @nn.compact
    def __call__(self, audio):  # [B, N] in [-1, 1]
        fbank = beats_preprocess(audio)
        feats = BEATsEncoder(self.cfg, name="encoder")(fbank)
        return {
            "global": feats.mean(axis=1),
            "frame": jnp.swapaxes(feats, 1, 2),  # [B, 768, T_tokens]
        }
