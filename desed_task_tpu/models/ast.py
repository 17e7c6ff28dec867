"""AST (Audio Spectrogram Transformer) embedder (flax.linen), TPU-native.

Ground-up JAX implementation of the AST the 2022 recipe vendors
(recipes/dcase2022_task4_baseline/local/ast/ast_models.py:40-313): a
DeiT-style ViT (cls + distillation tokens) whose patch projection is a
Conv2d(1, D, kernel 16x16) with stride (fstride, tstride)=(10, 10) over a
Kaldi-fbank spectrogram [B, T=1024, F=128], with the pretrained positional
embedding bilinearly resized to the audio patch grid.

The forward contract matches the reference (ast_models.py:291-312):
input [B, T, F] -> {"global": mlp_head((cls + dist)/2), "frame":
all-token features [B, D, 2 + num_patches]}.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ASTConfig:
    label_dim: int = 527
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 128
    input_tdim: int = 1024
    patch_size: int = 16
    embed_dim: int = 768  # deit base
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @property
    def f_dim(self) -> int:
        return (self.input_fdim - self.patch_size) // self.fstride + 1

    @property
    def t_dim(self) -> int:
        return (self.input_tdim - self.patch_size) // self.tstride + 1

    @property
    def num_patches(self) -> int:
        return self.f_dim * self.t_dim


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        B, T, D = h.shape
        qkv = nn.Dense(3 * D, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, self.heads, D // self.heads), 3, 2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D // self.heads)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + nn.Dense(D, name="proj")(out)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(D * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, name="fc2")(h)
        return x + h


class ASTModel(nn.Module):
    cfg: ASTConfig = ASTConfig()

    @nn.compact
    def __call__(self, spec):  # [B, T, F] kaldi fbank
        cfg = self.cfg
        B = spec.shape[0]
        # reference: unsqueeze(1).transpose(2,3) -> [B, 1, F, T]; conv stride
        # (fstride over F, tstride over T). NHWC: [B, F, T, 1].
        x = jnp.swapaxes(spec, 1, 2)[..., None]
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.fstride, cfg.tstride),
            padding="VALID",
            name="patch_proj",
        )(x)
        x = x.reshape(B, -1, cfg.embed_dim)  # [B, f_dim*t_dim, D]

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        dist = self.param(
            "dist_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 2 + cfg.num_patches, cfg.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.tile(cls, (B, 1, 1)), jnp.tile(dist, (B, 1, 1)), x], axis=1
        )
        x = x + pos
        for i in range(cfg.depth):
            x = ViTBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="norm")(x)
        frame = x
        g = (x[:, 0] + x[:, 1]) / 2.0
        g = nn.LayerNorm(name="head_norm")(g)
        g = nn.Dense(cfg.label_dim, name="head")(g)
        return {"global": g, "frame": jnp.swapaxes(frame, 1, 2)}


def resize_pos_embed(pos_2d, old_hw: tuple[int, int], new_hw: tuple[int, int]):
    """Bilinear resize of ViT positional embeddings [1, H*W, D] -> new grid
    (ast_models.py:140-176 interpolation of the DeiT 24x24 grid)."""
    import numpy as np

    oh, ow = old_hw
    nh, nw = new_hw
    d = pos_2d.shape[-1]
    grid = np.asarray(pos_2d).reshape(oh, ow, d)
    # bilinear via jax.image
    out = jax.image.resize(jnp.asarray(grid), (nh, nw, d), method="bilinear")
    return np.asarray(out).reshape(1, nh * nw, d)
