"""Checkpoint converter tests for PANNs/AST (synthetic torch state dicts —
the reference's vendored modules import torchlibrosa/timm, unavailable here,
so conversion is validated by shape/structure + a runnable forward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.models.ast import ASTConfig, ASTModel
from desed_task_tpu.models.panns import Cnn14_16k
from desed_task_tpu.models.torch_convert import (
    convert_ast_state_dict,
    convert_panns_state_dict,
)

torch = pytest.importorskip("torch")


def _panns_state_dict():
    sd = {}
    g = torch.Generator().manual_seed(0)
    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05
    sd["bn0.weight"] = torch.ones(64)
    sd["bn0.bias"] = torch.zeros(64)
    sd["bn0.running_mean"] = torch.zeros(64)
    sd["bn0.running_var"] = torch.ones(64)
    sd["bn0.num_batches_tracked"] = torch.tensor(0)
    chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    for i, (ci, co) in enumerate(chans, start=1):
        sd[f"conv_block{i}.conv1.weight"] = t(co, ci, 3, 3)
        sd[f"conv_block{i}.conv2.weight"] = t(co, co, 3, 3)
        for bn in ("bn1", "bn2"):
            sd[f"conv_block{i}.{bn}.weight"] = torch.ones(co)
            sd[f"conv_block{i}.{bn}.bias"] = torch.zeros(co)
            sd[f"conv_block{i}.{bn}.running_mean"] = torch.zeros(co)
            sd[f"conv_block{i}.{bn}.running_var"] = torch.ones(co)
    sd["fc1.weight"] = t(2048, 2048)
    sd["fc1.bias"] = torch.zeros(2048)
    sd["spectrogram_extractor.stft.conv_real.weight"] = t(257, 1, 512)
    return {k: v for k, v in sd.items() if "num_batches" not in k}


def test_panns_conversion_runs(rng):
    variables = convert_panns_state_dict(_panns_state_dict())
    model = Cnn14_16k()
    audio = jnp.asarray(rng.standard_normal((1, 32000)).astype(np.float32) * 0.1)
    # structure must match model.init exactly
    ref = model.init(jax.random.key(0), audio)
    assert jax.tree_util.tree_structure(ref["params"]) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, variables["params"])
    )
    out = model.apply(variables, audio)
    assert out["global"].shape == (1, 2048)
    assert np.isfinite(np.asarray(out["global"])).all()


def _ast_state_dict(cfg: ASTConfig):
    g = torch.Generator().manual_seed(1)
    D = cfg.embed_dim
    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05
    sd = {
        "v.cls_token": t(1, 1, D),
        "v.dist_token": t(1, 1, D),
        "v.pos_embed": t(1, 2 + cfg.num_patches, D),
        "v.patch_embed.proj.weight": t(D, 1, 16, 16),
        "v.patch_embed.proj.bias": torch.zeros(D),
        "v.norm.weight": torch.ones(D),
        "v.norm.bias": torch.zeros(D),
        "mlp_head.0.weight": torch.ones(D),
        "mlp_head.0.bias": torch.zeros(D),
        "mlp_head.1.weight": t(cfg.label_dim, D),
        "mlp_head.1.bias": torch.zeros(cfg.label_dim),
    }
    for i in range(cfg.depth):
        sd[f"v.blocks.{i}.norm1.weight"] = torch.ones(D)
        sd[f"v.blocks.{i}.norm1.bias"] = torch.zeros(D)
        sd[f"v.blocks.{i}.attn.qkv.weight"] = t(3 * D, D)
        sd[f"v.blocks.{i}.attn.qkv.bias"] = torch.zeros(3 * D)
        sd[f"v.blocks.{i}.attn.proj.weight"] = t(D, D)
        sd[f"v.blocks.{i}.attn.proj.bias"] = torch.zeros(D)
        sd[f"v.blocks.{i}.norm2.weight"] = torch.ones(D)
        sd[f"v.blocks.{i}.norm2.bias"] = torch.zeros(D)
        sd[f"v.blocks.{i}.mlp.fc1.weight"] = t(int(D * cfg.mlp_ratio), D)
        sd[f"v.blocks.{i}.mlp.fc1.bias"] = torch.zeros(int(D * cfg.mlp_ratio))
        sd[f"v.blocks.{i}.mlp.fc2.weight"] = t(D, int(D * cfg.mlp_ratio))
        sd[f"v.blocks.{i}.mlp.fc2.bias"] = torch.zeros(D)
    return sd


def test_ast_conversion_runs(rng):
    cfg = ASTConfig(embed_dim=32, depth=2, num_heads=2, input_tdim=64,
                    input_fdim=32, label_dim=7)
    params = convert_ast_state_dict(_ast_state_dict(cfg))
    model = ASTModel(cfg)
    spec = jnp.asarray(rng.standard_normal((1, 64, 32)).astype(np.float32))
    ref = model.init(jax.random.key(0), spec)
    assert jax.tree_util.tree_structure(ref["params"]) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    out = model.apply({"params": params}, spec)
    assert out["global"].shape == (1, 7)


def test_ast_preprocess_shapes(rng):
    from desed_task_tpu.ops.kaldi import ast_preprocess

    audio = jnp.asarray(rng.standard_normal((2, 160000)).astype(np.float32) * 0.1)
    fb = np.asarray(ast_preprocess(audio))
    assert fb.shape == (2, 1024, 128)
    assert np.isfinite(fb).all()
    # 10 s -> 998 real frames, rest zero-padded then normalized
    pad_region = fb[:, 1000:]
    assert np.allclose(pad_region, pad_region[0, -1, 0])
