"""Checkpoint-FILE facsimile tests: converters driven from torch-saved .pt
files with the released layouts (VERDICT r2 missing #4 / next #5) —
BEATs_iter3 {"cfg", "model"} incl. weight-norm weight_g/weight_v and
fine-tune predictor keys (reference BEATs.py:190-208, backbone.py:30-43),
PANNs {"model": state_dict} (extract_embeddings.py:174-179), and the AST
DataParallel "module."-prefixed audioset dict (ast_models.py:223-240)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE_BEATS = Path("/root/reference/recipes/dcase2024_task4_baseline/local")


def _load_reference_beats_module():
    import importlib

    from _reference_loader import _install_torchaudio_stub

    _install_torchaudio_stub()
    sys.path.insert(0, str(REFERENCE_BEATS))
    return importlib.import_module("beats.BEATs")


SMALL_CFG = {
    # released-file field names (reference BEATsConfig, BEATs.py:24-90)
    "input_patch_size": 16,
    "embed_dim": 32,
    "encoder_layers": 2,
    "encoder_embed_dim": 64,
    "encoder_ffn_embed_dim": 128,
    "encoder_attention_heads": 4,
    "activation_fn": "gelu",
    "layer_norm_first": False,
    "deep_norm": True,
    "conv_bias": False,
    "conv_pos": 16,
    "conv_pos_groups": 4,
    "relative_position_embedding": True,
    "num_buckets": 32,
    "max_distance": 64,
    "gru_rel_pos": True,
    # pretraining/fine-tune fields our encoder ignores
    "dropout": 0.1,
    "attention_dropout": 0.1,
    "finetuned_model": True,
    "predictor_dropout": 0.1,
    "predictor_class": 527,
}


@pytest.mark.skipif(not REFERENCE_BEATS.exists(), reason="reference absent")
def test_beats_checkpoint_file_roundtrip(tmp_path):
    """torch.save a facsimile with the exact released layout; load via
    load_beats_checkpoint; converted tree must match the flax init tree and
    run. The real module provides weight-norm pos_conv (weight_g/weight_v)
    and predictor.* keys that must be ignored."""
    from desed_task_tpu.models.beats import BEATsEncoder
    from desed_task_tpu.models.torch_convert import load_beats_checkpoint

    mod = _load_reference_beats_module()
    torch.manual_seed(0)
    ref = mod.BEATs(mod.BEATsConfig(dict(SMALL_CFG)))
    sd = ref.state_dict()
    assert any(k.endswith("weight_g") for k in sd), "weight-norm keys present"
    assert any(k.startswith("predictor") for k in sd), "fine-tune keys present"
    path = tmp_path / "BEATs_iter3_facsimile.pt"
    torch.save({"cfg": dict(SMALL_CFG), "model": sd}, path)

    cfg, params = load_beats_checkpoint(str(path))
    assert cfg.encoder_layers == 2 and cfg.encoder_embed_dim == 64
    assert cfg.dropout == 0.0  # inference encoder ignores training dropout

    model = BEATsEncoder(cfg)
    fbank = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 128)), jnp.float32
    )
    ref_tree = model.init(jax.random.key(0), fbank)["params"]
    conv_tree = jax.tree_util.tree_map(jnp.asarray, params)
    assert jax.tree_util.tree_structure(ref_tree) == (
        jax.tree_util.tree_structure(conv_tree)
    ), "every released-layout key must land on a model parameter"
    out = model.apply({"params": conv_tree}, fbank)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not REFERENCE_BEATS.exists(), reason="reference absent")
def test_beats_converter_rejects_unknown_keys(tmp_path):
    from desed_task_tpu.models.torch_convert import load_beats_checkpoint

    mod = _load_reference_beats_module()
    torch.manual_seed(0)
    ref = mod.BEATs(mod.BEATsConfig(dict(SMALL_CFG)))
    sd = ref.state_dict()
    sd["encoder.layers.0.mystery_param"] = torch.zeros(3)
    path = tmp_path / "bad.pt"
    torch.save({"cfg": dict(SMALL_CFG), "model": sd}, path)
    with pytest.raises(KeyError):
        load_beats_checkpoint(str(path))


def test_panns_checkpoint_file(tmp_path):
    from test_converters import _panns_state_dict

    from desed_task_tpu.models.panns import Cnn14_16k
    from desed_task_tpu.models.torch_convert import load_panns_checkpoint

    path = tmp_path / "Cnn14_16k_facsimile.pth"
    torch.save({"model": _panns_state_dict()}, path)
    variables = load_panns_checkpoint(str(path))
    model = Cnn14_16k()
    audio = jnp.zeros((1, 32000), jnp.float32)
    ref = model.init(jax.random.key(0), audio)
    assert jax.tree_util.tree_structure(ref["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, variables["params"])
        )
    )
    out = model.apply(variables, audio)
    assert out["global"].shape == (1, 2048)


def test_ast_checkpoint_file_dataparallel_prefix(tmp_path):
    from test_converters import _ast_state_dict

    from desed_task_tpu.models.ast import ASTConfig, ASTModel
    from desed_task_tpu.models.torch_convert import load_ast_checkpoint

    cfg = ASTConfig(embed_dim=32, depth=2, num_heads=2, input_tdim=64,
                    input_fdim=32, label_dim=7)
    # the released audioset file is a torch.nn.DataParallel state_dict
    sd = {f"module.{k}": v for k, v in _ast_state_dict(cfg).items()}
    path = tmp_path / "audioset_10_10_0.4593_facsimile.pth"
    torch.save(sd, path)
    params = load_ast_checkpoint(str(path))
    model = ASTModel(cfg)
    spec = jnp.zeros((1, 64, 32), jnp.float32)
    ref = model.init(jax.random.key(0), spec)
    assert jax.tree_util.tree_structure(ref["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, params)
        )
    )
    out = model.apply({"params": params}, spec)
    assert out["global"].shape == (1, 7)
