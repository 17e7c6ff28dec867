"""Convert reference PyTorch checkpoints into desed_task_tpu flax variables.

Supports the reference CRNN (desed_task/nnet/CRNN.py) parameter naming:
  cnn.cnn.conv{i}.*, cnn.cnn.batchnorm{i}.*, cnn.cnn.glu{i}.linear.*,
  cnn.cnn.cg{i}.linear.*, rnn.rnn.weight_ih_l{k}[_reverse], dense.*,
  dense_softmax.*, cat_tf.*, shrink_emb.{0,1}.*, frame_embs_encoder.*

Layout conventions:
  torch Conv2d weight [out, in, kh, kw] -> flax Conv kernel [kh, kw, in, out]
  torch Linear weight [out, in]         -> flax Dense kernel [in, out]
  torch GRU weight_ih_l{k} [3H, in]     -> kept as-is (models/rnn.py uses the
                                           torch layout internally)
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _gru_paths(dest: dict, prefix_path: tuple[str, ...], key: str, val: np.ndarray):
    """Map torch nn.GRU param names to models.rnn.BidirectionalGRU params."""
    m = re.match(r"(weight|bias)_(ih|hh)_l(\d+)(_reverse)?$", key)
    if not m:
        raise KeyError(f"unrecognized GRU param {key!r}")
    kind, gate, layer, rev = m.groups()
    direction = "bwd" if rev else "fwd"
    name = f"{kind}_{gate}"
    _set(dest, prefix_path + (f"l{layer}_{direction}", name), val)


def convert_crnn_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """torch CRNN state_dict -> {"params": ..., "batch_stats": ...} pytree."""
    params: dict = {}
    batch_stats: dict = {}
    for key, t in state_dict.items():
        val = _np(t)
        parts = key.split(".")
        if parts[0] == "cnn":
            # cnn.cnn.<module><i>.<param>
            mod = parts[2]
            if mod.startswith("conv"):
                if parts[3] == "weight":
                    _set(params, ("cnn", mod, "kernel"), val.transpose(2, 3, 1, 0))
                else:
                    _set(params, ("cnn", mod, "bias"), val)
            elif mod.startswith("batchnorm"):
                if parts[3] == "weight":
                    _set(params, ("cnn", mod, "scale"), val)
                elif parts[3] == "bias":
                    _set(params, ("cnn", mod, "bias"), val)
                elif parts[3] == "running_mean":
                    _set(batch_stats, ("cnn", mod, "mean"), val)
                elif parts[3] == "running_var":
                    _set(batch_stats, ("cnn", mod, "var"), val)
                # num_batches_tracked dropped
            elif mod.startswith("layernorm"):
                name = {"weight": "scale", "bias": "bias"}[parts[3]]
                _set(params, ("cnn", mod, name), val)
            elif mod.startswith(("glu", "cg")):
                # reference GLU/ContextGating submodule "linear"
                if parts[4] == "weight":
                    _set(params, ("cnn", mod, "Dense_0", "kernel"), val.T)
                else:
                    _set(params, ("cnn", mod, "Dense_0", "bias"), val)
            elif mod.startswith(("dropout", "pooling", "relu")):
                continue
            else:
                raise KeyError(f"unrecognized CNN module in {key!r}")
        elif parts[0] == "rnn":
            # rnn.rnn.weight_ih_l0 ...
            _gru_paths(params, ("rnn",), parts[2], val)
        elif parts[0] == "frame_embs_encoder":
            _gru_paths(params, ("frame_embs_encoder",), parts[1], val)
        elif parts[0] in ("dense", "dense_softmax"):
            if len(parts) == 3:  # multi-head ModuleList: dense.{i}.weight
                name = f"{parts[0]}_{parts[1]}"
                leaf = parts[2]
            else:
                name = parts[0]
                leaf = parts[1]
            if leaf == "weight":
                _set(params, (name, "kernel"), val.T)
            else:
                _set(params, (name, "bias"), val)
        elif parts[0] == "cat_tf":
            if parts[1] == "weight":
                _set(params, ("cat_tf", "kernel"), val.T)
            else:
                _set(params, ("cat_tf", "bias"), val)
        elif parts[0] == "shrink_emb":
            # Sequential(Linear, LayerNorm)
            if parts[1] == "0":
                if parts[2] == "weight":
                    _set(params, ("shrink_emb_dense", "kernel"), val.T)
                else:
                    _set(params, ("shrink_emb_dense", "bias"), val)
            else:
                name = {"weight": "scale", "bias": "bias"}[parts[2]]
                _set(params, ("shrink_emb_ln", name), val)
        else:
            raise KeyError(f"unrecognized CRNN param {key!r}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_beats_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch BEATs checkpoint["model"] -> models.beats.BEATsEncoder params.

    Handles the pretraining-only keys (quantizer, predictor) by skipping.
    Layers 1..11 share layer 0's relative_attention_bias in the reference
    (backbone.py:80-84); the flax model only materializes it at layer 0.
    """
    params: dict = {}
    for key, t in state_dict.items():
        val = _np(t)
        parts = key.split(".")
        if parts[0] in ("predictor", "predictor_dropout", "quantize", "quantize_layer"):
            continue
        if key == "patch_embedding.weight":
            _set(params, ("patch_embedding", "kernel"), val.transpose(2, 3, 1, 0))
        elif key == "patch_embedding.bias":
            _set(params, ("patch_embedding", "bias"), val)
        elif parts[0] == "layer_norm":
            _set(params, ("layer_norm", {"weight": "scale", "bias": "bias"}[parts[1]]), val)
        elif parts[0] == "post_extract_proj":
            if parts[1] == "weight":
                _set(params, ("post_extract_proj", "kernel"), val.T)
            else:
                _set(params, ("post_extract_proj", "bias"), val)
        elif parts[0] == "encoder":
            if parts[1] == "pos_conv":
                # encoder.pos_conv.0.{weight_g, weight_v, bias}
                _set(params, ("encoder", "pos_conv", parts[3]), val)
            elif parts[1] == "layer_norm":
                _set(
                    params,
                    ("encoder", "layer_norm", {"weight": "scale", "bias": "bias"}[parts[2]]),
                    val,
                )
            elif parts[1] == "layers":
                i = int(parts[2])
                sub = parts[3]
                base = ("encoder", f"layer_{i}")
                if sub == "self_attn":
                    mod = parts[4]
                    if mod == "relative_attention_bias":
                        if i == 0:
                            _set(params, base + ("self_attn", "relative_attention_bias"), val)
                    elif mod == "grep_a":
                        _set(params, base + ("self_attn", "grep_a"), val)
                    elif mod == "grep_linear":
                        if parts[5] == "weight":
                            _set(params, base + ("self_attn", "grep_linear", "kernel"), val.T)
                        else:
                            _set(params, base + ("self_attn", "grep_linear", "bias"), val)
                    else:  # q/k/v/out_proj
                        if parts[5] == "weight":
                            _set(params, base + ("self_attn", mod, "kernel"), val.T)
                        else:
                            _set(params, base + ("self_attn", mod, "bias"), val)
                elif sub in ("self_attn_layer_norm", "final_layer_norm"):
                    _set(
                        params,
                        base + (sub, {"weight": "scale", "bias": "bias"}[parts[4]]),
                        val,
                    )
                elif sub in ("fc1", "fc2"):
                    if parts[4] == "weight":
                        _set(params, base + (sub, "kernel"), val.T)
                    else:
                        _set(params, base + (sub, "bias"), val)
                else:
                    raise KeyError(f"unrecognized BEATs layer param {key!r}")
            else:
                raise KeyError(f"unrecognized BEATs encoder param {key!r}")
        else:
            raise KeyError(f"unrecognized BEATs param {key!r}")
    return params


def beats_config_from_checkpoint(cfg: Mapping[str, Any]):
    """Released-checkpoint ``cfg`` dict -> models.beats.BEATsConfig.

    The released BEATs files store a plain dict (BEATs.py:24-90 field names);
    fields our inference encoder does not model (pretraining dropouts,
    quantizer widths, predictor head) are ignored.
    """
    import dataclasses

    from .beats import BEATsConfig

    fields = {f.name for f in dataclasses.fields(BEATsConfig)}
    kwargs = {k: v for k, v in dict(cfg).items() if k in fields}
    kwargs["dropout"] = 0.0  # inference encoder
    return BEATsConfig(**kwargs)


def load_beats_checkpoint(ckpt_path: str):
    """Load a torch BEATs checkpoint file -> (BEATsConfig, params).

    Matches the released layout the reference loads at BEATs.py:190-208:
    {"cfg": <dict>, "model": <state_dict incl. weight-norm pos_conv
    weight_g/weight_v and, for fine-tuned files, predictor.* keys>}.
    """
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    cfg = beats_config_from_checkpoint(ckpt.get("cfg", {}))
    params = convert_beats_state_dict(ckpt["model"])
    return cfg, params


def load_panns_checkpoint(ckpt_path: str) -> dict:
    """Released PANNs Cnn14_16k file ({"model": state_dict},
    extract_embeddings.py:174-179) -> flax variables."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return convert_panns_state_dict(sd)


def load_ast_checkpoint(ckpt_path: str) -> dict:
    """Released AST audioset file (a DataParallel state_dict with "module."
    prefixes, ast_models.py:223-240) -> flax params."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and not hasattr(
        sd["model"], "shape"
    ):
        sd = sd["model"]
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    return convert_ast_state_dict(sd)


def convert_panns_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch Cnn14_16k state_dict -> models.panns.Cnn14_16k variables.

    Skips the torchlibrosa STFT/mel buffers (we compute the front-end in
    ops/frontend) and fc1 (unused by the embedding forward, models.py:266-274).
    Returns {"params": ..., "batch_stats": ...}.
    """
    params: dict = {}
    stats: dict = {}
    bn_map = {"weight": "scale", "bias": "bias"}
    for key, t in state_dict.items():
        val = _np(t)
        parts = key.split(".")
        if parts[0] in ("spectrogram_extractor", "logmel_extractor", "spec_augmenter",
                        "fc1", "fc_audioset"):
            continue
        if parts[0] == "bn0":
            if parts[1] in bn_map:
                _set(params, ("bn0", bn_map[parts[1]]), val)
            elif parts[1] == "running_mean":
                _set(stats, ("bn0", "mean"), val)
            elif parts[1] == "running_var":
                _set(stats, ("bn0", "var"), val)
        elif parts[0].startswith("conv_block"):
            block = parts[0]
            mod = parts[1]  # conv1/conv2/bn1/bn2
            leaf = parts[2]
            if mod.startswith("conv"):
                _set(params, (block, mod, "kernel"), val.transpose(2, 3, 1, 0))
            elif mod.startswith("bn"):
                if leaf in bn_map:
                    _set(params, (block, mod, bn_map[leaf]), val)
                elif leaf == "running_mean":
                    _set(stats, (block, mod, "mean"), val)
                elif leaf == "running_var":
                    _set(stats, (block, mod, "var"), val)
        else:
            raise KeyError(f"unrecognized PANNs param {key!r}")
    return {"params": params, "batch_stats": stats}


def convert_ast_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch ASTModel (timm DeiT wrapper) state_dict -> models.ast params.

    Expects the audio-adapted checkpoint (patch proj already 1-channel with
    the audio-grid pos_embed, ast_models.py:126-176).
    """
    params: dict = {}
    for key, t in state_dict.items():
        val = _np(t)
        parts = key.split(".")
        if parts[0] == "v":
            parts = parts[1:]
        if parts[0] == "cls_token":
            _set(params, ("cls_token",), val)
        elif parts[0] == "dist_token":
            _set(params, ("dist_token",), val)
        elif parts[0] == "pos_embed":
            _set(params, ("pos_embed",), val)
        elif parts[0] == "patch_embed":
            if parts[-1] == "weight":  # [D, 1, 16, 16] -> [16, 16, 1, D]
                _set(params, ("patch_proj", "kernel"), val.transpose(2, 3, 1, 0))
            else:
                _set(params, ("patch_proj", "bias"), val)
        elif parts[0] == "blocks":
            i = int(parts[1])
            base = (f"block_{i}",)
            sub = parts[2]
            if sub in ("norm1", "norm2"):
                name = {"weight": "scale", "bias": "bias"}[parts[3]]
                _set(params, base + (sub, name), val)
            elif sub == "attn":
                mod = parts[3]  # qkv | proj
                if parts[4] == "weight":
                    _set(params, base + (mod, "kernel"), val.T)
                else:
                    _set(params, base + (mod, "bias"), val)
            elif sub == "mlp":
                mod = parts[3]  # fc1 | fc2
                if parts[4] == "weight":
                    _set(params, base + (mod, "kernel"), val.T)
                else:
                    _set(params, base + (mod, "bias"), val)
            else:
                raise KeyError(f"unrecognized AST block param {key!r}")
        elif parts[0] == "norm":
            name = {"weight": "scale", "bias": "bias"}[parts[1]]
            _set(params, ("norm", name), val)
        elif parts[0] == "mlp_head":
            if parts[1] == "0":  # LayerNorm
                name = {"weight": "scale", "bias": "bias"}[parts[2]]
                _set(params, ("head_norm", name), val)
            else:  # Linear
                if parts[2] == "weight":
                    _set(params, ("head", "kernel"), val.T)
                else:
                    _set(params, ("head", "bias"), val)
        elif parts[0] in ("head", "head_dist", "pre_logits"):
            continue  # timm classification heads unused
        else:
            raise KeyError(f"unrecognized AST param {key!r}")
    return params


def convert_gru_state_dict(state_dict: Mapping[str, Any], prefix: str = "") -> dict:
    """torch nn.GRU state_dict -> models.rnn.BidirectionalGRU params tree."""
    params: dict = {}
    for key, t in state_dict.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix) :]
        _gru_paths(params, (), key, _np(t))
    return params
