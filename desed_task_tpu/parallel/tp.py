"""Tensor-parallel sharding rules for the large frozen embedders.

The CRNN itself is small and stays replicated; the BEATs transformer
(90M params, 12 layers x 768 dim) is the component worth sharding over a
'model' mesh axis when run in-graph (e2e mode — an actual implementation of
the reference's NotImplementedError e2e flag, sed_trainer_pretrained.py:
303-314).

Megatron-style layout: attention q/k/v projections and FFN fc1 split their
OUTPUT features across 'model' (head-parallel), out_proj and fc2 split their
INPUT features; XLA inserts the psum on the row-parallel matmuls
automatically from the shardings.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def beats_param_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one BEATs param, keyed by its tree path."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    if joined.endswith("kernel"):
        if any(f"{m}/kernel" in joined for m in ("q_proj", "k_proj", "v_proj", "fc1")):
            return P(None, "model")  # column parallel: split output features
        if any(f"{m}/kernel" in joined for m in ("out_proj", "fc2")):
            return P("model", None)  # row parallel: split input features
    if joined.endswith("bias"):
        if any(f"{m}/bias" in joined for m in ("q_proj", "k_proj", "v_proj", "fc1")):
            return P("model")
    return P()  # replicated (norms, pos conv, biases of row-parallel layers)


def shard_params(params, mesh: Mesh, spec_fn=beats_param_spec):
    """device_put a param tree with per-leaf NamedShardings from spec_fn."""

    def put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, spec_fn(path, leaf)))

    return jax.tree_util.tree_map_with_path(put, params)
