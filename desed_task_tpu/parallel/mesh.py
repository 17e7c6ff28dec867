"""Device mesh and sharding helpers.

The reference has no working multi-device path (its launcher raises
NotImplementedError for >1 GPU, train_pretrained.py:551-558). Here
parallelism is first-class: a `jax.sharding.Mesh` over ICI with
  * 'data'  — batch (data-parallel) axis: every batch-axis array is sharded,
              params replicated, gradients reduced by XLA psum.
  * 'model' — tensor-parallel axis for the large frozen embedders (BEATs
              attention heads / FFN sharding); the CRNN itself is small and
              stays replicated.

Use `make_mesh()` for the common 1-D data mesh, or pass an explicit shape
dict such as {"data": 4, "model": 2}.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = {"data": len(devices)}
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays: axis 0 split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data", batch_axis: int = 0):
    """Device-put a (nested) batch pytree sharded over `axis` on dim
    `batch_axis` (0 normally; 1 when a leading micro-batch axis is present
    for gradient accumulation).

    Scalars / 0-d leaves are replicated.
    """
    sharded = NamedSharding(mesh, P(*([None] * batch_axis), axis))
    repl = replicate(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim <= batch_axis:
            return jax.device_put(x, repl)
        return jax.device_put(x, sharded)

    return jax.tree_util.tree_map(put, batch)
