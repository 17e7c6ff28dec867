"""AOT export of the serving pipeline: StableHLO artifact + metadata.

A deployment story the reference does not have (its serving path is "load
the Lightning checkpoint in Python and run the module"): the fused inference
forward of ``inference.pipeline.InferencePipeline`` — mel front-end, scaler,
CRNN(+in-graph embedder), per-class median filter, full threshold sweep — is
exported ONCE with ``jax.export`` into a self-contained, version-stamped
StableHLO artifact (parameters baked in as constants) that any JAX process
can deserialize and run without the model code, on the lowering platforms
recorded in the artifact (e.g. ``["tpu"]`` for fleet serving, ``["cpu"]``
for edge smoke tests).

    pipe = InferencePipeline(model, variables, encoder, ...)
    export_pipeline(pipe, "serve/sed_v1")          # forward.jaxexport + meta
    fwd, meta = load_pipeline("serve/sed_v1")
    strong, weak, activity = fwd(audio_batch)      # static [B, N] float32
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_ARTIFACT = "forward.jaxexport"
_META = "meta.json"


def export_pipeline(
    pipeline,
    out_dir,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    embeddings_shape: Optional[Sequence[int]] = None,
):
    """Serialize the pipeline's fused forward for ahead-of-time serving.

    ``platforms``: lowering targets (default: the current backend).
    ``embeddings_shape``: per-clip shape (e.g. (768, 496)) for models fed
    precomputed embeddings; the exported function then takes (audio, emb).
    Returns the artifact directory as a Path.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    bs = int(batch_size or pipeline.batch_size)
    args = [jax.ShapeDtypeStruct((bs, pipeline.pad_to), jnp.float32)]
    if embeddings_shape is not None:
        args.append(
            jax.ShapeDtypeStruct((bs, *embeddings_shape), jnp.float32)
        )

    fn = jax.jit(lambda *a: pipeline._forward_impl(*a))
    exported = jax.export.export(
        fn, platforms=list(platforms) if platforms else None
    )(*args)
    (out / _ARTIFACT).write_bytes(exported.serialize())

    enc = pipeline.encoder
    meta = {
        "labels": list(enc.labels),
        "fs": int(enc.fs),
        "audio_len": float(enc.audio_len),
        "frame_hop": int(enc.frame_hop),
        "net_pooling": int(enc.net_pooling),
        "batch_size": bs,
        "pad_to": int(pipeline.pad_to),
        "thresholds": list(pipeline.thresholds),
        "median_filter": list(pipeline.median) if pipeline.median else None,
        "embeddings_shape": (
            list(embeddings_shape) if embeddings_shape is not None else None
        ),
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "outputs": ["strong [B,C,T]", "weak [B,C]",
                    "activity [n_th,B,C,T] bool"],
    }
    (out / _META).write_text(json.dumps(meta, indent=2))
    return out


def load_pipeline(artifact_dir):
    """Deserialize an exported forward. Returns (callable, metadata dict).

    The callable takes the static-shape float32 arrays recorded in the
    metadata and runs on the current backend (which must be one of the
    artifact's lowering platforms).
    """
    d = Path(artifact_dir)
    exported = jax.export.deserialize((d / _ARTIFACT).read_bytes())
    meta = json.loads((d / _META).read_text())
    return exported.call, meta
