"""Offline pretrained-embedding extraction -> HDF5.

Replaces recipes/dcase202{2,3,4}_task4_baseline/extract_embeddings.py
(:41-76): run the frozen embedder (BEATs / PANNs / AST, reimplemented in
JAX) over wav folders and write an HDF5 store per split with datasets
  global_embeddings [N, D], frame_embeddings [N, D_f, T_f], filenames [N]
— the exact layout the reference datasets consume (dataio/datasets.py:217-232).

The device forward is jitted once per (batch shape); audio decode runs in a
thread pool overlapping the TPU compute.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def build_embedder(name: str, checkpoint: str | None = None):
    """Returns (apply_fn(audio [B, N]) -> {"global", "frame"}, params)."""
    if name == "beats":
        from ..models.beats import BEATsConfig, BEATsModel

        cfg_kwargs = {}
        params = None
        if checkpoint and str(checkpoint).endswith(".msgpack"):
            # JAX-native encoder params from training/beats_pretrain.py;
            # the sidecar json pins the architecture flags (deep_norm etc.
            # change forward semantics without changing the param tree)
            import json

            import flax.serialization

            cfg = BEATsConfig()
            sidecar = Path(checkpoint).with_suffix(".json")
            if sidecar.exists():
                raw = json.loads(sidecar.read_text())
                keep = {f.name for f in BEATsConfig.__dataclass_fields__.values()}
                cfg = BEATsConfig(**{k: v for k, v in raw.items() if k in keep})
            model = BEATsModel(cfg)
            tpl = model.init(
                jax.random.key(0), jnp.zeros((1, 16000), jnp.float32)
            )["params"]
            enc = flax.serialization.from_bytes(
                tpl["encoder"], Path(checkpoint).read_bytes()
            )
            return model, {"params": {"encoder": enc}}
        if checkpoint:
            from ..models.torch_convert import load_beats_checkpoint

            raw_cfg, enc_params = load_beats_checkpoint(checkpoint)
            keep = {f.name for f in BEATsConfig.__dataclass_fields__.values()}
            cfg_kwargs = {k: v for k, v in raw_cfg.items() if k in keep}
            params = {"encoder": enc_params}
        model = BEATsModel(BEATsConfig(**cfg_kwargs))
        if params is None:
            params = model.init(
                jax.random.key(0), jnp.zeros((1, 16000), jnp.float32)
            )["params"]
        return model, {"params": params}
    if name == "panns":
        from ..models.panns import Cnn14_16k

        model = Cnn14_16k()
        if checkpoint:
            import torch

            from ..models.torch_convert import convert_panns_state_dict

            ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
            sd = ckpt.get("model", ckpt)
            variables = convert_panns_state_dict(sd)
        else:
            variables = model.init(
                jax.random.key(0), jnp.zeros((1, 16000), jnp.float32)
            )
        return model, variables
    if name == "ast":
        from ..models.ast import ASTConfig, ASTModel

        model = ASTModel(ASTConfig())
        if checkpoint:
            import torch

            from ..models.torch_convert import convert_ast_state_dict

            ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
            sd = ckpt.get("model", ckpt)
            variables = {"params": convert_ast_state_dict(sd)}
        else:
            variables = model.init(
                jax.random.key(0), jnp.zeros((1, 1024, 128), jnp.float32)
            )
        return model, variables
    raise ValueError(f"unknown embedder {name!r} (beats|panns|ast)")


def extract_folder(
    model,
    variables,
    wav_files: list,
    out_hdf5: str,
    batch_size: int = 32,
    pad_to: int = 160000,
    num_workers: int = 6,
    preprocess=None,  # e.g. kaldi fbank for AST
    dtype: str = "float32",
    watchdog=None,  # tests inject a fast-timeout stub; None = default
):
    """Run the embedder over wav files and write the HDF5 store.

    dtype: on-disk embedding dtype. "float16" halves store size and train-time
    read bandwidth (frame embeddings dominate the data path); readers
    (_EmbeddingStore.get) convert back to float32.
    """
    import h5py

    from ..data.audio_io import read_audio
    from ..obs.watchdog import StallWatchdog

    wav_files = [str(f) for f in wav_files]
    if not wav_files:
        raise ValueError("no wav files to extract")

    # same stall protection as the train loop (obs/watchdog.py): extraction
    # is a long unattended device loop on the tunneled TPU, and a wedged
    # relay otherwise blocks the first fetch forever (observed round 5:
    # a 20-min silent hang at the first batch). Auto-disabled on CPU.
    wd = watchdog if watchdog is not None else StallWatchdog(timeout_s=180.0)

    # variables must be a jit ARGUMENT: closing over them embeds the full
    # parameter set as HLO literals, which overflows the remote-compile
    # relay's request limit on tunneled TPUs (HTTP 413) and bloats caches.
    @jax.jit
    def forward(variables, audio):
        x = preprocess(audio) if preprocess is not None else audio
        return model.apply(variables, x)

    variables = jax.device_put(variables)

    def load(path):
        audio, *_ = read_audio(path, pad_to=pad_to, test=True)
        return audio

    wd.start()
    wd.arm()
    try:
        _extract_loop(wd, forward, variables, wav_files, out_hdf5,
                      batch_size, pad_to, num_workers, dtype, load, h5py)
    finally:
        wd.disarm()
        wd.stop()
    if wd.stalls:
        print(f"[extract] watchdog: {wd.stalls} stall(s), "
              f"{wd.stalled_seconds:.0f}s stalled, "
              f"{wd.probes_launched} probe(s)", flush=True)
    return out_hdf5


def _extract_loop(wd, forward, variables, wav_files, out_hdf5,
                  batch_size, pad_to, num_workers, dtype, load, h5py):
    first = forward(variables, jnp.zeros((batch_size, pad_to), jnp.float32))
    g_dim = first["global"].shape[-1]
    f_shape = first["frame"].shape[1:]
    wd.beat()

    with h5py.File(out_hdf5, "w") as f:
        g_ds = f.create_dataset(
            "global_embeddings", (len(wav_files), g_dim), dtype=dtype
        )
        f_ds = f.create_dataset(
            "frame_embeddings", (len(wav_files), *f_shape), dtype=dtype
        )
        names = f.create_dataset(
            "filenames", (len(wav_files),), dtype=h5py.string_dtype()
        )
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            for start in range(0, len(wav_files), batch_size):
                chunk = wav_files[start : start + batch_size]
                audio = np.stack(list(pool.map(load, chunk)))
                if len(chunk) < batch_size:  # pad the final batch (static jit shape)
                    audio = np.concatenate(
                        [audio, np.zeros((batch_size - len(chunk), pad_to), np.float32)]
                    )
                out = forward(variables, jnp.asarray(audio))
                g = np.asarray(out["global"])[: len(chunk)]
                fr = np.asarray(out["frame"])[: len(chunk)]
                g_ds[start : start + len(chunk)] = g
                f_ds[start : start + len(chunk)] = fr
                for i, path in enumerate(chunk):
                    names[start + i] = Path(path).stem
                wd.beat()


def extract_splits(
    embedder_name: str,
    checkpoint: str | None,
    split_folders: dict[str, str],
    output_dir: str,
    fs: int = 16000,
    audio_len: float = 10.0,
    batch_size: int = 32,
    dtype: str = "float32",
):
    """Extract every split folder into output_dir/<embedder>/<split>.hdf5."""
    model, variables = build_embedder(embedder_name, checkpoint)
    preprocess = None
    if embedder_name == "ast":
        from ..ops.kaldi import ast_preprocess

        preprocess = ast_preprocess
    out_root = Path(output_dir) / embedder_name
    out_root.mkdir(parents=True, exist_ok=True)
    results = {}
    for split, folder in split_folders.items():
        wavs = sorted(Path(folder).glob("*.wav"))
        if not wavs:
            print(f"[extract] {split}: no wavs in {folder}, skipping")
            continue
        out = out_root / f"{split}.hdf5"
        print(f"[extract] {split}: {len(wavs)} files -> {out}")
        extract_folder(
            model, variables, wavs, str(out),
            batch_size=batch_size, pad_to=int(audio_len * fs),
            preprocess=preprocess, dtype=dtype,
        )
        results[split] = str(out)
    return results
