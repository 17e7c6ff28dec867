"""Device-resident dataset store: the TPU-native answer to DataLoader workers.

The reference hides data latency behind 6 torch DataLoader workers
(confs/pretrained.yaml:13). On a TPU host — especially a thin one driving the
chip through a network tunnel — the equivalent lever is to make the *dataset*
resident in HBM and move only int32 clip indices per step:

  * one chunked upload per training run (audio int16, labels f32, embeddings
    in their on-disk dtype) — a few GB for the full 2024 corpus, well within
    a v5e's 16 GB;
  * every train step then ships a [batch] int32 index vector (~240 bytes)
    instead of ~85 MB of decoded batch, and the gather + dequantization fuse
    into the jitted train step (an HBM-local gather is ~free next to the
    step's 30 ms of compute);
  * all augmentation (mixup, SpecAugment, dropout) already happens in-graph,
    so index-gather batches are bit-identical to host-assembled ones.

Trade-off vs the host path (PARITY.md): clips longer than ``pad_to`` get ONE
random crop frozen at build time instead of a fresh crop per epoch. The DCASE
corpora are fixed 10 s clips, so the auto-enable check
(``fits_device_cache``) requires every clip length <= pad_to and falls back
to the host pipeline otherwise.

Audio is quantized to int16 for storage (DESED/MAESTRO wavs are 16-bit PCM,
so the round trip is lossless for them; synthetic float sources bound the
error at 2^-16 full scale) and dequantized in-graph.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

AUDIO_SCALE = 32768.0


def wav_data_samples(path) -> int | None:
    """Clip length in samples from the RIFF header alone (no data read).

    Returns None for files that need a full parse (unknown/compressed)."""
    import struct

    try:
        with open(path, "rb") as f:
            head = f.read(12)
            if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
                return None
            block_align = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    return None
                cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
                if cid == b"fmt ":
                    body = f.read(size + (size & 1))
                    _, n_ch, _, _, block_align, _ = struct.unpack_from(
                        "<HHIIHH", body, 0
                    )
                elif cid == b"data":
                    if block_align in (None, 0):
                        return None
                    return size // block_align
                else:
                    f.seek(size + (size & 1), 1)
    except OSError:
        return None


def fits_device_cache(
    datasets: Mapping[str, object], pad_to: int, max_bytes: int
) -> bool:
    """True when every clip is <= pad_to samples (no per-epoch random crop to
    freeze) and the estimated store size fits the budget."""
    total = 0
    for ds in datasets.values():
        n = len(ds)
        if n == 0:
            return False
        examples = getattr(ds, "examples", None)
        names = getattr(ds, "examples_list", None)
        if examples is None or names is None:
            return False
        for name in names:
            ns = wav_data_samples(examples[name]["path"])
            if ns is None or ns > pad_to:
                return False
        total += n * pad_to * 2  # int16 audio
        emb = getattr(ds, "embeddings", None)
        if emb is not None:
            # one row probe for the embedding row size
            row = emb.get(next(iter(emb.index)))
            total += n * row.nbytes
    return total <= max_bytes


def upload_chunked(arr: np.ndarray, chunk_bytes: int = 64 << 20):
    """Host array -> device array via donated dynamic_update_slice chunks
    (single transfers stay tunnel-friendly; the buffer is updated in place).
    Rows beyond arr.shape[0] in the returned buffer are zero padding."""
    import jax
    import jax.numpy as jnp

    row_bytes = max(arr.nbytes // max(arr.shape[0], 1), 1)
    n = arr.shape[0]
    rows = min(max(int(chunk_bytes // row_bytes), 1), max(n, 1))
    n_pad = ((n + rows - 1) // rows) * rows if n else rows
    buf = jnp.zeros((n_pad, *arr.shape[1:]), arr.dtype)
    zeros_nd = (0,) * (arr.ndim - 1)
    dus = jax.jit(
        lambda b, c, i: jax.lax.dynamic_update_slice(b, c, (i, *zeros_nd)),
        donate_argnums=0,
    )
    for i in range(0, n, rows):
        chunk = arr[i : i + rows]
        if chunk.shape[0] < rows:  # zero-pad tail: one compile total
            chunk = np.concatenate(
                [chunk,
                 np.zeros((rows - chunk.shape[0], *arr.shape[1:]), arr.dtype)]
            )
        buf = dus(buf, chunk, np.int32(i))
    buf.block_until_ready()
    return buf


class DeviceResidentData:
    """Flat per-field device stores over the concatenation of all slots.

    build() assembles host arrays by iterating each dataset once; upload()
    moves them to the default device in bounded chunks (the tunneled client
    chokes on >100 MB single transfers); batch_builder() returns a jit-ready
    function mapping (stores, flat_idx) -> the per-slot batch dict the
    mean-teacher step consumes.
    """

    def __init__(self, slot_names, slot_sizes, stores_host, slot_offsets,
                 masks, has_embeddings):
        self.slot_names = list(slot_names)
        self.slot_sizes = dict(slot_sizes)
        self.stores_host = stores_host      # {"audio": i16 [N,L], ...}
        self.slot_offsets = dict(slot_offsets)  # {slot: global row of item 0}
        self.masks = dict(masks)            # {slot: bool [C]}
        self.has_embeddings = has_embeddings
        self.stores = None                  # device arrays after upload()

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, datasets: Mapping[str, object], slot_names,
              num_workers: int = 4, verbose: bool = True):
        from concurrent.futures import ThreadPoolExecutor

        slot_sizes = {s: len(datasets[s]) for s in slot_names}
        n_total = sum(slot_sizes.values())
        offsets, off = {}, 0
        for s in slot_names:
            offsets[s] = off
            off += slot_sizes[s]

        # probe shapes from the first item of the first slot
        first = datasets[slot_names[0]][0]
        audio_len = first["audio"].shape[-1]
        label_shape = first["labels"].shape
        has_emb = all("embeddings" in datasets[s][0] for s in slot_names)
        some_emb = any("embeddings" in datasets[s][0] for s in slot_names)
        if some_emb and not has_emb:
            raise ValueError(
                "device cache requires embeddings on all slots or none"
            )

        audio = np.zeros((n_total, audio_len), np.int16)
        labels = np.zeros((n_total, *label_shape), np.float32)
        emb = None
        if has_emb:
            e0 = np.asarray(first["embeddings"])
            emb = np.zeros((n_total, *e0.shape), e0.dtype)
        masks = {}

        def fill(slot, i):
            item = datasets[slot][i]
            g = offsets[slot] + i
            a = np.asarray(item["audio"], np.float32)
            np.clip(a * AUDIO_SCALE, -32768, 32767, out=a)
            audio[g] = a.astype(np.int16)
            labels[g] = item["labels"]
            if emb is not None:
                emb[g] = item["embeddings"]
            return item.get("class_mask")

        for slot in slot_names:
            n = slot_sizes[slot]
            with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
                cm = list(pool.map(lambda i: fill(slot, i), range(n)))
            masks[slot] = (
                np.asarray(cm[0], bool)
                if cm and cm[0] is not None
                else np.ones(label_shape[0], bool)
            )
            if verbose:
                print(f"[device-cache] built slot {slot!r}: {n} clips",
                      flush=True)

        stores = {"audio": audio, "labels": labels}
        if emb is not None:
            stores["embeddings"] = emb
        return cls(slot_names, slot_sizes, stores, offsets, masks, has_emb)

    # --------------------------------------------------------------- upload
    def upload(self, chunk_bytes: int = 64 << 20, verbose: bool = True):
        """Chunked host->device move (upload_chunked) of every field."""
        self.stores = {}
        for name, arr in self.stores_host.items():
            self.stores[name] = upload_chunked(arr, chunk_bytes)
            if verbose:
                print(f"[device-cache] uploaded {name}: "
                      f"{arr.nbytes / 1e6:.0f} MB ({arr.dtype})", flush=True)
        # free the host copies: the run only needs the device stores
        self.stores_host = None
        return self.stores

    # ---------------------------------------------------------------- batch
    def flat_index(self, idx_by_slot: Mapping[str, np.ndarray]) -> np.ndarray:
        """Per-slot local indices -> one flat int32 store-row vector in slot
        order (matches _concat_batch concatenation order)."""
        parts = [
            np.asarray(idx_by_slot[s], np.int32) + self.slot_offsets[s]
            for s in self.slot_names
        ]
        return np.concatenate(parts)

    def batch_builder(self, batch_sizes: Mapping[str, int]):
        """(stores, flat_idx:int32[B]) -> per-slot batch dict, jit-ready.

        batch_sizes: per-slot PER-STEP example counts (the SlotSpec sizes);
        flat_idx must be their concatenation in slot order (flat_index)."""
        import jax.numpy as jnp

        slot_names = self.slot_names
        sizes = [int(batch_sizes[s]) for s in slot_names]
        masks = {s: np.asarray(m, bool) for s, m in self.masks.items()}
        has_emb = self.has_embeddings

        def build(stores, flat_idx):
            audio = stores["audio"][flat_idx].astype(jnp.float32) / AUDIO_SCALE
            labels = stores["labels"][flat_idx]
            emb = stores["embeddings"][flat_idx] if has_emb else None
            batch, o = {}, 0
            for s, b in zip(slot_names, sizes):
                sl = slice(o, o + b)
                o += b
                batch[s] = {
                    "audio": audio[sl],
                    "labels": labels[sl],
                    "class_mask": jnp.broadcast_to(
                        jnp.asarray(masks[s]), (b, masks[s].shape[0])
                    ),
                }
                if emb is not None:
                    batch[s]["embeddings"] = emb[sl]
            return batch

        return build


class DeviceEvalCache:
    """Device-resident eval set for repeated validation/test passes.

    Decodes the dataset once, stores audio (int16) and embeddings on device
    padded to a multiple of batch_size, and serves per-batch DEVICE slices —
    so the recurring validation forward passes (every N epochs, student AND
    teacher) ship zero audio bytes after the first upload. Filenames and
    labels stay host-side for the metric plumbing (training/evaluate.py).

    Eval sets crop deterministically (test=True => left crop,
    data/audio_io.py pad_audio), so caching is semantically exact; int16
    audio storage round-trips PCM16 sources bit-exactly.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 n_shards: int = 1):
        from concurrent.futures import ThreadPoolExecutor

        self.batch_size = int(batch_size)
        n = len(dataset)
        first = dataset[0]
        audio_len = first["audio"].shape[-1]
        if first["audio"].ndim != 1:
            raise ValueError("eval cache supports mono [N] audio only")
        self.n = n
        # pad to a whole number of batches per shard so a data mesh can
        # row-shard the stores and scan them SPMD (SURVEY §5: sharded eval
        # with a gather of score arrays back to the host)
        chunk = batch_size * max(int(n_shards), 1)
        self.n_pad = ((n + chunk - 1) // chunk) * chunk
        self.mesh = None
        self.mesh_axis = None
        self._audio = np.zeros((self.n_pad, audio_len), np.int16)
        self._emb = None
        if "embeddings" in first:
            e0 = np.asarray(first["embeddings"])
            self._emb = np.zeros((self.n_pad, *e0.shape), e0.dtype)
        self.labels = np.zeros((n, *first["labels"].shape), np.float32)
        self.filenames: list = [None] * n

        def fill(i):
            item = dataset[i]
            a = np.asarray(item["audio"], np.float32)
            np.clip(a * AUDIO_SCALE, -32768, 32767, out=a)
            self._audio[i] = a.astype(np.int16)
            if self._emb is not None:
                self._emb[i] = item["embeddings"]
            self.labels[i] = item["labels"]
            self.filenames[i] = item.get("filename", f"clip_{i}")

        with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            list(pool.map(fill, range(n)))
        self.nbytes = self._audio.nbytes + (
            self._emb.nbytes if self._emb is not None else 0
        )
        self.stores = None
        self._slice_audio = None
        self._slice_emb = None

    def __len__(self):
        return self.n

    def upload(self, chunk_bytes: int = 64 << 20, verbose: bool = False,
               mesh=None, mesh_axis: str = "data"):
        import jax
        import jax.numpy as jnp

        bs = self.batch_size
        if mesh is not None and mesh.size > 1:
            # row-shard the stores over the data mesh (n_pad is a multiple of
            # batch_size * mesh.size by construction when the cache was built
            # with n_shards=mesh.size); the sharded predict scan in
            # training/evaluate.py runs each shard's batches device-locally
            from jax.sharding import NamedSharding, PartitionSpec

            if self.n_pad % (bs * mesh.size):
                raise ValueError(
                    f"n_pad={self.n_pad} not shardable into {mesh.size} "
                    f"whole-batch shards of batch_size={bs}; build the cache "
                    f"with n_shards=mesh.size"
                )
            self.mesh = mesh
            self.mesh_axis = mesh_axis
            spec = NamedSharding(mesh, PartitionSpec(mesh_axis))
            audio = jax.device_put(self._audio, spec)
            emb = None
            if self._emb is not None:
                emb = jax.device_put(self._emb, spec)
            self.stores = {"audio": audio, "embeddings": emb}
            self._audio = None
            self._emb = None
            if verbose:
                print(
                    f"[device-cache] eval upload (sharded x{mesh.size}): "
                    f"{self.nbytes / 1e6:.0f} MB", flush=True)
            return self.stores
        audio = upload_chunked(self._audio, chunk_bytes)
        self._slice_audio = jax.jit(
            lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, bs, 0).astype(
                jnp.float32
            )
            / AUDIO_SCALE
        )
        emb = None
        if self._emb is not None:
            emb = upload_chunked(self._emb, chunk_bytes)
            self._slice_emb = jax.jit(
                lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, bs, 0)
            )
        self.stores = {"audio": audio, "embeddings": emb}
        self._audio = None
        self._emb = None
        if verbose:
            print(f"[device-cache] eval upload: {self.nbytes / 1e6:.0f} MB",
                  flush=True)
        return self.stores

    def batches(self):
        """Yield (audio_dev [bs, L] f32, emb_dev | None, n_real, filenames,
        labels_np) per batch — audio/emb are device arrays, no transfer."""
        assert self.stores is not None, "call upload() first"
        assert self.mesh is None, (
            "per-batch slicing is single-device; sharded caches are consumed "
            "by the shard_map scan in training/evaluate.py"
        )
        for start in range(0, self.n, self.batch_size):
            n_real = min(self.batch_size, self.n - start)
            audio = self._slice_audio(self.stores["audio"], np.int32(start))
            emb = (
                self._slice_emb(self.stores["embeddings"], np.int32(start))
                if self.stores["embeddings"] is not None
                else None
            )
            yield (
                audio,
                emb,
                n_real,
                self.filenames[start : start + n_real],
                self.labels[start : start + n_real],
            )


def build_eval_caches(eval_sets, batch_size: int, max_bytes: int = 2 << 30,
                      verbose: bool = True, mesh=None,
                      mesh_axis: str = "data") -> dict:
    """DeviceEvalCache wrappers for eval datasets (None passes through;
    oversize or incompatible sets stay host-side). With a `mesh`, stores are
    row-sharded over its `mesh_axis` and validation forwards run SPMD."""
    out = {}
    n_shards = mesh.size if mesh is not None else 1
    for name, ds in eval_sets.items():
        if ds is None or len(ds) == 0:
            out[name] = ds
            continue
        try:
            cache = DeviceEvalCache(ds, batch_size, n_shards=n_shards)
        except (ValueError, KeyError) as e:
            if verbose:
                print(f"[device-cache] eval {name!r} stays host-side: {e}",
                      flush=True)
            out[name] = ds
            continue
        if cache.nbytes > max_bytes:
            out[name] = ds
            continue
        cache.upload(mesh=mesh, mesh_axis=mesh_axis)
        if verbose:
            shard = f" x{n_shards} shards" if mesh is not None else ""
            print(f"[device-cache] eval {name!r}: {len(ds)} clips, "
                  f"{cache.nbytes / 1e6:.0f} MB on device{shard}", flush=True)
        out[name] = cache
    return out
