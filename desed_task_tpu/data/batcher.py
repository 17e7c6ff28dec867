"""Fixed-slot multi-source batching with background prefetch.

Re-designs desed_task/dataio/sampler.py (ConcatDatasetBatchSampler :5-88, the
SpeechBrain fixed-ratio sampler) + the torch DataLoader worker pool as a
host-side pipeline that emits per-slot numpy batches:

    {slot_name: {"audio": [b, N], "labels": [b, C, T], "embeddings": ...,
                 "class_mask": [b, C]}}

matching the layout the jitted mean-teacher step consumes (training/
mean_teacher.py concatenates slots in config order, so the flat batch is
identical to the reference's [maestro | synth | strong | weak | unlabeled]
row order).

Semantics preserved from the reference sampler:
  * each slot draws from an independently shuffled permutation of its own
    dataset;
  * epoch length = min_i(len(dataset_i) // batch_size_i) (sampler.py:82-88);
  * an exhausted (smaller) dataset reshuffles and wraps within the epoch of
    a bigger one only across epochs, never inside one.

Multi-host sharding: pass shard_index/num_shards to strided-partition every
slot's example stream per host (the reference has no multi-host story at all,
SURVEY.md §2.5).

Prefetching uses a thread pool (audio decode is numpy/IO bound and releases
the GIL in np.frombuffer/scipy) with a bounded queue of ready batches.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Mapping, Sequence

import numpy as np


def collate(items: Sequence[Mapping[str, np.ndarray]]) -> dict:
    """Stack a list of per-item dicts into arrays (non-array fields listed)."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], (str, bytes)):
            out[key] = list(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class SlotSampler:
    """Infinite shuffled index stream over one dataset (optionally sharded)."""

    def __init__(self, n: int, seed: int, shard_index=0, num_shards=1, shuffle=True):
        self.n = n
        self.rng = np.random.default_rng(seed)
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.shuffle = shuffle
        self._buf: list[int] = []

    def _refill(self):
        idx = np.arange(self.n)
        if self.shuffle:
            idx = self.rng.permutation(self.n)
        idx = idx[self.shard_index :: self.num_shards]
        self._buf.extend(idx.tolist())

    def take(self, k: int) -> list[int]:
        while len(self._buf) < k:
            self._refill()
        out, self._buf = self._buf[:k], self._buf[k:]
        return out

    @property
    def shard_len(self) -> int:
        return len(range(self.shard_index, self.n, self.num_shards))


class MultiSourceBatcher:
    """Iterates fixed-slot batches over multiple datasets.

    datasets:    {slot_name: dataset} (items indexable, len()-able)
    batch_sizes: {slot_name: per-step examples for this host}
    """

    def __init__(
        self,
        datasets: Mapping[str, object],
        batch_sizes: Mapping[str, int],
        seed: int = 42,
        shard_index: int = 0,
        num_shards: int = 1,
        num_workers: int = 6,
        prefetch: int = 4,
        shuffle: bool = True,
    ):
        assert set(datasets) == set(batch_sizes)
        self.datasets = dict(datasets)
        self.batch_sizes = dict(batch_sizes)
        self.samplers = {
            name: SlotSampler(
                len(ds), seed + i, shard_index, num_shards, shuffle=shuffle
            )
            for i, (name, ds) in enumerate(self.datasets.items())
        }
        self.num_workers = num_workers
        self.prefetch = prefetch

    @property
    def steps_per_epoch(self) -> int:
        """min over slots of shard-local examples // batch size (sampler.py:82-88)."""
        return min(
            self.samplers[n].shard_len // bs for n, bs in self.batch_sizes.items()
        )

    def _build_batch(self, pool: ThreadPoolExecutor) -> dict:
        futures = {}
        for name, ds in self.datasets.items():
            idxs = self.samplers[name].take(self.batch_sizes[name])
            futures[name] = [pool.submit(ds.__getitem__, i) for i in idxs]
        return {
            name: collate([f.result() for f in futs]) for name, futs in futures.items()
        }

    def epoch(self, steps: int | None = None):
        """Yield `steps` (default steps_per_epoch) prefetched batches."""
        steps = steps if steps is not None else self.steps_per_epoch
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=max(1, self.num_workers)) as pool:
                for _ in range(steps):
                    if stop.is_set():
                        return
                    q.put(self._build_batch(pool))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            produced = 0
            while produced < steps:
                batch = q.get()
                if batch is None:
                    break
                produced += 1
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def epoch_indices(self, steps: int | None = None):
        """Yield `steps` per-slot index batches {slot: int64 [bs]} WITHOUT
        touching the datasets — the device-resident cache path
        (data/device_cache.py) maps these onto HBM store rows. Consumes the
        same sampler streams as epoch(), so shuffling/epoch semantics are
        identical to the host-assembly path."""
        steps = steps if steps is not None else self.steps_per_epoch
        for _ in range(steps):
            yield {
                name: np.asarray(
                    self.samplers[name].take(self.batch_sizes[name]), np.int64
                )
                for name in self.datasets
            }

    def __iter__(self):
        return self.epoch()
