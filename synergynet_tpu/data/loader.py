"""Prefetching batch loader: threaded decode/augment + device staging.

Replaces the reference's ``torch.utils.data.DataLoader(bs=1024, workers=8,
pin_memory=True)`` (reference main_train.py:207-209). Design:

- A thread pool decodes/augments samples (cv2 JPEG decode and the numpy
  color math release the GIL in their C loops) and assembles fixed-shape
  uint8 batches.
- A small prefetch queue keeps ``prefetch`` batches in flight so host data
  work overlaps device compute — the TPU analogue of pinned-memory workers.
- Batches stay uint8 until the device program normalizes them: 4x less
  host->HBM traffic than shipping f32.
- Each epoch derives per-sample RNGs from (seed, epoch, index) so results
  are reproducible regardless of thread scheduling.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 2, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        """``process_index``/``process_count`` shard the dataset across
        hosts for multi-host SPMD: every process sees a disjoint strided
        slice under the same shuffle order (set them from
        ``jax.process_index()`` / ``jax.process_count()``)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = max(1, process_count)

    def _num_local(self) -> int:
        n = len(self.dataset)
        return (n - self.process_index + self.process_count - 1) \
            // self.process_count

    def __len__(self) -> int:
        if self.drop_last:
            # Process-AGREED count: every rank must run the same number of
            # steps or the cross-process collectives in the sharded train
            # step deadlock (and LR schedules diverge). The strided shard
            # of rank p holds ceil((n-p)/P) rows — the minimum over ranks
            # is floor(n/P), so every rank steps to that bound.
            return (len(self.dataset) // self.process_count) \
                // self.batch_size
        n = self._num_local()
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _fetch(self, index: int) -> Tuple:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index]))
        item = self.dataset.__getitem__(index, rng=rng)
        return item if isinstance(item, tuple) else (item,)

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # Same permutation on every host; each takes a strided slice.
            np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])).shuffle(order)
        if self.process_count > 1:
            order = order[self.process_index::self.process_count]
        nb = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # Vectorized fast path: a dataset exposing ``fetch_batch(indices)``
        # (e.g. GeneratedCropDataset) builds whole batches in numpy — worker
        # threads each generate a slab. Per-item fetching caps generated
        # data at ~1.4K crops/s; slab generation sustains the >17K crops/s
        # a TPU train step consumes. Host transforms are per-item, so the
        # fast path only engages without one.
        batched = (getattr(self.dataset, "fetch_batch", None)
                   if getattr(self.dataset, "transform", None) is None
                   else None)

        def make_batch(pool, idx):
            if batched is None:
                samples = list(pool.map(self._fetch, idx))
                return tuple(np.stack([s[i] for s in samples])
                             for i in range(len(samples[0])))
            slabs = np.array_split(
                idx, max(1, min(self.num_workers, len(idx) // 128)))
            parts = list(pool.map(batched, slabs))
            return tuple(np.concatenate([p[i] for p in parts])
                         for i in range(len(parts[0])))

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                    parts = make_batch(pool, idx)
                    out_q.put(parts if len(parts) > 1 else parts[0])
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit if we stopped early.
            while t.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def shard_batches(loader, mesh=None):
    """Wrap a loader to device_put each batch sharded over the data axis."""
    from synergynet_tpu.core import mesh as meshlib

    def gen():
        for batch in loader:
            if mesh is None:
                yield batch
            else:
                yield meshlib.shard_batch(mesh, batch)
    return gen()
