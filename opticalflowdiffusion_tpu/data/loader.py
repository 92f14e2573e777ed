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
from concurrent.futures import ThreadPoolExecutor
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
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        # sample-loading thread pool (reference num_workers processes,
        # exp_base.py:135-169; threads suffice here — cv2/np decode+resize
        # release the GIL).  0 = load serially in the producer thread.
        self.num_workers = int(num_workers)
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

        pool = (
            ThreadPoolExecutor(max_workers=self.num_workers)
            if self.num_workers > 0
            else None
        )

        def load(i):
            return self.dataset[int(i)]

        def put(item) -> bool:
            # bounded put that gives up when the consumer is gone, so
            # abandoned iterators don't leave producer threads blocked
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    if pool is not None:
                        samples = list(pool.map(load, batch_idx))
                    else:
                        samples = [load(i) for i in batch_idx]
                    if not put(_collate(samples)):
                        return
                put(None)
            except BaseException as e:  # surface in the consumer, don't deadlock
                if not stop.is_set():
                    put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)


__all__ = ["DataLoader"]
