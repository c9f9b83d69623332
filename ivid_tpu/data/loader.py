"""Prefetching data loader with worker threads/processes and sharding.

Replaces torch DataLoader + DistributedSampler (reference:
diffusion/trainers/basic.py:140-154): epoch-shuffled, rank-strided index
sharding, drop-last batching, ``num_workers``-thread parallel item loading
with ordered batch prefetch, infinite cycling (reference:
trainers/utils.py:7-9).

Resumable: the iterator tracks ``position`` — the (epoch, batch) cursor of the
NEXT batch to be yielded — and a fresh loader constructed with
``start=position`` reproduces the exact remaining batch sequence (the
per-epoch shuffle is a pure function of ``seed + epoch``). The trainer
persists this cursor in its misc checkpoint (the reference restarts its
dataloader from scratch on resume and silently replays data,
basic.py:196-228; exact-resume is a deliberate improvement).

Multi-process semantics: ``batch_size`` is the GLOBAL batch. Every process
cuts the same ``seed + epoch`` permutation into global batches, then loads
only its own ``batch_size / num_shards`` row block — so each process fetches
exactly the items it will contribute, and the trainer assembles the global
device array with ``jax.make_array_from_process_local_data``. (Round 2
over-fetched ``num_shards×`` by loading full global batches per process.)"""

from __future__ import annotations

import multiprocessing
from collections import deque
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, Tuple

import numpy as np

_WORKER_DATASET = None


def _process_worker_init(dataset):
    """Runs once in each spawned worker: pin the (pickled-over) dataset."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_get(i: int):
    return _WORKER_DATASET[i]


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
        start: Tuple[int, int] = (0, 0),
        worker_mode: str = "thread",
    ):
        """``worker_mode="process"`` loads items in ``num_workers`` SPAWNED
        processes (GIL-free decode/resample — torch DataLoader's model,
        reference: trainers/basic.py:147-153) instead of threads. The dataset
        must be picklable; spawn (not fork) keeps the workers clear of the
        parent's JAX/XLA runtime threads."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        assert worker_mode in ("thread", "process"), worker_mode
        self.worker_mode = worker_mode
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = max(1, prefetch)
        assert batch_size % num_shards == 0, (
            f"global batch {batch_size} not divisible by {num_shards} shards"
        )
        #: rows this process loads and yields per global batch.
        self.local_batch_size = batch_size // num_shards
        #: (epoch, batch) cursor of the next batch to be yielded; updated as
        #: batches are CONSUMED (not prefetched), so it is always safe to save.
        self.position = tuple(start)
        #: total items fetched from the dataset (observability/tests).
        self.items_loaded = 0
        #: generation token: only the NEWEST iterator may advance the cursor
        #: (two live iterators would interleave self.position updates and
        #: corrupt the exact-resume contract).
        self._iter_gen = 0

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        """This process's item indices per global batch: [n_batches, local_bs].

        Every process computes the SAME global permutation and batch cut, then
        keeps its contiguous row block — the block this process's addressable
        devices own under the trainer's batch sharding."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        usable = (n // self.batch_size) * self.batch_size
        batches = idx[:usable].reshape(-1, self.batch_size)
        lo = self.shard_index * self.local_batch_size
        return batches[:, lo : lo + self.local_batch_size]

    def _collate(self, items) -> Dict[str, np.ndarray]:
        keys = items[0].keys()
        return {k: np.stack([it[k] for it in items], axis=0) for k in keys}

    def _cursors(self, start: Tuple[int, int]):
        """Infinite (next_position, item_indices) stream from ``start``."""
        epoch, batch0 = start
        while True:
            batches = self._epoch_indices(epoch)
            if len(batches) == 0:
                # Without this, the while-loop would spin forever recomputing
                # empty permutations and next() would hang at 100% CPU.
                raise ValueError(
                    f"dataset (len {len(self.dataset)}) yields zero full "
                    f"global batches of size {self.batch_size}"
                )
            for b in range(batch0, len(batches)):
                nxt = (epoch, b + 1) if b + 1 < len(batches) else (epoch + 1, 0)
                yield nxt, batches[b]
            epoch, batch0 = epoch + 1, 0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite iterator from the current ``position`` (the trainer counts
        steps, not epochs). Creating a new iterator supersedes any previous
        one: the old iterator raises rather than silently interleaving cursor
        updates with the new one."""
        self._iter_gen += 1
        gen = self._iter_gen
        if self.worker_mode == "process":
            pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_process_worker_init,
                initargs=(self.dataset,),
            )
            get_item = _process_worker_get
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            get_item = self.dataset.__getitem__
        cursors = self._cursors(self.position)
        # Pipeline: keep `prefetch` batches of per-item futures in flight; the
        # pool's num_workers threads drain them in parallel, order preserved
        # by the deque.
        pending: deque = deque()

        def submit_next():
            nxt, batch_idx = next(cursors)
            futs = [pool.submit(get_item, int(i)) for i in batch_idx]
            self.items_loaded += len(batch_idx)
            pending.append((nxt, futs))

        try:
            for _ in range(self.prefetch):
                submit_next()
            while True:
                if self._iter_gen != gen:
                    raise RuntimeError(
                        "this DataLoader iterator was superseded by a newer "
                        "iter() call; use one live iterator per loader"
                    )
                nxt, futs = pending.popleft()
                batch = self._collate([f.result() for f in futs])
                submit_next()
                self.position = nxt
                yield batch
        finally:
            for _, futs in pending:
                for f in futs:
                    f.cancel()
            pool.shutdown(wait=False, cancel_futures=True)
