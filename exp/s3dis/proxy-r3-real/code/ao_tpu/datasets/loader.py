"""Host-side data loading: sharded sampling + threaded prefetch.

TPU-native replacement of torch DataLoader + DistributedSampler
(reference: pointcept/engines/train.py:209-226): each JAX process draws a
disjoint shard of a deterministically shuffled epoch permutation
(``set_epoch`` semantics via epoch-seeded RNG), prepares batches with a
worker pool, and keeps a small prefetch queue ahead of the device.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


class ShardedSampler:
    """Deterministic per-epoch permutation, sharded across processes."""

    def __init__(
        self,
        dataset_len: int,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        drop_last: bool = True,
    ):
        self.dataset_len = dataset_len
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        order = np.arange(self.dataset_len)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1_000_003 + self.epoch)
            rng.shuffle(order)
        if self.drop_last:
            per_shard = self.dataset_len // self.num_shards
            order = order[: per_shard * self.num_shards]
        else:
            pad = (-len(order)) % self.num_shards
            order = np.concatenate([order, order[:pad]])
        return iter(order[self.shard_index :: self.num_shards].tolist())

    def __len__(self):
        if self.drop_last:
            return self.dataset_len // self.num_shards
        return -(-self.dataset_len // self.num_shards)


class DataLoader:
    """Batched loader with worker-pool sample prep and prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[ShardedSampler] = None,
        collate_fn: Callable = None,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        worker_init_fn: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(len(dataset), shuffle=False)
        self.collate_fn = collate_fn or (lambda x: x)
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.worker_init_fn = worker_init_fn

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self) -> Iterator:
        pool = ThreadPoolExecutor(
            max_workers=self.num_workers, initializer=self.worker_init_fn
        )
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for batch_idx in self._batches():
                    if stop.is_set():
                        break
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    out_q.put(self.collate_fn(samples))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)
