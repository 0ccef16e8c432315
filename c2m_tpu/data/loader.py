"""Batching loader with background prefetch and deterministic host sharding.

Replaces torch DataLoader + DistributedSampler + the PyG-aware BatchCollate
(src/train.py:23-60): samples are already padded dense numpy arrays, so
collation is a plain stack; a thread pool overlaps decode with device compute
(the TPU analogue of pin_memory/non_blocking H2D); shuffling is epoch-seeded
(DistributedSampler.set_epoch parity, train.py:114,131); in multi-process
mode each host reads its disjoint shard.
"""

from __future__ import annotations

import queue
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    names = [s.get("name") for s in samples]
    for key in samples[0]:
        if key == "name":
            continue
        out[key] = np.stack([s[key] for s in samples])
    if names[0] is not None:
        out["names"] = names  # host-side metadata, stripped before device put
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = True,
                 host_id: int = 0, num_hosts: int = 1, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # disjoint host shard (DistributedSampler parity): pad to a multiple
        # of num_hosts by wrapping, then stride.
        if self.num_hosts > 1:
            pad = (-n) % self.num_hosts
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.host_id::self.num_hosts]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        def load_batch(batch_idx):
            return collate([self.dataset[int(i)] for i in batch_idx])

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = queue.Queue()
            it = iter(batches)
            for _ in range(min(self.prefetch, nb)):
                futures.put(pool.submit(load_batch, next(it)))
            produced = min(self.prefetch, nb)
            done = 0
            while done < nb:
                fut = futures.get()
                if produced < nb:
                    futures.put(pool.submit(load_batch, next(it)))
                    produced += 1
                done += 1
                yield fut.result()
