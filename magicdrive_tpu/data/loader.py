"""Host-side batching data loader with background prefetch.

Replaces the reference's torch DataLoader + worker processes
(ref:magicdrive/runner/base_runner.py:116-146): a thread pool maps the
(numpy, GIL-releasing) sample pipeline, batches with
:func:`magicdrive_tpu.data.collate.collate_fn`, and keeps a bounded queue of
ready batches so the TPU step never waits on the host. Deterministic:
shuffling is driven by an explicit seed per epoch (SURVEY.md §5.2 — the
functional redesign removes the shared-mem cache races of the reference).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Sequence

import numpy as np

from .collate import CollateConfig, collate_fn


class DataLoader:
    """Iterable over collated numpy batches.

    Args:
      dataset: indexable returning sample dicts (collate contract).
      batch_size: static batch size; incomplete tail batches are dropped so
        every batch has identical shapes (no recompilation under jit).
    """

    def __init__(self, dataset, batch_size: int, cfg: CollateConfig,
                 shuffle: bool = False, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 2,
                 tokenizer=None, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.cfg = cfg
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.tokenizer = tokenizer
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _batches(self, order: np.ndarray):
        for i in range(0, len(order), self.batch_size):
            idx = order[i:i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        self.epoch += 1

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make_batch(idx):
            samples = [self.dataset[int(j)] for j in idx]
            return collate_fn(samples, self.cfg, tokenizer=self.tokenizer,
                              rng=np.random.default_rng(
                                  (self.seed, self.epoch, int(idx[0]))))

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(make_batch, idx)
                           for idx in self._batches(order)]
                for fut in futures:
                    if stop.is_set():
                        fut.cancel()
                        continue
                    try:
                        q.put(fut.result())
                    except Exception as e:  # surface worker errors
                        q.put(e)
                        return
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def shard_for_process(indices: Sequence[int], process_index: int,
                      process_count: int) -> list:
    """Contiguous-stride sharding of sample indices across hosts — the
    jax-native analogue of accelerate's distributed sampler
    (ref:perception/data_prepare/val_set_gen.py:79)."""
    return list(indices)[process_index::process_count]
