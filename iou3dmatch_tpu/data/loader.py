"""Host-side data loading: shuffled batching, SSL batch mixing, prefetch.

Replaces torch DataLoader usage (train.py:103-162, pretrain.py:124-162).
Workers are threads (NumPy releases the GIL for the heavy ops); a
double-buffered prefetcher overlaps host batch assembly with device steps —
the TPU equivalent of pinned-memory + async H2D copies.
"""
import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples):
    """Stack a list of sample dicts into a batch dict."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DataLoader:
    """Epoch-shuffled batch iterator with a thread pool for __getitem__."""

    def __init__(self, dataset, batch_size, shuffle=True, drop_last=True,
                 num_workers=4, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(nb):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                samples = list(pool.map(self.dataset.__getitem__, idxs))
                yield collate(samples)


class SSLBatcher:
    """Zips a labeled loader with a cycling unlabeled loader and merges the
    two batch dicts exactly like the reference (train.py:312-328): keys
    present in BOTH are concatenated [labeled | unlabeled]; label-only keys
    keep their labeled-row count."""

    def __init__(self, labeled_loader, unlabeled_loader):
        self.labeled_loader = labeled_loader
        self.unlabeled_loader = unlabeled_loader
        self._unlabeled_iter = None

    def __len__(self):
        return len(self.labeled_loader)

    def _next_unlabeled(self):
        if self._unlabeled_iter is None:
            self._unlabeled_iter = iter(self.unlabeled_loader)
        try:
            return next(self._unlabeled_iter)
        except StopIteration:
            self._unlabeled_iter = iter(self.unlabeled_loader)
            return next(self._unlabeled_iter)

    def __iter__(self):
        for labeled in self.labeled_loader:
            unlabeled = self._next_unlabeled()
            batch = dict(labeled)
            for k in unlabeled:
                if k in labeled:
                    batch[k] = np.concatenate([labeled[k], unlabeled[k]], axis=0)
                else:
                    batch[k] = unlabeled[k]
            yield batch


def prefetch(iterator, size=2):
    """Background-thread prefetch of already-collated batches."""
    q = queue_mod.Queue(maxsize=size)
    sentinel = object()

    def producer():
        for item in iterator:
            q.put(item)
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
