"""Host-side data loading: shuffled batching, SSL batch mixing, prefetch.

Replaces torch DataLoader usage (train.py:103-162, pretrain.py:124-162).
Workers default to PROCESSES on multi-core hosts (like the reference's
DataLoader workers): the per-scene NumPy pipeline holds the GIL for most of
its ops — an 8-thread pool measured ZERO speedup over one thread. A real
40k-point ScanNet scene costs ~11 ms to load+augment (~90 scenes/s/core),
so a multi-core TPU host keeps a 168 scenes/s device step fed with 2+
process workers; on a single-core host (like this dev container) no worker
model can help and threads avoid the fork/IPC overhead (auto-detected).
Fork-based workers inherit the dataset; each sample is drawn under a
DETERMINISTIC per-(epoch, index) np.random seed, which is stronger than the
reference's per-worker seeding (train.py:157-162 + the np.random.seed()
entropy reseed at :562-564) while sampling from the same distribution. A
double-buffered prefetcher overlaps host batch assembly with device steps —
the TPU equivalent of pinned-memory + async H2D copies.
"""
import multiprocessing
import os
import threading
import queue as queue_mod
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np


def collate(samples):
    """Stack a list of sample dicts into a batch dict."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


_WORKER_DS = None


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _worker_get(args):
    idx, sample_seed = args
    if sample_seed is not None:
        np.random.seed(sample_seed)
    return _WORKER_DS[idx]


class DataLoader:
    """Epoch-shuffled batch iterator with a process (default) or thread
    pool for __getitem__."""

    def __init__(self, dataset, batch_size, shuffle=True, drop_last=True,
                 num_workers=4, seed=0, worker_type=None):
        if worker_type is None:
            worker_type = "process" if (os.cpu_count() or 1) > 1 else "thread"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.worker_type = worker_type
        self._pool = None
        self._epoch = 0
        # Fork EAGERLY, at construction: the drivers build their loaders
        # before the first device op, so the fork happens while the process
        # is still (nearly) single-threaded. Forking lazily from inside
        # __iter__ would run under the prefetch thread AFTER the TPU client
        # and its gRPC/BLAS threads are live — the classic
        # fork-after-threads deadlock setup.
        if self.worker_type == "process" and self.num_workers > 0:
            self._spawn_process_pool()

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _spawn_process_pool(self):
        """Fork a persistent worker pool (startup ~100 ms/worker — amortized
        across epochs). Falls back to threads when fork is unavailable."""
        try:
            ctx = multiprocessing.get_context("fork")
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_init_worker, initargs=(self.dataset,))
            # fail fast (no fork support, dead dataset path, ...)
            next(iter(self._pool.map(_worker_get, [(0, 0)])))
        except Exception:
            self.close()
            self._pool = ThreadPoolExecutor(
                max_workers=max(self.num_workers, 1))
            self.worker_type = "thread"

    def _get_pool(self):
        if self._pool is None:
            if self.worker_type == "process" and self.num_workers > 0:
                self._spawn_process_pool()
            else:
                self._pool = ThreadPoolExecutor(
                    max_workers=max(self.num_workers, 1))
                self.worker_type = "thread"
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        pool = self._get_pool()
        epoch = self._epoch
        self._epoch += 1
        for b in range(nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            if self.worker_type == "process":
                # deterministic, collision-resistant per-(loader seed,
                # epoch, index) sample seed (SeedSequence hashes the tuple
                # — a linear formula aliased across epochs once the dataset
                # outgrew the epoch stride)
                tasks = [
                    (int(i), int(np.random.SeedSequence(
                        (self.seed, epoch, int(i))).generate_state(1)[0]))
                    for i in idxs
                ]
                try:
                    samples = list(pool.map(_worker_get, tasks))
                except Exception:
                    # a dead worker (e.g. OOM-killed) poisons the whole
                    # executor; rebuild once, then let errors surface
                    self.close()
                    pool = self._get_pool()
                    if self.worker_type == "process":
                        samples = list(pool.map(_worker_get, tasks))
                    else:
                        samples = list(
                            pool.map(self.dataset.__getitem__, idxs))
            else:
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
            try:
                return next(self._unlabeled_iter)
            except StopIteration:
                # e.g. batch_size > len(dataset) with drop_last: the loader
                # yields ZERO batches per epoch and cycling can never make
                # progress — fail loudly instead of spinning
                raise RuntimeError(
                    "SSLBatcher: the unlabeled loader yields no batches "
                    f"({len(self.unlabeled_loader.dataset)} scenes, batch "
                    f"size {self.unlabeled_loader.batch_size}, drop_last="
                    f"{self.unlabeled_loader.drop_last})") from None

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
    """Background-thread prefetch of already-collated batches.

    Producer exceptions are forwarded and re-raised in the consumer — a
    dying producer thread must not leave the consumer blocked on q.get()
    forever."""
    q = queue_mod.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 — forwarded, not dropped
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
