"""Batching + prefetching loader.

The reference feeds the trainer with torch DataLoader worker processes
(reference src/DADiff.py:1582-1588).  Here the loader is a thread-prefetched
iterator that assembles NHWC numpy batches and (optionally) moves them to
device asynchronously — host IO overlaps with TPU steps.  When the native
C++ slice reader (founddiff_tpu.data.native) is built, datasets use it
transparently for .npy decoding.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


def _stack_batch(samples):
    """Stack a list of per-sample pytrees (lists/tuples/arrays) into batched
    numpy arrays."""
    first = samples[0]
    if isinstance(first, (list, tuple)):
        return type(first)(
            _stack_batch([s[i] for s in samples]) for i in range(len(first))
        )
    return np.stack(samples)


class Loader:
    """Iterates a map-style dataset in shuffled batches with thread prefetch.

    Args:
      dataset: object with ``__len__`` and ``__getitem__``.
      batch_size: global batch size (the caller shards across devices).
      shuffle: reshuffle each epoch.
      drop_last: drop the trailing partial batch.
      prefetch: number of batches to keep in flight (0 disables the thread).
      seed: shuffle seed.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: int = 0,
        device_put: bool = False,
        decode_threads: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        self.device_put = device_put
        # native pool decode: when the C++ loader is built and the dataset
        # exposes the (sample_paths, sample_from_arrays) protocol, all of a
        # batch's .npy files decode concurrently on the native thread pool
        # (the analogue of the reference's 4 DataLoader worker processes,
        # src/DADiff.py:1582-1588)
        self.decode_threads = decode_threads
        self._pool = None

    def _native_pool(self):
        """Lazy PrefetchPool, or None when unavailable/unsupported."""
        if self.decode_threads <= 0:
            return None
        if not (
            hasattr(self.dataset, "sample_paths")
            and hasattr(self.dataset, "sample_from_arrays")
        ):
            return None
        if self._pool is None:
            from founddiff_tpu.data import native

            if not native.available():
                return None
            self._pool = native.PrefetchPool(self.decode_threads)
        return self._pool

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _load_samples(self, chunk):
        pool = self._native_pool()
        if pool is None:
            return [self.dataset[int(i)] for i in chunk]
        # submit every file of the batch, then assemble per sample
        per_sample_paths = [self.dataset.sample_paths(int(i)) for i in chunk]
        flat = [p for ps in per_sample_paths for p in ps]
        arrays = pool.load_many(flat)
        samples, pos = [], 0
        for i, ps in zip(chunk, per_sample_paths):
            samples.append(
                self.dataset.sample_from_arrays(
                    int(i), arrays[pos : pos + len(ps)]
                )
            )
            pos += len(ps)
        return samples

    def _batches(self):
        idx = self._epoch_indices()
        n = len(idx)
        stop = n - (n % self.batch_size) if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            chunk = idx[start : start + self.batch_size]
            batch = _stack_batch(self._load_samples(chunk))
            if self.device_put:
                batch = jax.tree_util.tree_map(jax.device_put, batch)
            yield batch

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item


def cycle(loader: Loader) -> Iterator:
    """Endless batch stream (reference ``cycle`` src/DADiff.py:75-78)."""
    while True:
        yield from loader
