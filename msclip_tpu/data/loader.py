"""Prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader`` worker pool
(``tools/zero_shot.py:70-80``) with a thread-pool pipeline that decodes /
transforms on the host while the previous batch runs on the TPU. The last
batch is zero-padded to the fixed batch size with a validity mask, keeping
every jit-compiled step at a static shape (XLA requirement), instead of the
reference's variable final batch.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Iterator

import numpy as np


def sampler_order(n: int, sampler: str = "default", *, shuffle=False,
                  seed=0, labels=None, chunk_size: int = 256):
    """Sample-order generators for the ``DATASET.SAMPLER`` options the
    reference config tree exposes (``lib/config/default.py:74``; the
    implementations themselves are not in the released reference).

    * ``default``     — identity, optionally shuffled.
    * ``class_aware`` — rebalanced: each slot draws a class uniformly,
      then the next instance of that class (per-class shuffled cursors) —
      the standard class-aware sampler for long-tailed data.
    * ``chunk``       — shuffle chunk order but keep intra-chunk order:
      randomized epochs that preserve sequential-IO locality for
      TSV/shard-backed datasets.
    """
    rng = np.random.default_rng(seed)
    if sampler in ("default", "", None):
        order = np.arange(n)
        if shuffle:
            rng.shuffle(order)
        return order
    if sampler == "class_aware":
        if labels is None:
            raise ValueError(
                "class_aware sampler needs per-sample class labels; this "
                "dataset exposes none (image-text pair datasets have no "
                "classes — use DATASET.SAMPLER 'default' or 'chunk')"
            )
        labels = np.asarray(labels)
        classes = np.unique(labels)
        per_class = {c: rng.permutation(np.flatnonzero(labels == c))
                     for c in classes}
        cursors = {c: 0 for c in classes}
        draws = rng.choice(classes, size=n)
        out = np.empty(n, np.int64)
        for i, c in enumerate(draws):
            pool = per_class[c]
            if cursors[c] == len(pool):  # reshuffle exhausted class
                per_class[c] = pool = rng.permutation(pool)
                cursors[c] = 0
            out[i] = pool[cursors[c]]
            cursors[c] += 1
        return out
    if sampler == "chunk":
        order = np.arange(n)
        n_chunks = (n + chunk_size - 1) // chunk_size
        chunks = [order[i * chunk_size:(i + 1) * chunk_size]
                  for i in range(n_chunks)]
        rng.shuffle(chunks)
        return np.concatenate(chunks) if chunks else order
    raise ValueError(f"unknown sampler: {sampler!r}")


class BatchLoader:
    def __init__(self, dataset, batch_size: int, workers: int = 8,
                 prefetch: int = 4, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, shard: tuple = (0, 1),
                 sampler: str = "default", chunk_size: int = 256):
        self.dataset = dataset
        self.batch_size = batch_size
        self.workers = max(workers, 1)
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # (rank, world): striped multi-process sharding of the sample order
        self.shard = shard
        self.sampler = sampler or "default"
        self.chunk_size = chunk_size
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch used to derive the shuffle seed (the analogue of
        ``DistributedSampler.set_epoch``). Without explicit calls, every
        completed ``__iter__`` advances the epoch by one, so plain
        ``for epoch: for batch in loader`` reshuffles per epoch like
        ``DataLoader(shuffle=True)`` does."""
        self._epoch = int(epoch)

    def _labels(self):
        samples = getattr(self.dataset, "samples", None)
        if samples is not None and samples and isinstance(
            samples[0], (tuple, list)
        ):
            return [s[1] for s in samples]
        return None

    def _order(self):
        order = sampler_order(
            len(self.dataset), self.sampler, shuffle=self.shuffle,
            seed=self.seed + self._epoch, labels=self._labels(),
            chunk_size=self.chunk_size,
        )
        rank, world = self.shard
        return order[rank::world] if world > 1 else order

    def __len__(self):
        n = len(self._order())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        self._epoch += 1  # next bare __iter__ reshuffles (see set_epoch)
        # derive the count from the order in hand — len(self) would rerun
        # the full sampler draw (O(n), and at the already-bumped epoch)
        n = len(order)
        n_batches = (n // self.batch_size if self.drop_last
                     else (n + self.batch_size - 1) // self.batch_size)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def build_batch(idxs):
            samples = [self.dataset[int(i)] for i in idxs]
            images = np.stack([s[0] for s in samples]).astype(np.float32)
            labels = np.asarray([s[1] for s in samples])
            mask = np.ones(len(samples), bool)
            pad = self.batch_size - len(samples)
            if pad > 0:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)]
                )
                labels = np.concatenate(
                    [labels, np.zeros((pad,) + labels.shape[1:],
                                      labels.dtype)]
                )
                mask = np.concatenate([mask, np.zeros(pad, bool)])
            return {"image": images, "label": labels, "mask": mask}

        def producer():
            with cf.ThreadPoolExecutor(self.workers) as pool:
                futures = [pool.submit(build_batch, b) for b in batches]
                for fut in futures:
                    if stop.is_set():
                        fut.cancel()
                        continue
                    try:
                        out_q.put(fut.result())
                    except Exception as e:  # propagate to consumer
                        out_q.put(e)
                        return
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
