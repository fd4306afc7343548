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


class BatchLoader:
    def __init__(self, dataset, batch_size: int, workers: int = 8,
                 prefetch: int = 4, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, shard: tuple = (0, 1)):
        self.dataset = dataset
        self.batch_size = batch_size
        self.workers = max(workers, 1)
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # (rank, world): striped multi-process sharding of the sample order
        self.shard = shard

    def _order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(order)
        rank, world = self.shard
        return order[rank::world] if world > 1 else order

    def __len__(self):
        n = len(self._order())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        n_batches = len(self)
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
