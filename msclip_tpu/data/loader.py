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
from collections import deque
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
        # Vectorized: each slot draws a class uniformly, then consumes the
        # next instance of that class from a per-class shuffled stream
        # (re-permuted on exhaustion). Grouping both the label pools and the
        # draw slots with one stable argsort keeps the whole epoch O(n log n)
        # numpy work — the per-sample Python loop this replaces was minutes
        # of host time per epoch at YFCC-22M scale.
        labels = np.asarray(labels)
        classes = np.unique(labels)
        draws = rng.choice(classes, size=n)
        # pools grouped by class: argsort(labels) sliced at class
        # boundaries — bounded by the DATASET size, not the draw count
        # (n may be smaller/larger than len(labels))
        by_label = np.argsort(labels, kind="stable")
        pool_starts = np.searchsorted(labels[by_label], classes)
        pool_ends = np.append(pool_starts[1:], len(labels))
        # slots grouped by drawn class, in slot order (stable sort)
        by_draw = np.argsort(draws, kind="stable")
        drawn, counts = np.unique(draws[by_draw], return_counts=True)
        slot_starts = np.cumsum(np.append(0, counts[:-1]))
        out = np.empty(n, np.int64)
        cls_index = {c: i for i, c in enumerate(classes)}
        for c, k, s0 in zip(drawn, counts, slot_starts):
            ci = cls_index[c]
            pool = by_label[pool_starts[ci]:pool_ends[ci]]
            reps = -(-int(k) // len(pool))  # ceil: reshuffles on exhaustion
            seq = np.concatenate(
                [rng.permutation(pool) for _ in range(reps)]
            )[: int(k)]
            out[by_draw[s0 : s0 + k]] = seq
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
                 sampler: str = "default", chunk_size: int = 256,
                 equal_shards: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.workers = max(workers, 1)
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # (rank, world): striped multi-process sharding of the sample order
        self.shard = shard
        # equal_shards pads the order by wrapping (torch DistributedSampler
        # semantics) so every rank's stripe — and therefore its batch
        # count — is identical. REQUIRED for training: when
        # len(dataset) % world crosses a batch boundary, unequal stripes
        # give ranks different step counts per epoch, so one rank
        # dispatches a train step whose mesh collectives wait on a peer
        # that already moved on (distributed deadlock), and the resume
        # modulus (step % num_batches) desynchronizes across ranks.
        # Leave False for eval: exactly-once coverage, unequal tails
        # handled by the metric gather's padding.
        self.equal_shards = equal_shards
        self.sampler = sampler or "default"
        self.chunk_size = chunk_size
        self._epoch = 0
        self._skip_batches = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch used to derive the shuffle seed (the analogue of
        ``DistributedSampler.set_epoch``). Without explicit calls, every
        completed ``__iter__`` advances the epoch by one, so plain
        ``for epoch: for batch in loader`` reshuffles per epoch like
        ``DataLoader(shuffle=True)`` does."""
        self._epoch = int(epoch)

    def fast_forward(self, n_batches: int) -> None:
        """Skip the first ``n_batches`` batches of the NEXT ``__iter__``
        only — mid-epoch resume support: after restoring a checkpoint taken
        at step k inside an epoch, skipping ``k % steps_per_epoch`` batches
        re-aligns the data stream with the restored step/schedule instead of
        replaying the epoch's early samples. One-shot by design (consumed
        and reset), so subsequent epochs iterate in full."""
        self._skip_batches = max(int(n_batches), 0)

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
        if world <= 1:
            return order
        if self.equal_shards:
            pad = (-len(order)) % world
            if pad:  # wrap: repeat the head so stripes are equal length
                order = np.concatenate([order, order[:pad]])
        return order[rank::world]

    @property
    def num_batches(self) -> int:
        """Per-epoch batch count, computed arithmetically — no sampler
        draw (O(n) host work at corpus scale), so resume bookkeeping can
        use it freely. Correct for every sampler (they all emit one index
        per dataset element before striping; asserted in tests)."""
        n = len(self.dataset)
        rank, world = self.shard
        if world > 1:
            stripe = (-(-n // world) if self.equal_shards
                      else len(range(rank, n, world)))
        else:
            stripe = n
        if self.drop_last:
            return stripe // self.batch_size
        return (stripe + self.batch_size - 1) // self.batch_size

    def __len__(self):
        return self.num_batches

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
        if self._skip_batches:  # one-shot mid-epoch resume fast-forward
            batches = batches[self._skip_batches :]
            self._skip_batches = 0

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def build_batch(idxs):
            samples = [self.dataset[int(i)] for i in idxs]
            images = np.stack([s[0] for s in samples])
            if images.dtype != np.uint8:  # uint8-boundary datasets stay u8
                images = images.astype(np.float32)
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

        def put(item) -> bool:
            # bounded put that aborts when the consumer goes away instead
            # of blocking a daemon thread on a full queue forever
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # Submit-on-drain: at most prefetch + workers batches exist in
            # any state (queued results + in-flight futures) at once, so a
            # slow consumer bounds host memory at O(prefetch + workers)
            # batches instead of materializing the whole epoch (an
            # ImageNet-val eval fully materialized is ~30 GB fp32).
            max_outstanding = self.prefetch + self.workers
            with cf.ThreadPoolExecutor(self.workers) as pool:
                pending: "deque" = deque()
                batch_iter = iter(batches)

                def top_up():
                    while len(pending) < max_outstanding:
                        idxs = next(batch_iter, None)
                        if idxs is None:
                            return
                        pending.append(pool.submit(build_batch, idxs))

                top_up()
                while pending and not stop.is_set():
                    fut = pending.popleft()
                    try:
                        item = fut.result()
                    except Exception as e:  # propagate to consumer
                        put(e)
                        for f in pending:
                            f.cancel()
                        return
                    if not put(item):
                        break
                    top_up()
                for f in pending:
                    f.cancel()
            put(None)

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
