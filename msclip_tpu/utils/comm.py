"""Multi-host communication helpers.

TPU-native equivalents of the reference's ``lib/utils/comm.py`` surface
(SURVEY.md §2.5), built on JAX process APIs and collectives instead of
``torch.distributed``/NCCL. Inside jit, collectives are just
``jax.lax.psum``/``all_gather``; these helpers cover the *host-side*
(eager) uses: rank bookkeeping, barriers, object gather, and metric
reduction.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


class Comm:
    """Rank/world-size accessors that degrade to single-process (the
    reference's ``Comm`` guards, ``lib/utils/comm.py:12-65``)."""

    @property
    def rank(self) -> int:
        return jax.process_index()

    @property
    def world_size(self) -> int:
        return jax.process_count()

    @property
    def local_rank(self) -> int:
        return 0  # one JAX process drives all local chips

    def is_main_process(self) -> bool:
        return self.rank == 0

    def synchronize(self) -> None:
        """Global barrier (reference ``synchronize``, comm.py:54-65)."""
        if self.world_size == 1:
            return
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("msclip_comm_synchronize")


comm = Comm()


def init_distributed() -> None:
    """Multi-host initialization (reference ``init_distributed``,
    ``lib/utils/utils.py:61-73``). Single-process is a no-op; on a
    multi-host pod slice, coordinator discovery comes from the TPU
    environment."""
    if (
        jax.process_count() > 1
        or _env_requests_distributed()
    ):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # already initialized


def _env_requests_distributed() -> bool:
    import os

    return bool(os.environ.get("COORDINATOR_ADDRESS"))


def all_gather_object(data):
    """Gather arbitrary picklable data from every process (reference
    ``all_gather``, comm.py:68-108)."""
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    import pickle

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to the max length across processes
    length = np.array([payload.size], np.int32)
    all_lengths = multihost_utils.process_allgather(length).ravel()
    max_len = int(all_lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(all_lengths[i])].tobytes())
        for i in range(jax.process_count())
    ]


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """Concatenate a per-process array along axis 0 across processes
    (host-side analogue of the reference's ``gather_tensors``; the
    *training* gather is ``jax.lax.all_gather`` inside jit).

    Leading dims may DIFFER across processes — the eval stripes
    (``order[rank::world]``) differ by up to one batch when the dataset
    size is not divisible by the world size, and a raw
    ``process_allgather`` of unequal shapes crashes gloo / mis-gathers
    (observed in the 2-process test). Gather the lengths first, pad to
    the max, and slice the padding back off."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    n = np.array([x.shape[0]], np.int32)
    all_n = multihost_utils.process_allgather(n).ravel()
    max_n = int(all_n.max())
    if x.shape[0] < max_n:
        pad = np.zeros((max_n - x.shape[0],) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad])
    out = multihost_utils.process_allgather(x)  # [P, max_n, ...]
    return np.concatenate(
        [out[i, : int(all_n[i])] for i in range(len(all_n))]
    )


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Reduce scalar metrics across processes (reference ``reduce_dict``,
    comm.py:111-137). Every process gets the result (allreduce rather than
    the reference's rank-0 reduce — strictly more useful, same cost on
    ICI)."""
    if jax.process_count() == 1:
        return dict(d)
    keys = sorted(d.keys())
    vec = np.asarray([float(d[k]) for k in keys], np.float32)
    total = gather_arrays(vec[None]).sum(axis=0)
    if average:
        total = total / jax.process_count()
    return dict(zip(keys, total.tolist()))
