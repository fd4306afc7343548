"""Local-device data parallelism for the eval/feature loops.

The reference binds one process to one GPU (``CUDA_VISIBLE_DEVICES`` per
rank); on TPU a single host process owns all local chips, so every
batched inference loop shards its batch over a 1-D local mesh instead —
``TEST.BATCH_SIZE_PER_GPU`` keeps its per-chip meaning and XLA splits
the tower per chip. Multi-host evaluation composes with this: processes
stripe the dataset (``utils/comm.py``), chips split each stripe's batch.
"""

from __future__ import annotations

import jax
import numpy as np


def local_batch_sharding():
    """Returns ``(n_local_devices, NamedSharding | None)``.

    The sharding (batch-axis split over all local devices) is None when
    only one device is visible, so callers can keep the single-chip fast
    path free of device_put.
    """
    n = jax.local_device_count()
    if n <= 1:
        return 1, None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
    return n, NamedSharding(mesh, P("data"))
