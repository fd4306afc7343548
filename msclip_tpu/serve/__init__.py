"""Production serving: AOT-exported inference bundles + a dynamic-batching
inference server.

The reference stack has no serving story (research eval scripts only,
``/root/reference/tools/zero_shot.py``); this subsystem is the TPU-native
deployment path the task calls for:

* :mod:`.export` — serialize the inference functions ahead of time with
  ``jax.export`` (StableHLO) at a ladder of static batch buckets, plus the
  parameters and an optional prompt-ensemble classifier, into a
  self-contained on-disk *bundle*. Static shapes keep every bucket on the
  MXU/Pallas fast path; the loader pads requests to the nearest bucket.
* :mod:`.batcher` — a dynamic micro-batcher that coalesces concurrent
  single-image/text requests into device batches.
* :mod:`.server` — a threaded HTTP server (stdlib only) exposing
  ``/v1/embed/image``, ``/v1/embed/text``, ``/v1/classify``,
  ``/healthz`` and ``/stats`` on top of a loaded bundle.
* :mod:`.live` — the multi-chip alternative to a bundle: the same
  ``ServingModel`` interface jitted live over a 1-D mesh of all local
  devices (data-parallel batch sharding, replicated params).

See docs/SERVING.md for the deployment recipe.
"""

from .batcher import DynamicBatcher
from .export import ServingModel, export_bundle, load_bundle, pil_to_uint8
from .live import live_serving_model

__all__ = [
    "DynamicBatcher",
    "ServingModel",
    "export_bundle",
    "live_serving_model",
    "load_bundle",
    "pil_to_uint8",
]
