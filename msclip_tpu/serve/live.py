"""Live (in-process, multi-chip) serving mode.

The AOT bundle path (:mod:`.export`) targets one chip per server
process. For models or traffic that should span **all local chips of a
host**, this module builds the same :class:`~.export.ServingModel`
interface directly from model code + params, jitted over a 1-D
``('data',)`` mesh of the local devices: every bucket's batch dim is
sharded across chips (XLA splits the tower per chip, exactly like the
sharded eval loop in ``eval/device.py``), params are replicated once.

The batcher/HTTP layers are unchanged — ``InferenceServer`` accepts
either model. Bucket sizes are rounded up to multiples of the device
count so the batch axis always divides the mesh.

Reference counterpart: none (the reference has no serving path; its
one-process-one-GPU eval binding is ``CUDA_VISIBLE_DEVICES`` per rank).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .export import DEFAULT_BUCKETS, ServingModel


def live_serving_model(
    model,
    params,
    *,
    buckets: Optional[Sequence[int]] = None,
    image_size: int = 224,
    classifier: Optional[np.ndarray] = None,
    classnames: Optional[Sequence[str]] = None,
    mean=None,
    std=None,
    devices=None,
) -> ServingModel:
    """Build a :class:`ServingModel` that runs ``model`` live over all
    local devices (data-parallel batch sharding, replicated params)."""
    import jax

    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD, normalize_uint8

    devices = list(devices) if devices is not None else jax.local_devices()
    n_dev = len(devices)
    mean_t = tuple(mean) if mean is not None else IMAGENET_MEAN
    std_t = tuple(std) if std is not None else IMAGENET_STD
    spec = model.spec

    raw = [int(b) for b in (buckets or DEFAULT_BUCKETS)]
    # round every bucket up to a multiple of the device count so the
    # batch axis divides the mesh evenly
    buckets = sorted({-(-b // n_dev) * n_dev for b in raw})

    def image_fn(p, images_u8):
        # shared op-order-exact normalize — the uint8-boundary bit-identity
        # contract lives in ONE function (data/transforms.normalize_uint8)
        return model.encode_image(p, normalize_uint8(images_u8, mean_t,
                                                     std_t))

    def text_fn(p, tokens):
        return model.encode_text(p, tokens)

    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("data",))
        rep = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, rep)
        jit_kw = {"in_shardings": (rep, batch)}
    else:
        params = jax.device_put(params, devices[0])
        jit_kw = {}

    # one jitted callable per bucket (static shapes keep XLA on the
    # tiled MXU/Pallas paths, same rationale as the AOT bucket ladder)
    image_fns = {b: jax.jit(image_fn, **jit_kw) for b in buckets}
    text_fns = {b: jax.jit(text_fn, **jit_kw) for b in buckets}

    manifest = {
        "buckets": buckets,
        "image_size": int(image_size),
        "context_length": int(spec.context_length),
        "embed_dim": int(spec.embed_dim),
        "mean": [float(v) for v in mean_t],
        "std": [float(v) for v in std_t],
        "live": True,
        "devices": n_dev,
    }
    if classnames is not None:
        manifest["classnames"] = list(classnames)
    clf = np.asarray(classifier, np.float32) if classifier is not None \
        else None
    return ServingModel(manifest, image_fns, text_fns, params, clf)
