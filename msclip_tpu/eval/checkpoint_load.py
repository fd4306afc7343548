"""Model-parameter loading for evaluation.

Resolution order for ``MODEL.PRETRAINED_MODEL``:

1. ``*.pth`` / ``*.pt``  — a reference torch checkpoint (bare ``state_dict``
   like the released OneDrive files, or a training-dict with a
   ``state_dict`` key, ``lib/utils/utils.py:107-154``), converted through
   the torch->JAX key map.
2. ``*.msgpack`` / orbax directory — a native checkpoint saved by this
   framework.
3. empty / missing — randomly initialized params (useful for CI and
   benchmarks on synthetic data).
"""

from __future__ import annotations

import logging
import os

import jax

from ..models import MSClipModel
from ..utils.convert import convert_torch_state_dict


def load_model_params(config, model: MSClipModel, seed: int = 0):
    path = config.MODEL.get("PRETRAINED_MODEL", "")
    if path and os.path.exists(path):
        logging.info(f"=> load model file: {path}")
        if path.endswith((".pth", ".pt")):
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=False)
            # training-dict checkpoints nest the weights under 'state_dict'
            if isinstance(obj, dict) and "state_dict" in obj and isinstance(
                obj["state_dict"], dict
            ):
                obj = obj["state_dict"]
            return convert_torch_state_dict(obj, model.spec)
        from ..train.checkpoint import restore_params

        return restore_params(path, model)
    if path:
        logging.warning(
            f"=> PRETRAINED_MODEL {path} not found; using random init"
        )
    return model.init(jax.random.PRNGKey(seed))
