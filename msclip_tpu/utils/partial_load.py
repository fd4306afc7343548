"""Partial pretrained loading: GPT-2-style text weights into the shared
trunk.

The JAX equivalent of ``smart_partial_load_model_state_dict``
(``lib/utils/utils.py:217-275``): maps transformer-LM block weights (GPT-2
naming, Conv1D layout) onto the *visual trunk blocks* that the text tower
shares, for the layer range implied by ``N_LAYERS`` /
``SHARE_BOTTOM_LAYER``. GPT-2's Conv1D stores weights as ``[in, out]`` —
the same as our JAX layout, so unlike the reference (torch Linear
``[out, in]``) **no transpose is needed for the matmul weights**.

Default mapping (the ``pt_mapping`` arg of the reference, GPT-2 names):
  ``attn.c_attn.weight -> attn.qkv_w``    ``attn.c_attn.bias -> attn.qkv_b``
  ``attn.c_proj.*      -> attn.out_*``    ``mlp.c_fc.* / mlp.c_proj.*``
  ``ln_1.* / ln_2.*    -> ln_1 / ln_2``
"""

from __future__ import annotations

import logging
from typing import Dict

import jax.numpy as jnp
import numpy as np

DEFAULT_GPT2_MAPPING = {
    "attn.c_attn.weight": ("attn", "qkv_w"),
    "attn.c_attn.bias": ("attn", "qkv_b"),
    "attn.c_proj.weight": ("attn", "out_w"),
    "attn.c_proj.bias": ("attn", "out_b"),
    "mlp.c_fc.weight": ("mlp", "c_fc", "w"),
    "mlp.c_fc.bias": ("mlp", "c_fc", "b"),
    "mlp.c_proj.weight": ("mlp", "c_proj", "w"),
    "mlp.c_proj.bias": ("mlp", "c_proj", "b"),
    "ln_1.weight": ("ln_1", "scale"),
    "ln_1.bias": ("ln_1", "bias"),
    "ln_2.weight": ("ln_2", "scale"),
    "ln_2.bias": ("ln_2", "bias"),
}


def load_layer_range(spec) -> list:
    """Layers receiving pretrained weights (reference ``:218-226``)."""
    n = spec.text_layers
    if spec.share_n_layers == -1:
        return list(range(n))
    if spec.share_bottom_layer:
        return list(range(spec.share_n_layers))
    return list(range(spec.share_n_layers, n))


def partial_load_gpt2(params, spec, pt_state_dict: Dict[str, np.ndarray],
                      mapping=None):
    """Load GPT-2 block weights into the shared visual-trunk blocks.

    ``pt_state_dict``: flat dict whose keys contain ``<layer>.<gpt2 name>``
    (e.g. ``h.3.attn.c_attn.weight`` or ``3.attn.c_attn.weight``).
    Returns a new params tree; unmatched keys are logged, not errors
    (mirroring the reference's matched/non-matched bookkeeping).
    """
    if not spec.share_modules:
        raise ValueError(
            "partial pretrained load is only implemented for the "
            "modality-shared model (reference behavior)"
        )
    mapping = mapping or DEFAULT_GPT2_MAPPING
    layers = load_layer_range(spec)
    stem_off = 1 if spec.stem_in_trunk else 0

    from ..train.trainer import _copy_containers

    params = _copy_containers(params)
    matched, unmatched = [], []
    for l_id in layers:
        blk = params["visual"]["blocks"][l_id - stem_off]
        for pt_suffix, path in mapping.items():
            pt_pattern = f"{l_id}.{pt_suffix}"
            hit = next(
                (k for k in pt_state_dict if k.endswith(pt_pattern)), None
            )
            if hit is None:
                unmatched.append(pt_pattern)
                continue
            value = np.asarray(pt_state_dict[hit])
            node = blk
            for part in path[:-1]:
                node = node[part]
            expected = node[path[-1]]
            if value.shape != tuple(expected.shape):
                raise ValueError(
                    f"shape mismatch {hit}: {value.shape} vs "
                    f"{tuple(expected.shape)}"
                )
            node[path[-1]] = jnp.asarray(value, jnp.float32)
            matched.append(hit)
    logging.info(
        f"[Partial Load] matched {len(matched)} tensors into layers "
        f"{layers}; unmatched patterns: {len(unmatched)}"
    )
    return params
