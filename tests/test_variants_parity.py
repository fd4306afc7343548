"""Oracle parity for remaining config variants: plain 6-conv stem (with and
without EARLY_CONV_NEW_IMPLEMENT), VISUAL_LAYER_MINUS1 sharing offset, and
the lateral-adapter option flags (NOLN_ADD / ADD_BN_RELU / ADD_BN_LN_RELU /
POOL_SIZE)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msclip_tpu.config import get_default_config
from msclip_tpu.models import build_model
from msclip_tpu.utils import convert_torch_state_dict

from reference_oracle import (
    load_reference_model_module,
    reference_available,
    tiny_msclips_config,
)
from test_crossattn_parity import _compare_msclips

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def plain_stem_config(new_implement=True):
    """6-conv stem configs need width 768 — the reference hardcodes the
    stem's BN channel counts (:2291-2331)."""
    from msclip_tpu.config import get_default_config

    c = get_default_config()
    c.merge_from_dict(
        {
            "MODEL": {
                "NAME": "clip_openai_pe_res_v1",
                "SPEC": {
                    "EMBED_DIM": 64,
                    "VISION": {"MODEL": "vit", "PATCH_SIZE": 32,
                                "WIDTH": 768, "LAYERS": 3},
                    "TEXT": {"TOKENIZER": "clip", "STYLE": "clip",
                              "CONTEXT_LENGTH": 77, "VOCAB_SIZE": 512,
                              "WIDTH": 64, "HEADS": 1, "LAYERS": 2},
                },
            },
            "TRAIN": {"IMAGE_SIZE": [64, 64]},
            "TEST": {"IMAGE_SIZE": [64, 64]},
            "CUSTOM": {
                "CUSTOM_ATTN": True,
                "EARLY_CONV": True,
                "EARLY_CONV_NEW_IMPLEMENT": new_implement,
            },
        }
    )
    return c


def test_plain_conv_stem_new_implement():
    _compare_msclips(plain_stem_config(new_implement=True),
                     image_only=True)


def test_plain_conv_stem_legacy_placement():
    """EARLY_CONV without NEW_IMPLEMENT: stem under visual.conv1, all
    LAYERS resblocks are transformer blocks."""
    _compare_msclips(plain_stem_config(new_implement=False),
                     image_only=True)


def test_visual_layer_minus1():
    cfg = tiny_msclips_config()
    cfg.CUSTOM.VISUAL_LAYER_MINUS1 = True
    model_spec_check = build_model(cfg).spec
    assert model_spec_check.n_trunk_blocks == 10  # 12 - stem - minus1
    # text block 1 is NOT shared (text[i+1] <- visual[i], i >= 1 -> j >= 2)
    assert not model_spec_check.text_layer_is_shared(1)
    assert model_spec_check.text_layer_is_shared(2)
    _compare_msclips(cfg)


def test_t2b_noln_add():
    cfg = tiny_msclips_config()
    cfg.CUSTOM.PRALLEL_T2B_NOLN_ADD = True
    _compare_msclips(cfg, image_only=True)


def test_t2b_add_bn_relu():
    cfg = tiny_msclips_config()
    cfg.CUSTOM.PRALLEL_T2B_ADD_BN_RELU = True
    _compare_msclips(cfg, image_only=True)


def test_t2b_add_bn_ln_relu():
    cfg = tiny_msclips_config()
    cfg.CUSTOM.PRALLEL_T2B_ADD_BN_LN_RELU = True
    _compare_msclips(cfg, image_only=True)


def test_t2b_pooling():
    cfg = tiny_msclips_config()
    cfg.CUSTOM.merge_from_dict({
        "PARALLEL_T2B_POOL_SIZE": [2, 2, 2, 2, 0],
        "PRALLEL_T2B_KERNELS": [8, 4, 2, 1, 1],
        "PRALLEL_T2B_STRIDES": [8, 4, 2, 1, 1],
        "PRALLEL_T2B_PADDINGS": [0, 0, 0, 0, 0],
    })
    _compare_msclips(cfg, image_only=True)
