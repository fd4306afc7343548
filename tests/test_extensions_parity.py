"""Oracle parity for the experimental plug-in families ([off] in released
configs; reference clip_openai_pe_res_v1.py — LoRA :345-428/548-581,
CvT :300-314/835-917, ConViT :446-514, Container :516-533, adapters
:819-833, gumbel dual-branch :941-987)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.config import get_default_config
from msclip_tpu.models import build_model
from msclip_tpu.utils import convert_torch_state_dict

from reference_oracle import load_reference_model_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def vit_config(custom, width=128, image_size=64, patch=16):
    c = get_default_config()
    c.merge_from_dict(
        {
            "MODEL": {
                "NAME": "clip_openai_pe_res_v1",
                "SPEC": {
                    "EMBED_DIM": 64,
                    "VISION": {"MODEL": "vit", "PATCH_SIZE": patch,
                                "WIDTH": width, "LAYERS": 3},
                    "TEXT": {"TOKENIZER": "clip", "STYLE": "clip",
                              "CONTEXT_LENGTH": 77, "VOCAB_SIZE": 512,
                              "WIDTH": width, "HEADS": width // 64,
                              "LAYERS": 3},
                },
            },
            "TRAIN": {"IMAGE_SIZE": [image_size, image_size]},
            "TEST": {"IMAGE_SIZE": [image_size, image_size]},
            "CUSTOM": {"CUSTOM_ATTN": True, **custom},
        }
    )
    return c


def _compare(cfg, atol=3e-4, action=None, seed=0):
    import torch

    ref_mod = load_reference_model_module()
    torch.manual_seed(seed)
    ref = ref_mod.get_clip_model(cfg)
    ref.eval()
    torch.manual_seed(seed + 1)
    with torch.no_grad():
        for mmod in ref.modules():
            if isinstance(mmod, torch.nn.BatchNorm2d):
                mmod.running_mean.normal_(0, 0.1)
                mmod.running_var.uniform_(0.5, 1.5)

    model = build_model(cfg)
    params = convert_torch_state_dict(ref.state_dict(), model.spec)

    img_size = cfg.TRAIN.IMAGE_SIZE[0]
    rng = np.random.default_rng(42)
    images = rng.standard_normal((2, 3, img_size, img_size)).astype(
        np.float32
    )
    tokens = np.zeros((2, 77), np.int64)
    tokens[:, 0] = 510
    tokens[:, 1:5] = rng.integers(1, 500, (2, 4))
    tokens[:, 5] = 511

    t_action = None if action is None else torch.tensor(
        np.asarray(action, np.float32)
    )
    with torch.no_grad():
        want_i = ref.encode_image(torch.tensor(images),
                                  action=t_action).numpy()
        want_t = ref.encode_text(torch.tensor(tokens),
                                 action=t_action).numpy()
    j_action = None if action is None else jnp.asarray(action)
    got_i = np.asarray(
        model.encode_image(params, jnp.asarray(images.transpose(0, 2, 3, 1)),
                           action=j_action)
    )
    got_t = np.asarray(
        model.encode_text(params, jnp.asarray(tokens), action=j_action)
    )
    np.testing.assert_allclose(got_i, want_i, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(got_t, want_t, atol=atol, rtol=1e-3)


def test_houlsby_adapters():
    _compare(vit_config({"ADAPTER_FLAG": True, "ADAPTER_ATTN_DIM": 16}))


def test_adapter_subset_layers():
    _compare(vit_config({"ADAPTER_FLAG": True, "ADAPTER_ATTN_DIM": 16,
                         "ADAPTER_LAYERS": [1]}))


def test_cvt_outside():
    _compare(vit_config({"CVT_IN_V": True, "CVT_V_KERNEL": 3,
                         "CVT_V_STRIDE": 1, "CVT_V_PAD": 1}))


def test_cvt_outside_residual():
    _compare(vit_config({"CVT_IN_V": True, "CVT_V_KERNEL": 3,
                         "CVT_V_STRIDE": 1, "CVT_V_PAD": 1,
                         "CVT_V_RES": True}))


def test_cvt_inside_qv():
    _compare(vit_config({"CVT_IN_V": True, "CVT_INSIDE": True,
                         "CVT_INSIDE_Q": True, "CVT_INSIDE_V": True,
                         "CVT_V_KERNEL": 3, "CVT_V_STRIDE": 1,
                         "CVT_V_PAD": 1}))


def test_container():
    _compare(vit_config({"CONTAINER_IN_V": True}))


def test_convit():
    # heads must be a perfect square for the locality init kernel
    _compare(vit_config({"CONVIT_IN_V": True}, width=256))


def test_lora_v0():
    _compare(vit_config({"LORA_ATTN_DIM": 8, "LORA_ATTN_ALPHA": 16}))


def test_lora_v1_moe():
    _compare(vit_config({
        "LORA_ATTN_DIM": 8, "LORA_ATTN_ALPHA": 16,
        "LORA_WHERE_ADD": "v1", "LORA_MOE": 1, "LORA_MOE_GROUP": 4,
        "LORA_MOE_ACT": "sigmoid", "LORA_MOE_SOFTMAX": 1,
    }))


def test_lora_v2_fc():
    _compare(vit_config({"LORA_ATTN_DIM": 8, "LORA_ATTN_ALPHA": 16,
                         "LORA_WHERE_ADD": "v2"}))


def test_gumbel_addtwo():
    action = np.zeros((3, 2), np.float32)
    action[:, 0] = 1.0  # all shared
    action[1] = [0.0, 1.0]  # middle layer specific
    _compare(vit_config({"GUMBEL_SELECT": True, "GUMBEL_ADDTWO": True}),
             action=action)
