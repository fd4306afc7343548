"""ModifiedResNet tower parity vs the reference torch model (the [off]
ResNet path, ``clip_openai_pe_res_v1.py:33-201``, selected by list-valued
VISION.LAYERS)."""

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


def resnet_config(width=16, image_size=64):
    c = get_default_config()
    c.merge_from_dict(
        {
            "MODEL": {
                "NAME": "clip_openai_pe_res_v1",
                "SPEC": {
                    "EMBED_DIM": 64,
                    "VISION": {
                        "MODEL": "resnet",
                        "PATCH_SIZE": 32,
                        "WIDTH": width,
                        "LAYERS": [1, 1, 1, 1],
                    },
                    "TEXT": {
                        "TOKENIZER": "clip",
                        "STYLE": "clip",
                        "CONTEXT_LENGTH": 77,
                        "VOCAB_SIZE": 512,
                        "WIDTH": 64,
                        "HEADS": 1,
                        "LAYERS": 2,
                    },
                },
            },
            "TRAIN": {"IMAGE_SIZE": [image_size, image_size]},
            "TEST": {"IMAGE_SIZE": [image_size, image_size]},
            "CUSTOM": {"CUSTOM_ATTN": True},
        }
    )
    return c


def test_resnet_tower_parity():
    import torch

    ref_mod = load_reference_model_module()
    # The reference's CLIP.dtype property reads visual.positional_embedding,
    # which ModifiedResNet doesn't have — its ResNet path is broken as
    # released. Patch the property for the oracle run only.
    ref_mod.CLIP.dtype = property(lambda self: torch.float32)
    cfg = resnet_config()
    torch.manual_seed(0)
    ref = ref_mod.get_clip_model(cfg)
    ref.eval()
    torch.manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    model = build_model(cfg)
    assert model.spec.vision_resnet_layers == (1, 1, 1, 1)
    params = convert_torch_state_dict(ref.state_dict(), model.spec)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    # reference encode_image passes action=... which ModifiedResNet.forward
    # doesn't accept (broken as released); call the tower + norm directly
    with torch.no_grad():
        want = ref.visual(torch.tensor(images))
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    got = np.asarray(
        model.encode_image(params, jnp.asarray(images.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

    # text side unaffected
    tokens = np.zeros((2, 77), np.int64)
    tokens[:, 0] = 510
    tokens[:, 1:4] = rng.integers(1, 500, (2, 3))
    tokens[:, 4] = 511
    with torch.no_grad():
        want_t = ref.encode_text(torch.tensor(tokens)).numpy()
    got_t = np.asarray(model.encode_text(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got_t, want_t, atol=3e-4, rtol=1e-3)
