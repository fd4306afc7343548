"""Full-geometry parity: the real b32/b16 MS-CLIP-S YAMLs at 224px against
the reference torch model (random init + randomized BN stats). Validates
the production lateral-adapter geometry (t2b kernel/stride schedules, grid
7x7 vs 14x14) and the width-768 sharing layout end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.models import build_model
from msclip_tpu.utils import convert_torch_state_dict

from reference_oracle import load_reference_model_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def _load_cfg(repo_root, name):
    cfg = get_default_config()
    update_config(cfg, str(repo_root / "experiments/dataset/imagenet.yaml"))
    update_config(cfg, str(repo_root / f"experiments/model/{name}.yaml"))
    return cfg


@pytest.mark.parametrize("name", ["b32-yfcc-msclips", "b16-yfcc-msclips"])
def test_fullsize_parity(repo_root, name):
    import torch

    ref_mod = load_reference_model_module()
    cfg = _load_cfg(repo_root, name)
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
    assert model.spec.grid == (7 if "b32" in name else 14)
    params = convert_torch_state_dict(ref.state_dict(), model.spec)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    tokens = np.zeros((2, 77), dtype=np.int64)
    tokens[:, 0] = 49406
    tokens[0, 1:8] = rng.integers(1, 49000, 7)
    tokens[0, 8] = 49407
    tokens[1, 1:4] = rng.integers(1, 49000, 3)
    tokens[1, 4] = 49407

    with torch.no_grad():
        want_img = ref.encode_image(torch.tensor(images)).numpy()
        want_txt = ref.encode_text(torch.tensor(tokens)).numpy()

    got_img = np.asarray(
        model.encode_image(params, jnp.array(images.transpose(0, 2, 3, 1)))
    )
    got_txt = np.asarray(model.encode_text(params, jnp.array(tokens)))

    np.testing.assert_allclose(got_img, want_img, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(got_txt, want_txt, atol=5e-4, rtol=1e-3)
