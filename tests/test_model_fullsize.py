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


@pytest.mark.slow
def test_fullsize_checkpoint_roundtrip(repo_root):
    """The strongest released-checkpoint proxy available without the
    OneDrive weights (VERDICT r1 #6): full-geometry b32
    torch -> JAX -> torch -> JAX, with embedding equality at every hop.
    Covers all ~700 keys including aliased shared duplicates and the
    5-stage conv branch."""
    import torch

    from msclip_tpu.utils import export_torch_state_dict

    ref_mod = load_reference_model_module()
    cfg = _load_cfg(repo_root, "b32-yfcc-msclips")
    torch.manual_seed(0)
    ref = ref_mod.get_clip_model(cfg)
    ref.eval()
    torch.manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(7)
    images = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    tokens = np.zeros((1, 77), dtype=np.int64)
    tokens[:, 0] = 49406
    tokens[0, 1:6] = rng.integers(1, 49000, 5)
    tokens[0, 6] = 49407

    with torch.no_grad():
        t0_img = ref.encode_image(torch.tensor(images)).numpy()
        t0_txt = ref.encode_text(torch.tensor(tokens)).numpy()

    # hop 1: torch -> JAX (alias verification runs on every shared key)
    model = build_model(cfg)
    p1 = convert_torch_state_dict(ref.state_dict(), model.spec)
    j1_img = np.asarray(
        model.encode_image(p1, jnp.array(images.transpose(0, 2, 3, 1)))
    )
    j1_txt = np.asarray(model.encode_text(p1, jnp.array(tokens)))
    np.testing.assert_allclose(j1_img, t0_img, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(j1_txt, t0_txt, atol=5e-4, rtol=1e-3)

    # hop 2: JAX -> torch. A FRESH reference model loaded from the export
    # must reproduce the original embeddings exactly.
    sd = export_torch_state_dict(p1, model.spec)
    torch.manual_seed(123)  # different init: everything must come from sd
    ref2 = ref_mod.get_clip_model(cfg)
    ref2.eval()
    missing, unexpected = ref2.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)
    with torch.no_grad():
        t1_img = ref2.encode_image(torch.tensor(images)).numpy()
        t1_txt = ref2.encode_text(torch.tensor(tokens)).numpy()
    np.testing.assert_allclose(t1_img, t0_img, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(t1_txt, t0_txt, atol=1e-5, rtol=1e-5)

    # hop 3: torch -> JAX again; params and embeddings bit-identical
    p2 = convert_torch_state_dict(ref2.state_dict(), model.spec)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    j2_img = np.asarray(
        model.encode_image(p2, jnp.array(images.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_array_equal(j2_img, j1_img)
