"""Released-checkpoint verification (BASELINE.md rows 1-3; VERDICT r3 #3).

The released MS-CLIP weights are an external OneDrive download
(``/root/reference/README.md:24-28``) and are not present in CI, so these
tests are *readiness* gates: they auto-run the moment the files exist.

Tier 1 (checkpoint only): convert the real ``.pth`` through the torch->JAX
key map and run one forward — proves the converter covers the real key
set, not just the oracle-generated one.

Tier 2 (checkpoint + ImageNet-1K val): full zero-shot eval; top-1 must be
within 0.1 of the reference's published number (36.7 b32-yfcc / 39.0
b16-yfcc / 40.2 b32-laion).

Enable with:
  MSCLIP_RELEASED_CKPT=/path/to/b32-yfcc.pth   (or drop the file at
                                                OUTPUT_MODEL/b32-yfcc.pth)
  MSCLIP_IMAGENET_VAL=/path/to/imagenet/val    (tier 2 only; ImageFolder
                                                layout, 50k images)
  MSCLIP_RELEASED_MODEL=b32-yfcc-msclips       (default; or
                                                b16-yfcc-msclips /
                                                b32-laion-msclips)

The same run as a CLI (docs/MIGRATION.md "Verifying released weights"):
  python tools/zero_shot.py --ds experiments/dataset/imagenet.yaml \
      --model experiments/model/b32-yfcc-msclips.yaml \
      MODEL.PRETRAINED_MODEL <ckpt.pth> DATASET.ROOT <imagenet-root>
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_TOP1 = {
    # /root/reference/README.md:26-28
    "b32-yfcc-msclips": 36.7,
    "b16-yfcc-msclips": 39.0,
    "b32-laion-msclips": 40.2,
}


def _ckpt_path():
    p = os.environ.get("MSCLIP_RELEASED_CKPT")
    if p and os.path.exists(p):
        return p
    # Only the checkpoint matching the selected model counts: falling
    # back to a DIFFERENT released file would validate b32 weights
    # against the b16 config and report a bogus quality failure.
    model = _model_name()
    cand = os.path.join(
        REPO, "OUTPUT_MODEL", f"{model.split('-msclips')[0]}.pth"
    )
    return cand if os.path.exists(cand) else None


def _model_name():
    return os.environ.get("MSCLIP_RELEASED_MODEL", "b32-yfcc-msclips")


ckpt = _ckpt_path()
needs_ckpt = pytest.mark.skipif(
    ckpt is None,
    reason="released checkpoint not present: set MSCLIP_RELEASED_CKPT="
           "<path/to/.pth> (or place it at OUTPUT_MODEL/b32-yfcc.pth); "
           "download link in /root/reference/README.md",
)


def _build_config():
    from msclip_tpu.config import get_default_config, update_config

    cfg = get_default_config()
    update_config(
        cfg, os.path.join(REPO, "experiments/model", _model_name() + ".yaml")
    )
    cfg.MODEL.PRETRAINED_MODEL = ckpt
    return cfg


@needs_ckpt
def test_released_checkpoint_converts_and_forwards():
    """The real released state_dict must convert cleanly (every key
    consumed, aliases verified) and produce finite, unit-norm embeddings.
    This is the 'weights arrived, everything downstream is one command
    away' gate."""
    import jax.numpy as jnp

    from msclip_tpu.eval.checkpoint_load import load_model_params
    from msclip_tpu.models import build_model

    cfg = _build_config()
    model = build_model(cfg)
    params = load_model_params(cfg, model)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    )
    feats = np.asarray(model.encode_image(params, images))
    assert np.isfinite(feats).all()
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3
    )


@needs_ckpt
@pytest.mark.skipif(
    not (os.environ.get("MSCLIP_IMAGENET_VAL")
         and os.path.isdir(os.environ.get("MSCLIP_IMAGENET_VAL", ""))),
    reason="ImageNet-1K val not present: set MSCLIP_IMAGENET_VAL="
           "<path/to/val> (ImageFolder layout, 50k images)",
)
def test_released_checkpoint_imagenet_top1():
    """Zero-shot IN-1K top-1 within 0.1 of the published number
    (SURVEY.md §6 exit criterion; BASELINE.md rows 1-3)."""
    from msclip_tpu.eval import run_zero_shot

    cfg = _build_config()
    val = os.environ["MSCLIP_IMAGENET_VAL"]
    cfg.DATASET.DATASET = "imagenet"
    cfg.DATASET.ROOT = os.path.dirname(val.rstrip("/"))
    cfg.DATASET.TEST_SET = os.path.basename(val.rstrip("/"))
    cfg.TEST.BATCH_SIZE_PER_GPU = int(
        os.environ.get("MSCLIP_EVAL_BATCH", "256")
    )

    expected = float(
        os.environ.get("MSCLIP_RELEASED_TOP1",
                       EXPECTED_TOP1[_model_name()])
    )
    top1, stats = run_zero_shot(cfg)
    assert stats["n_images"] >= 49000, stats
    assert abs(top1 - expected) <= 0.1, (
        f"zero-shot IN-1K top-1 {top1:.2f} vs published {expected} "
        f"(model {_model_name()}, ckpt {ckpt})"
    )


# ---------------------------------------------------------------------------
# Converter key-set coverage (runs WITHOUT the released weights)
# ---------------------------------------------------------------------------
# The released .pth files are state_dicts of the reference torch model
# built from the released config, so the oracle-built model's key set IS
# the released file's key set. Asserting strict coverage for every
# released config here means the only thing between this repo and the
# accuracy north-star is mounting the weight files themselves
# (VERDICT r4 next-round #7).

def test_converter_covers_all_released_key_sets(repo_root):
    from reference_oracle import (load_reference_model_module,
                                  reference_available)

    if not reference_available():
        pytest.skip("reference checkout not mounted")
    import torch

    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.models import build_model
    from msclip_tpu.utils import convert_torch_state_dict

    ref_mod = load_reference_model_module()
    key_sets = {}
    for name in sorted(EXPECTED_TOP1):
        cfg = get_default_config()
        update_config(
            cfg, str(repo_root / f"experiments/model/{name}.yaml")
        )
        model = build_model(cfg)
        torch.manual_seed(0)
        ref = ref_mod.get_clip_model(cfg)
        sd = ref.state_dict()
        key_sets[name] = set(sd.keys())
        # strict=True (the default): raises if any torch key is left
        # unconsumed or any JAX leaf unfilled
        params = convert_torch_state_dict(sd, model.spec)
        assert params is not None
    # the two b32 releases (yfcc / laion) share one geometry, hence one
    # key set; b16 differs only in patch embedding / grid-sized tensors
    assert key_sets["b32-yfcc-msclips"] == key_sets["b32-laion-msclips"]
