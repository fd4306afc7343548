#!/usr/bin/env python
"""One-command released-checkpoint verification (the accuracy north-star).

The released MS-CLIP-S weights are an external OneDrive download
(``/root/reference/README.md:24-28``; this sandbox has no egress, so
there is no fetch step — mount the ``.pth`` yourself).  The moment a
checkpoint (and optionally an ImageNet-1K val folder) is available:

    python tools/eval_released.py --ckpt /path/to/b32-yfcc.pth \
        [--model b32-yfcc-msclips] [--imagenet /path/to/imagenet/val]

* without ``--imagenet``: converts the real state_dict (strict coverage:
  every torch key consumed, every JAX leaf filled, aliases verified) and
  runs one forward — the "weights arrived, everything downstream works"
  gate (tier 1 of ``tests/test_released_ckpt.py``).
* with ``--imagenet``: full zero-shot IN-1K eval; exits non-zero unless
  top-1 is within ``--tolerance`` (default 0.1) of the published number
  (36.7 b32-yfcc / 39.0 b16-yfcc / 40.2 b32-laion — the reference's
  headline table, ``README.md:26-28``, evaluated by its
  ``tools/zero_shot.py:223-224``).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPECTED_TOP1 = {
    "b32-yfcc-msclips": 36.7,
    "b16-yfcc-msclips": 39.0,
    "b32-laion-msclips": 40.2,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="released .pth path")
    ap.add_argument("--model", default="b32-yfcc-msclips",
                    choices=sorted(EXPECTED_TOP1))
    ap.add_argument("--imagenet", default=None,
                    help="ImageNet-1K val dir (ImageFolder layout); "
                         "omit for the convert+forward gate only")
    ap.add_argument("--tolerance", type=float, default=0.1)
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("MSCLIP_EVAL_BATCH", "256")))
    args = ap.parse_args()

    if not os.path.exists(args.ckpt):
        sys.exit(f"checkpoint not found: {args.ckpt}")

    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    cfg = get_default_config()
    update_config(
        cfg, os.path.join(REPO, "experiments/model", args.model + ".yaml")
    )
    cfg.MODEL.PRETRAINED_MODEL = args.ckpt

    # tier 1: strict conversion + one forward
    import numpy as np

    from msclip_tpu.eval.checkpoint_load import load_model_params
    from msclip_tpu.models import build_model

    model = build_model(cfg)
    params = load_model_params(cfg, model)
    import jax.numpy as jnp

    images = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((2, 224, 224, 3)).astype(np.float32)
    )
    feats = np.asarray(model.encode_image(params, images))
    assert np.isfinite(feats).all(), "non-finite embeddings"
    norms = np.linalg.norm(feats, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3), norms
    print(f"[tier 1 OK] {args.ckpt}: state_dict fully consumed, forward "
          f"finite and unit-norm ({args.model})")

    if not args.imagenet:
        print("no --imagenet given; skipping the top-1 check "
              f"(published: {EXPECTED_TOP1[args.model]})")
        return

    val = args.imagenet.rstrip("/")
    if not os.path.isdir(val):
        sys.exit(f"ImageNet val dir not found: {val}")
    cfg.DATASET.DATASET = "imagenet"
    cfg.DATASET.ROOT = os.path.dirname(val)
    cfg.DATASET.TEST_SET = os.path.basename(val)
    cfg.TEST.BATCH_SIZE_PER_GPU = args.batch

    from msclip_tpu.eval import run_zero_shot

    top1, stats = run_zero_shot(cfg)
    expected = EXPECTED_TOP1[args.model]
    delta = abs(top1 - expected)
    print(f"zero-shot IN-1K top-1 {top1:.2f} vs published {expected} "
          f"(|delta| {delta:.3f}, n={stats.get('n_images')})")
    if stats.get("n_images", 0) < 49000:
        sys.exit(f"val set incomplete: {stats.get('n_images')} images")
    if delta > args.tolerance:
        sys.exit(f"FAIL: top-1 {top1:.2f} outside +/-{args.tolerance} "
                 f"of {expected}")
    print("[tier 2 OK] matches the published number")


if __name__ == "__main__":
    main()
