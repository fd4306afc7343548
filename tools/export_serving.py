"""Export a model config + checkpoint into a deployable serving bundle.

    python tools/export_serving.py --model <model.yaml> --out <dir> \
        [--buckets 1,4,16,64] [--classify-prompts imagenet] \
        [--platforms tpu] [opts]

The bundle (MANIFEST.json + per-bucket ``jax.export`` blobs + params.npz
+ optional prompt-ensemble classifier) is everything a serve host needs —
it loads with ``msclip_tpu.serve.load_bundle`` and runs under
``tools/serve.py`` with no model code. See docs/SERVING.md.

The reference stack has no deployment/export path; this subsystem is
TPU-native-only.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config


def parse_args():
    p = argparse.ArgumentParser(description="Export a serving bundle.")
    p.add_argument("--model", required=True, help="model config yaml")
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--buckets", default="1,4,16,64",
                   help="comma-separated static batch buckets")
    p.add_argument("--platforms", default="",
                   help="comma-separated export platforms "
                        "(default: current backend)")
    p.add_argument("--classify-prompts", default="",
                   help="prompt-set name (e.g. imagenet) to bake a "
                        "zero-shot classifier into the bundle")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    config = get_default_config()
    update_config(config, args.model, opts=args.opts)
    logging.basicConfig(level=logging.INFO)

    from msclip_tpu.eval.checkpoint_load import load_model_params
    from msclip_tpu.models import build_model
    from msclip_tpu.serve import export_bundle

    model = build_model(config)
    params = load_model_params(config, model)
    if config.TPU.get("FOLD_BN", True):
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, model.spec)

    classifier = classnames = None
    if args.classify_prompts:
        from msclip_tpu.data.prompts import get_classnames, get_templates
        from msclip_tpu.data.tokenizer import ClipTokenizer
        from msclip_tpu.eval.zero_shot import build_zeroshot_classifier

        classnames = get_classnames(args.classify_prompts)
        templates = get_templates(args.classify_prompts)
        logging.info(f"=> building classifier: {len(classnames)} classes "
                     f"x {len(templates)} templates")
        classifier = build_zeroshot_classifier(
            model, params, ClipTokenizer(), classnames, templates
        )

    buckets = [int(b) for b in args.buckets.split(",") if b]
    platforms = ([p for p in args.platforms.split(",") if p]
                 or None)
    size = config.TEST.IMAGE_SIZE[0]
    manifest = export_bundle(
        model, params, args.out,
        buckets=buckets, image_size=size, platforms=platforms,
        classifier=classifier, classnames=classnames,
    )
    n_bytes = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out)
    )
    print(f"EXPORTED {args.out} buckets={manifest['buckets']} "
          f"platforms={manifest['platforms']} bytes={n_bytes}")


if __name__ == "__main__":
    main()
