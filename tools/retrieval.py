"""Image-text retrieval evaluation CLI (Flickr30k / COCO, Karpathy
splits).

    python tools/retrieval.py --model <model.yaml> \
        --ann DATASET/flickr30k/dataset_flickr30k.json \
        --images DATASET/flickr30k/images [--split test] [opts]

Encodes the split's images and captions with the configured checkpoint
and reports bidirectional recall@{1,5,10} (the MS-CLIP paper's retrieval
protocol; absent from the reference release, whose eval is zero-shot
classification only — see msclip_tpu/eval/retrieval.py).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.utils.logging import create_logger


def parse_args():
    p = argparse.ArgumentParser(description="Image-text retrieval eval.")
    p.add_argument("--model", required=True, help="model configure file")
    p.add_argument("--ann", required=True, help="Karpathy json annotation")
    p.add_argument("--images", required=True, help="image root directory")
    p.add_argument("--split", default="test",
                   choices=["train", "val", "test"])
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    config = get_default_config()
    update_config(config, args.model, opts=args.opts)
    config.NAME = ""
    create_logger(config, args.model, f"retrieval_{args.split}")

    import functools

    from msclip_tpu.data.retrieval_datasets import load_karpathy_split
    from msclip_tpu.data.transforms import pil_eval_transform
    from msclip_tpu.eval.checkpoint_load import load_model_params
    from msclip_tpu.eval.retrieval import run_retrieval
    from msclip_tpu.models import build_model

    model = build_model(config)
    params = load_model_params(config, model)
    if config.TPU.get("FOLD_BN", True):
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, model.spec)

    transform = functools.partial(
        pil_eval_transform,
        size=config.TEST.IMAGE_SIZE[0],
        mean=tuple(config.INPUT.MEAN),
        std=tuple(config.INPUT.STD),
    )
    images, captions, cap2img = load_karpathy_split(
        args.images, args.ann, split=args.split, transform=transform
    )
    logging.info(
        f"=> retrieval {args.split}: {len(images)} images, "
        f"{len(captions)} captions"
    )
    out = run_retrieval(
        model, params, images, captions, cap2img,
        batch_size=config.TEST.BATCH_SIZE_PER_GPU,
        workers=config.WORKERS,
    )
    i2t, t2i = out["i2t"], out["t2i"]
    print(
        "RESULT retrieval "
        f"i2t_r1={i2t[1]:.2f} i2t_r5={i2t[5]:.2f} i2t_r10={i2t[10]:.2f} "
        f"t2i_r1={t2i[1]:.2f} t2i_r5={t2i[5]:.2f} t2i_r10={t2i[10]:.2f}"
    )
    return out


if __name__ == "__main__":
    main()
