"""Feature extraction CLI (the dispatcher's ``--save-feature`` capability).

Dumps L2-normalized image-tower features + labels for a dataset to an
``.npz`` file (consumed by linear probes or retrieval indexes).

    python tools/extract_features.py --ds <dataset.yaml> \
        --model <model.yaml> --out features.npz [opts]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.eval import load_model_params, make_dataset
from msclip_tpu.eval.linear_probe import extract_features
from msclip_tpu.models import build_model
from msclip_tpu.utils.logging import create_logger


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    p = argparse.ArgumentParser(description="Extract image features.")
    p.add_argument("--ds", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--out", default="features.npz")
    p.add_argument("--image-set", default="test", choices=["train", "test"],
                   help="dataset split to featurize (probe protocols need "
                        "both)")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = p.parse_args()

    config = get_default_config()
    update_config(config, args.ds)
    update_config(config, args.model, opts=args.opts)
    create_logger(config, args.model, "extract_features")

    model = build_model(config)
    params = load_model_params(config, model)
    dataset = make_dataset(config, image_set=args.image_set)
    feats, labels = extract_features(
        model, params, dataset,
        batch_size=config.TEST.BATCH_SIZE_PER_GPU, workers=config.WORKERS,
    )
    np.savez(args.out, features=feats, labels=labels)
    print(f"RESULT saved {feats.shape} features to {args.out}")


if __name__ == "__main__":
    main()
