"""Linear-probe evaluation CLI (the reference's model-zoo "linear probing"
column; runner absent from the release, protocol per the CLIP paper).

    python tools/linear_probe.py --ds <dataset.yaml> --model <model.yaml> \
        [--probe sklearn|jax] [opts]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.eval.linear_probe import run_linear_probe
from msclip_tpu.eval.zero_shot import make_dataset
from msclip_tpu.utils.logging import create_logger


def parse_args():
    p = argparse.ArgumentParser(description="Linear probe a CLIP model.")
    p.add_argument("--ds", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--probe", default="sklearn", choices=["sklearn", "jax"])
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    config = get_default_config()
    update_config(config, args.ds)
    update_config(config, args.model, opts=args.opts)

    create_logger(config, args.model, "linear_probe")

    import os.path as op

    from msclip_tpu.data.datasets import (
        ChestXRay8,
        ImageFolderDataset,
        SyntheticImageDataset,
        Voc2007Classification,
    )

    name = config.DATASET.DATASET
    root = config.DATASET.ROOT
    from msclip_tpu.data.probe_datasets import (
        PROBE_DATASETS,
        build_probe_dataset,
    )

    import functools

    from msclip_tpu.data.transforms import pil_eval_transform

    # config-derived eval transform (TEST.IMAGE_SIZE / INPUT stats),
    # same construction as eval/zero_shot.py:make_dataset
    tf = functools.partial(
        pil_eval_transform,
        size=config.TEST.IMAGE_SIZE[0],
        mean=tuple(config.INPUT.MEAN),
        std=tuple(config.INPUT.STD),
    )

    if name in PROBE_DATASETS:
        # transfer-suite layouts (cifar/mnist/food-101/...):
        # README.md:24-30's probe suite, loaders in data/probe_datasets.py
        train_ds = build_probe_dataset(name, root, "train", transform=tf)
        test_ds = build_probe_dataset(name, root, "test", transform=tf)
    elif name == "voc2007classification":
        train_ds = Voc2007Classification(root, image_set="train",
                                         transform=tf)
        test_ds = Voc2007Classification(root, image_set="test",
                                        transform=tf)
    elif name == "chestxray8":
        train_ds = ChestXRay8(root, image_set="train", transform=tf)
        test_ds = ChestXRay8(root, image_set="test", transform=tf)
    elif name == "synthetic":
        n = config.DATASET.get("NUM_SAMPLES", 256)
        c = config.DATASET.get("NUM_CLASSES", 10)
        size = config.TEST.IMAGE_SIZE[0]
        train_ds = SyntheticImageDataset(n=n, size=size, n_classes=c, seed=0)
        test_ds = SyntheticImageDataset(n=n // 2, size=size, n_classes=c,
                                        seed=10_000)
    else:
        train_ds = ImageFolderDataset(
            op.join(root, config.DATASET.TRAIN_SET), transform=tf
        )
        test_ds = ImageFolderDataset(op.join(root, config.DATASET.TEST_SET),
                                     transform=tf)

    acc = run_linear_probe(config, train_ds, test_ds, probe=args.probe)
    print(f"RESULT {name} linear_probe={acc:.3f}")
    return acc


if __name__ == "__main__":
    main()
