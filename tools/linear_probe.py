"""Linear-probe evaluation CLI (the reference's model-zoo "linear probing"
column; runner absent from the release, protocol per the CLIP paper).

    python tools/linear_probe.py --ds <dataset.yaml> --model <model.yaml> \
        [--probe sklearn|jax] [--sweep-c] [opts]
"""

import argparse
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
    p.add_argument("--sweep-c", action="store_true",
                   help="CLIP-paper protocol: validation sweep over the "
                        "regularization constant before the final fit "
                        "(sklearn probe only)")
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

    name = config.DATASET.DATASET
    # one dataset factory for every tool (config-derived transform,
    # native-decode option, loud empty-tree failures): make_dataset
    # handles the per-dataset split protocol via image_set
    train_ds = make_dataset(config, image_set="train")
    test_ds = make_dataset(config, image_set="test")

    probe_kw = {"sweep_c": True} if (args.sweep_c
                                     and args.probe == "sklearn") else {}
    acc = run_linear_probe(config, train_ds, test_ds, probe=args.probe,
                           **probe_kw)
    print(f"RESULT {name} linear_probe={acc:.3f}")
    return acc


if __name__ == "__main__":
    main()
