"""Zero-shot evaluation CLI.

Same public interface as the reference ``tools/zero_shot.py``:

    python tools/zero_shot.py --ds <dataset.yaml> --model <model.yaml> [opts]

Merges the dataset config then the model config (reference ``:185-188``),
builds the model + prompt-ensemble classifier, and runs the metric loop.
"""

import argparse
import logging
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.eval import run_zero_shot
from msclip_tpu.utils.logging import create_logger


def parse_args():
    parser = argparse.ArgumentParser(
        description="Zero-shot evaluation of a CLIP model.")
    parser.add_argument("--ds", required=True,
                        help="Evaluation dataset configure file name.")
    parser.add_argument("--model", required=True,
                        help="Evaluation model configure file name")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="Modify config options using the command-line")
    return parser.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    config = get_default_config()
    update_config(config, args.ds)
    update_config(config, args.model, opts=args.opts)
    config.NAME = ""

    pretrained = config.MODEL.get("PRETRAINED_MODEL", "") or "scratch/none"
    tag = pretrained.split("/")[-2] if "/" in pretrained else "none"
    final_output_dir = create_logger(config, args.model, f"zero_shot_{tag}")
    logging.info(pprint.pformat(vars(args)))
    logging.info(f"=> saving logging info into: {final_output_dir}")

    value, stats = run_zero_shot(config)
    print(f"RESULT {config.DATASET.DATASET} "
          f"{stats['metric']}={value:.3f} "
          f"images_per_sec={stats['images_per_sec']:.0f}")
    return value


if __name__ == "__main__":
    main()
