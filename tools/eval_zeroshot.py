"""Zero-shot evaluation job dispatcher.

Same public interface as the reference ``tools/eval_zeroshot.py``: maps
dataset names to dataset YAMLs and launches ``tools/zero_shot.py`` in a
subprocess per dataset.

    python tools/eval_zeroshot.py --model experiments/model/<cfg>.yaml \
        [--ds imagenet[,name2...]]
"""

import argparse
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg_files_dataset = {
    "imagenet": os.path.join(REPO_ROOT, "experiments/dataset/imagenet.yaml"),
}


def parse_args():
    parser = argparse.ArgumentParser(description="Zeroshot Eval")
    parser.add_argument("--ds", type=str,
                        help="Evaluation dataset configure file name.")
    parser.add_argument("--model", required=True, type=str,
                        help="Evaluation model configure file name")
    parser.add_argument("--save-feature", default=False, type=str,
                        help="Flag to save feature or not")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="Modify config options using the command-line")
    return parser.parse_args()


def run_jobs():
    args = parse_args()
    datasets = (
        list(cfg_files_dataset.keys()) if args.ds is None
        else args.ds.split(",")
    )
    for name in datasets:
        if not os.path.exists(name) and not os.path.exists(
            cfg_files_dataset.get(name, "")
        ):
            raise Exception(f"Dataset {name} does not exist.")

    for name in datasets:
        cfg_file_ds = name if os.path.exists(name) else cfg_files_dataset[name]
        cmd = [
            sys.executable,
            os.path.join(REPO_ROOT, "tools/zero_shot.py"),
            "--ds", cfg_file_ds,
            "--model", args.model,
        ] + (args.opts or [])
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    run_jobs()
