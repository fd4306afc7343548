"""Zero-shot evaluation job dispatcher.

Same public interface as the reference ``tools/eval_zeroshot.py``: maps
dataset names to dataset YAMLs and launches ``tools/zero_shot.py`` in a
subprocess per dataset. (Unlike the reference, config ``opts`` given on
the command line are forwarded to each job.)

    python tools/eval_zeroshot.py --model experiments/model/<cfg>.yaml \
        [--ds imagenet[,name2...]]
"""

import argparse
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> config path, auto-registered from experiments/dataset/*.yaml
# (the reference's literal table, tools/eval_zeroshot.py:5-7, scaled to
# the full suite; --ds also accepts explicit YAML paths)
_DS_DIR = os.path.join(REPO_ROOT, "experiments", "dataset")
cfg_files_dataset = {
    os.path.splitext(f)[0]: os.path.join(_DS_DIR, f)
    for f in sorted(os.listdir(_DS_DIR)) if f.endswith(".yaml")
}


def parse_args():
    parser = argparse.ArgumentParser(
        description="Dispatch zero-shot evaluation jobs"
    )
    parser.add_argument("--ds", type=str,
                        help="comma-separated dataset names (or dataset "
                             "YAML paths); default: all registered")
    parser.add_argument("--model", required=True, type=str,
                        help="model config YAML for every job")
    parser.add_argument("--save-feature", default=False, type=str,
                        help="accepted for interface compatibility "
                             "(use tools/extract_features.py to dump "
                             "features)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="KEY VALUE config overrides appended to "
                             "each job")
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
            raise Exception(
                f"unknown dataset {name!r}: neither a YAML path nor a "
                f"registered name ({sorted(cfg_files_dataset)})"
            )

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
