"""End-to-end CLI tests: the config-driven public API, invoked exactly as
the reference documents (README.md:40-45), on a real ImageFolder with JPEG
files and a converted torch checkpoint."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_OPTS = [
    "TRAIN.IMAGE_SIZE", "[64,64]", "TEST.IMAGE_SIZE", "[64,64]",
    "TEST.BATCH_SIZE_PER_GPU", "4",
    "MODEL.SPEC.VISION.WIDTH", "128", "MODEL.SPEC.VISION.LAYERS", "2",
    "MODEL.SPEC.VISION.PATCH_SIZE", "32",
    "MODEL.SPEC.TEXT.WIDTH", "128", "MODEL.SPEC.TEXT.HEADS", "2",
    "MODEL.SPEC.TEXT.LAYERS", "2", "MODEL.SPEC.EMBED_DIM", "32",
    "WORKERS", "2",
]


@pytest.fixture(scope="module")
def imagefolder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("val")
    rng = np.random.default_rng(0)
    # two fake wnid class dirs like ImageNet val
    for cls in ("n01440764", "n01443537"):
        (root / cls).mkdir()
        for i in range(3):
            arr = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"{cls}_{i}.JPEG")
    return root


def _run(cmd, cwd=REPO):
    env = dict(os.environ)
    env["MSCLIP_PLATFORM"] = "cpu"  # tools apply this via jax.config
    return subprocess.run(
        [sys.executable] + cmd, cwd=cwd, capture_output=True, text=True,
        env=env, timeout=600,
    )


def test_zero_shot_cli_imagefolder(imagefolder, tmp_path):
    """tools/zero_shot.py over a real JPEG ImageFolder: full pipeline
    incl. prompt-ensemble classifier and metric loop."""
    r = _run([
        "tools/zero_shot.py",
        "--ds", "experiments/dataset/imagenet.yaml",
        "--model", "experiments/model/b32.yaml",
        "DATASET.ROOT", str(imagefolder.parent),
        "DATASET.TEST_SET", imagefolder.name,
        "OUTPUT_DIR", str(tmp_path / "out"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RESULT imagenet accuracy=" in r.stdout


def test_export_then_eval_torch_checkpoint(imagefolder, tmp_path):
    """Export a torch .pth from random params, then evaluate loading it —
    exercises the converter round trip through the real CLI."""
    out_pth = tmp_path / "model.pth"
    r = _run([
        "tools/export_torch_checkpoint.py",
        "--model", "experiments/model/b32.yaml",
        "--out", str(out_pth),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_pth.exists()

    r = _run([
        "tools/zero_shot.py",
        "--ds", "experiments/dataset/imagenet.yaml",
        "--model", "experiments/model/b32.yaml",
        "MODEL.PRETRAINED_MODEL", str(out_pth),
        "DATASET.ROOT", str(imagefolder.parent),
        "DATASET.TEST_SET", imagefolder.name,
        "OUTPUT_DIR", str(tmp_path / "out2"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RESULT imagenet accuracy=" in r.stdout
