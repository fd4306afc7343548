"""End-to-end CLI tests for the auxiliary tools (feature extraction,
finetune) and the deepspeed config export — the rows PARITY.md previously
covered only by smoke."""

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
    for cls in ("n01440764", "n01443537"):
        (root / cls).mkdir()
        for i in range(4):
            arr = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"{cls}_{i}.JPEG")
    return root


def _run(cmd, cwd=REPO):
    env = dict(os.environ)
    env["MSCLIP_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable] + cmd, cwd=cwd, capture_output=True, text=True,
        env=env, timeout=600,
    )


def test_extract_features_cli(imagefolder, tmp_path):
    out = tmp_path / "feats.npz"
    r = _run([
        "tools/extract_features.py",
        "--ds", "experiments/dataset/imagenet.yaml",
        "--model", "experiments/model/b32.yaml",
        "--out", str(out),
        "DATASET.ROOT", str(imagefolder.parent),
        "DATASET.TEST_SET", imagefolder.name,
        "OUTPUT_DIR", str(tmp_path / "o"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    data = np.load(out)
    feats, labels = data["features"], data["labels"]
    assert feats.shape == (8, 32) and labels.shape == (8,)
    # L2-normalized rows
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3
    )
    assert set(labels.tolist()) == {0, 1}


def test_finetune_cli(imagefolder, tmp_path):
    r = _run([
        "tools/finetune.py",
        "--ds", "experiments/dataset/imagenet.yaml",
        "--model", "experiments/model/b32.yaml",
        "DATASET.ROOT", str(imagefolder.parent),
        "DATASET.TEST_SET", imagefolder.name,
        "OUTPUT_DIR", str(tmp_path / "o"),
        "TRAIN.END_EPOCH", "1",
        "FINETUNE.BATCH_SIZE", "4",
        "DATASET.NUM_CLASSES", "2",
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "finetune" in (r.stdout + r.stderr).lower()


def test_export_deepspeed_config(tmp_path):
    from msclip_tpu.config import get_default_config
    from msclip_tpu.config.io import export_deepspeed_config

    cfg = get_default_config()
    path = tmp_path / "ds.json"
    export_deepspeed_config(cfg, total_batch=512, path=str(path))
    with open(path) as f:
        data = json.load(f)
    assert data["train_batch_size"] == 512


def test_hatefulmemes_roc_auc_cli(tmp_path):
    """hatefulmemes end-to-end through the real CLI (reference
    tools/zero_shot.py:211-213 + roc_auc metric :294-300; our prompt and
    dataset-yaml extension make it actually runnable)."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "hm"
    (root / "img").mkdir(parents=True)
    recs = []
    for i in range(8):
        name = f"img/{i:04d}.png"
        Image.fromarray(
            (rng.random((40, 50, 3)) * 255).astype(np.uint8)
        ).save(root / name)
        recs.append({"img": name, "text": "t", "label": i % 2})
    (root / "dev_seen.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs)
    )

    r = _run([
        "tools/zero_shot.py",
        "--ds", "experiments/dataset/hatefulmemes.yaml",
        "--model", "experiments/model/b32.yaml",
        "DATASET.ROOT", str(root),
        "OUTPUT_DIR", str(tmp_path / "out"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2500:]
    assert "RESULT hatefulmemes roc_auc=" in r.stdout


def test_chestxray8_map_cli(tmp_path):
    """chestxray8 end-to-end: 15-class multilabel 11-point mAP through
    the real CLI (reference loader lib/evaluation/dataset.py; eval
    config + prompts are our extension)."""
    import csv as _csv

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(1)
    root = tmp_path / "cx"
    (root / "images").mkdir(parents=True)
    from msclip_tpu.data.datasets import ChestXRay8

    cats = ChestXRay8.CATEGORIES
    rows = []
    for i in range(6):
        name = f"{i:08d}_000.png"
        Image.fromarray(
            (rng.random((48, 48)) * 255).astype(np.uint8)
        ).save(root / "images" / name)
        labels = "|".join(
            [cats[i % 14]] + (["Effusion"] if i % 3 == 0 else [])
        )
        rows.append([name, labels])
    with open(root / "Data_Entry_2017_v2020.csv", "w",
              newline="") as f:
        w = _csv.writer(f)
        # the real file has 11 columns; the label field is not
        # line-terminal (the loader takes parts[1] of a comma split)
        w.writerow(["Image Index", "Finding Labels", "Follow-up"])
        w.writerows([r + ["0"] for r in rows])
    (root / "test_list.txt").write_text(
        "\n".join(r[0] for r in rows) + "\n"
    )

    r = _run([
        "tools/zero_shot.py",
        "--ds", "experiments/dataset/chestxray8.yaml",
        "--model", "experiments/model/b32.yaml",
        "DATASET.ROOT", str(root),
        "OUTPUT_DIR", str(tmp_path / "out"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2500:]
    assert "RESULT chestxray8 11point_mAP=" in r.stdout


def test_retrieval_cli_karpathy(tmp_path):
    """tools/retrieval.py over a tiny Karpathy-split corpus: loader
    parses the standard annotation shape (flickr flat / coco filepath,
    restval->train) and the CLI reports bidirectional R@K."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    img_root = tmp_path / "images"
    (img_root / "val2014").mkdir(parents=True)
    records = []
    for i in range(6):
        sub = "val2014" if i % 2 else ""
        name = f"im_{i}.jpg"
        os.makedirs(img_root / sub, exist_ok=True)
        Image.fromarray(
            (rng.random((50, 60, 3)) * 255).astype(np.uint8)
        ).save(img_root / sub / name)
        records.append({
            "filename": name, "filepath": sub,
            "split": ["test", "test", "test", "test", "val",
                      "restval"][i],
            "sentences": [{"raw": f"caption {i} a"},
                          {"raw": f"caption {i} b"}],
        })
    ann = tmp_path / "dataset.json"
    ann.write_text(json.dumps({"images": records}))

    # loader semantics checked directly too
    from msclip_tpu.data.retrieval_datasets import load_karpathy_split

    ds, caps, cap2img = load_karpathy_split(str(img_root), str(ann),
                                            split="test")
    assert len(ds) == 4 and len(caps) == 8
    assert list(cap2img) == [0, 0, 1, 1, 2, 2, 3, 3]
    dtr, _, _ = load_karpathy_split(str(img_root), str(ann),
                                    split="train")
    assert len(dtr) == 1  # restval counts as train

    r = _run([
        "tools/retrieval.py",
        "--model", "experiments/model/b32.yaml",
        "--ann", str(ann),
        "--images", str(img_root),
        "--split", "test",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2500:]
    line = [l for l in r.stdout.splitlines()
            if l.startswith("RESULT retrieval")][0]
    # R@k monotone in k, and with 4 images R@10 >= R@4 == 100
    vals = dict(kv.split("=") for kv in line.split()[2:])
    assert float(vals["i2t_r10"]) == 100.0
    assert float(vals["t2i_r10"]) == 100.0
    assert float(vals["i2t_r1"]) <= float(vals["i2t_r5"])


@pytest.mark.slow
def test_train_export_eval_handoff(imagefolder, tmp_path):
    """Full loop across CLIs: train with EMA+SWA -> the driver exports
    checkpoints/{ema,swa} (orbax params dirs) -> the zero-shot eval CLI
    consumes each via MODEL.PRETRAINED_MODEL and produces a finite
    metric. Locks the averaging exports to the eval loader contract."""
    out_dir = tmp_path / "train"
    r = _run([
        "tools/train.py",
        "--cfg", "experiments/model/b32-yfcc-msclips.yaml",
        "OUTPUT_DIR", str(out_dir),
        "DATASET.DATASET", "synthetic", "DATASET.NUM_SAMPLES", "16",
        "TRAIN.END_EPOCH", "2", "TRAIN.BATCH_SIZE_PER_GPU", "2",
        "TRAIN.SAVE_EVERY_STEPS", "0", "PRINT_FREQ", "8",
        "TRAIN.EMA_DECAY", "0.9",
        "SWA.ENABLED", "True", "SWA.BEGIN_EPOCH", "1",
        "SWA.FROZEN_BN", "False",
    ] + TINY_OPTS)
    assert r.returncode == 0, (r.stdout[-1500:] + r.stderr[-2500:])
    ckpt_root = None
    for dirpath, dirnames, _ in os.walk(out_dir):
        if "ema" in dirnames and "swa" in dirnames:
            ckpt_root = dirpath
            break
    assert ckpt_root, f"no ema/swa exports under {out_dir}"

    for shadow in ("ema", "swa"):
        r = _run([
            "tools/zero_shot.py",
            "--ds", "experiments/dataset/imagenet.yaml",
            "--model", "experiments/model/b32-yfcc-msclips.yaml",
            "MODEL.PRETRAINED_MODEL", os.path.join(ckpt_root, shadow),
            "DATASET.ROOT", str(imagefolder.parent),
            "DATASET.TEST_SET", imagefolder.name,
            "OUTPUT_DIR", str(tmp_path / f"eval_{shadow}"),
        ] + TINY_OPTS)
        assert r.returncode == 0, (shadow, r.stderr[-2500:])
        line = [l for l in r.stdout.splitlines()
                if l.startswith("RESULT")][0]
        val = float(dict(kv.split("=") for kv in
                         line.split()[2:])["accuracy"])
        assert np.isfinite(val), (shadow, line)


def test_linear_probe_cli_transfer_suite(tmp_path):
    """tools/linear_probe.py end to end on a transfer-suite loader with a
    hash-split ImageFolder layout (EuroSAT), honoring TEST.IMAGE_SIZE."""
    from PIL import Image

    rng = np.random.default_rng(3)
    for cls in ("Forest", "River", "Highway"):
        d = tmp_path / "2750" / cls
        d.mkdir(parents=True)
        for i in range(12):
            Image.fromarray(
                (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            ).save(d / f"{cls}_{i}.jpg")
    ds_yaml = tmp_path / "eurosat.yaml"
    ds_yaml.write_text(
        "DATASET:\n"
        "  DATASET: 'eurosat'\n"
        f"  ROOT: '{tmp_path}'\n"
        "  NUM_CLASSES: 3\n"
        "TEST:\n"
        "  METRIC: 'accuracy'\n"
    )
    r = _run([
        "tools/linear_probe.py",
        "--ds", str(ds_yaml),
        "--model", "experiments/model/b32.yaml",
        "--probe", "jax",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][0]
    val = float(line.split("linear_probe=")[1])
    assert 0.0 <= val <= 100.0

    # zero-shot on the same dataset: no curated prompt set exists, so the
    # classifier must fall back to dataset classnames + imagenet templates
    r = _run([
        "tools/zero_shot.py",
        "--ds", str(ds_yaml),
        "--model", "experiments/model/b32.yaml",
        "OUTPUT_DIR", str(tmp_path / "out_zs"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "no prompt set for 'eurosat'" in r.stdout + r.stderr
    assert "RESULT eurosat accuracy=" in r.stdout


def test_eval_zeroshot_dispatcher(tmp_path):
    """tools/eval_zeroshot.py (SURVEY #1): registered-name lookup from
    experiments/dataset/, subprocess-per-dataset dispatch, opts
    forwarding — end to end on a eurosat fixture via the auto-registered
    'eurosat' name."""
    from PIL import Image

    rng = np.random.default_rng(9)
    for cls in ("Forest", "River"):
        d = tmp_path / "eurosat" / "2750" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            ).save(d / f"{cls}_{i}.jpg")
    r = _run([
        "tools/eval_zeroshot.py",
        "--ds", "eurosat",
        "--model", "experiments/model/b32.yaml",
        "DATASET.ROOT", str(tmp_path / "eurosat"),
        "DATASET.NUM_CLASSES", "2",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RESULT eurosat accuracy=" in r.stdout

    # unknown names fail loudly with the registry listing
    r = _run(["tools/eval_zeroshot.py", "--ds", "nope",
              "--model", "experiments/model/b32.yaml"])
    assert r.returncode != 0
    assert "unknown dataset" in r.stderr
