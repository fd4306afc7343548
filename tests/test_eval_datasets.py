"""Annotation-parsing tests for the custom eval datasets, with synthetic
on-disk fixtures matching each dataset's real layout (reference
lib/evaluation/dataset.py semantics)."""

import json
import os

import numpy as np
import pytest


def _img(path, size=(32, 40)):
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(
        (rng.random((size[0], size[1], 3)) * 255).astype(np.uint8)
    ).save(path)


def test_voc2007_parsing(tmp_path):
    from msclip_tpu.data.datasets import Voc2007Classification

    root = tmp_path / "voc" / "test" / "VOCdevkit 2" / "VOC2007"
    main = root / "ImageSets" / "Main"
    main.mkdir(parents=True)
    jpeg = root / "JPEGImages"
    jpeg.mkdir()
    # image 000001: positive for cat, negative for dog; 000002: dog only
    (main / "cat_test.txt").write_text("000001  1\n000002 -1\n")
    (main / "dog_test.txt").write_text("000001 -1\n000002  1\n")
    _img(jpeg / "000001.jpg")
    _img(jpeg / "000002.jpg")

    ds = Voc2007Classification(str(tmp_path / "voc") + "/",
                               image_set="test")
    assert len(ds) == 2
    img, label = ds[ds.images.index("000001")]
    assert img.shape == (224, 224, 3)
    cat = ds.CATEGORIES.index("cat")
    dog = ds.CATEGORIES.index("dog")
    assert label[cat] == 1 and label[dog] == 0
    _, label2 = ds[ds.images.index("000002")]
    assert label2[dog] == 1 and label2[cat] == 0


def test_hatefulmemes_parsing(tmp_path):
    from msclip_tpu.data.datasets import HatefulMemes

    (tmp_path / "img").mkdir()
    _img(tmp_path / "img" / "1234.png")
    _img(tmp_path / "img" / "5678.png")
    recs = [
        {"img": "img/1234.png", "text": "hello", "label": 0},
        {"img": "img/5678.png", "text": "world", "label": 1},
    ]
    (tmp_path / "dev_seen.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs)
    )
    ds = HatefulMemes(str(tmp_path), image_set="val")
    assert len(ds) == 2
    img, label = ds[1]
    assert img.shape == (224, 224, 3)
    assert label == 1


def test_chestxray8_parsing(tmp_path):
    from msclip_tpu.data.datasets import ChestXRay8

    (tmp_path / "images").mkdir()
    _img(tmp_path / "images" / "a.png")
    _img(tmp_path / "images" / "b.png")
    header = ",".join(["Image Index", "Finding Labels"] + ["c"] * 9)
    rows = [
        "a.png,Cardiomegaly|Edema" + ",x" * 9,
        "b.png,No Finding" + ",x" * 9,
    ]
    (tmp_path / "Data_Entry_2017_v2020.csv").write_text(
        header + "\n" + "\n".join(rows) + "\n"
    )
    (tmp_path / "test_list.txt").write_text("a.png\nb.png\n")

    ds = ChestXRay8(str(tmp_path), image_set="test")
    assert len(ds) == 2
    img, label = ds[0]
    assert img.shape == (224, 224, 3)
    assert label[ds.CATEGORIES.index("Cardiomegaly")] == 1
    assert label[ds.CATEGORIES.index("Edema")] == 1
    assert label.sum() == 2
    _, label2 = ds[1]
    assert label2.sum() == 0  # "No Finding" maps to all-zeros
