"""Layout-parsing tests for the transfer-suite loaders
(``msclip_tpu/data/probe_datasets.py``), each against a synthetic on-disk
fixture in the dataset's real public distribution layout (the reference
README's probe suite, ``/root/reference/README.md:24-30``; the release
ships no loaders for these)."""

import csv
import gzip
import os
import pickle
import struct

import numpy as np
import pytest


def _tf(img):
    # cheap stand-in transform: avoid 224x224 bicubic per sample
    return np.asarray(img.convert("RGB"), np.float32)[:8, :8] / 255.0


def _save_jpg(path, seed=0, size=(20, 24)):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        (rng.random((size[0], size[1], 3)) * 255).astype(np.uint8)
    ).save(path)


def test_cifar10_and_100(tmp_path):
    from msclip_tpu.data.probe_datasets import Cifar10, Cifar100

    rng = np.random.default_rng(0)
    d10 = tmp_path / "cifar-10-batches-py"
    d10.mkdir()
    for name, n in [("data_batch_1", 4), ("data_batch_2", 3),
                    ("data_batch_3", 2), ("data_batch_4", 2),
                    ("data_batch_5", 2), ("test_batch", 5)]:
        data = {b"data": rng.integers(0, 256, (n, 3072), np.uint8),
                b"labels": list(rng.integers(0, 10, n))}
        (d10 / name).write_bytes(pickle.dumps(data))
    tr = Cifar10(str(tmp_path), "train", transform=_tf)
    te = Cifar10(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 13 and len(te) == 5
    img, label = tr[0]
    assert img.shape == (8, 8, 3) and 0 <= label < 10

    d100 = tmp_path / "cifar-100-python"
    d100.mkdir()
    for name, n in [("train", 6), ("test", 4)]:
        data = {b"data": rng.integers(0, 256, (n, 3072), np.uint8),
                b"fine_labels": list(rng.integers(0, 100, n))}
        (d100 / name).write_bytes(pickle.dumps(data))
    assert len(Cifar100(str(tmp_path), "train", transform=_tf)) == 6
    assert len(Cifar100(str(tmp_path), "test", transform=_tf)) == 4


def test_mnist_idx_gz(tmp_path):
    from msclip_tpu.data.probe_datasets import Mnist

    rng = np.random.default_rng(1)

    def write_idx(path, arr, gz=False):
        dims = arr.shape
        # magic: 0x0000 08 <ndim>; value dtype ubyte = 0x08
        header = struct.pack(">HBB", 0, 8, arr.ndim)
        body = header + struct.pack(">" + "I" * arr.ndim, *dims) \
            + arr.tobytes()
        if gz:
            with gzip.open(path, "wb") as f:
                f.write(body)
        else:
            path.write_bytes(body)

    imgs = rng.integers(0, 256, (5, 28, 28), np.uint8)
    labels = rng.integers(0, 10, 5).astype(np.uint8)
    write_idx(tmp_path / "train-images-idx3-ubyte", imgs)
    write_idx(tmp_path / "train-labels-idx1-ubyte", labels)
    # test split as .gz to exercise the gz path
    write_idx(tmp_path / "t10k-images-idx3-ubyte.gz", imgs[:3], gz=True)
    write_idx(tmp_path / "t10k-labels-idx1-ubyte.gz", labels[:3], gz=True)

    tr = Mnist(str(tmp_path), "train", transform=_tf)
    te = Mnist(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 5 and len(te) == 3
    img, label = tr[2]
    assert img.shape == (8, 8, 3)  # grayscale converted to RGB
    assert label == int(labels[2])


def test_fer2013_csv(tmp_path):
    from msclip_tpu.data.probe_datasets import Fer2013

    rng = np.random.default_rng(2)
    rows = []
    for usage, n in [("Training", 4), ("PublicTest", 2),
                     ("PrivateTest", 3)]:
        for _ in range(n):
            px = " ".join(map(str, rng.integers(0, 256, 48 * 48)))
            rows.append({"emotion": int(rng.integers(0, 7)),
                         "pixels": px, "Usage": usage})
    with open(tmp_path / "fer2013.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["emotion", "pixels", "Usage"])
        w.writeheader()
        w.writerows(rows)
    assert len(Fer2013(str(tmp_path), "train", transform=_tf)) == 4
    assert len(Fer2013(str(tmp_path), "val", transform=_tf)) == 2
    ds = Fer2013(str(tmp_path), "test", transform=_tf)
    assert len(ds) == 3
    img, label = ds[0]
    assert img.shape == (8, 8, 3) and 0 <= label < 7


def test_stl10_binary(tmp_path):
    from msclip_tpu.data.probe_datasets import Stl10

    rng = np.random.default_rng(3)
    sub = tmp_path / "stl10_binary"
    sub.mkdir()
    n = 4
    x = rng.integers(0, 256, (n, 3, 96, 96), np.uint8)
    y = rng.integers(1, 11, n).astype(np.uint8)  # 1-based on disk
    (sub / "train_X.bin").write_bytes(x.tobytes())
    (sub / "train_y.bin").write_bytes(y.tobytes())
    ds = Stl10(str(tmp_path), "train", transform=_tf)
    assert len(ds) == n
    img, label = ds[1]
    assert img.shape == (8, 8, 3) and label == int(y[1]) - 1
    # column-major plane order: pixel [0,0] of channel 0 survives the
    # transpose round trip
    raw = ds.images[1]
    assert raw.shape == (96, 96, 3)
    np.testing.assert_array_equal(raw[0, 0, 0], x[1, 0, 0, 0])


def test_food101_layout(tmp_path):
    from msclip_tpu.data.probe_datasets import Food101

    meta = tmp_path / "meta"
    meta.mkdir()
    (meta / "classes.txt").write_text("apple_pie\nbaklava\n")
    (meta / "train.txt").write_text(
        "apple_pie/001\nbaklava/002\napple_pie/003\n")
    (meta / "test.txt").write_text("baklava/004\n")
    for rel in ("apple_pie/001", "baklava/002", "apple_pie/003",
                "baklava/004"):
        _save_jpg(str(tmp_path / "images" / (rel + ".jpg")))
    tr = Food101(str(tmp_path), "train", transform=_tf)
    te = Food101(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 3 and len(te) == 1
    assert tr.classes == ["apple_pie", "baklava"]
    _, label = tr[1]
    assert label == 1


def test_dtd_layout(tmp_path):
    from msclip_tpu.data.probe_datasets import Dtd

    for rel in ("banded/banded_0001.jpg", "dotted/dotted_0001.jpg"):
        _save_jpg(str(tmp_path / "images" / rel))
    labels = tmp_path / "labels"
    labels.mkdir()
    (labels / "train1.txt").write_text("banded/banded_0001.jpg\n")
    (labels / "test1.txt").write_text("dotted/dotted_0001.jpg\n")
    tr = Dtd(str(tmp_path), "train", transform=_tf)
    te = Dtd(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 1 and len(te) == 1
    assert tr.classes == ["banded", "dotted"]
    assert tr[0][1] == 0 and te[0][1] == 1


def test_sun397_layout(tmp_path):
    from msclip_tpu.data.probe_datasets import Sun397

    (tmp_path / "ClassName.txt").write_text("/a/abbey\n/b/bar\n")
    (tmp_path / "Training_01.txt").write_text(
        "/a/abbey/sun_0001.jpg\n/b/bar/sun_0002.jpg\n")
    (tmp_path / "Testing_01.txt").write_text("/a/abbey/sun_0003.jpg\n")
    for rel in ("a/abbey/sun_0001.jpg", "b/bar/sun_0002.jpg",
                "a/abbey/sun_0003.jpg"):
        _save_jpg(str(tmp_path / rel))
    tr = Sun397(str(tmp_path), "train", transform=_tf)
    te = Sun397(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 2 and len(te) == 1
    assert tr[1][1] == 1 and te[0][1] == 0


def test_oxford_pets_layout(tmp_path):
    from msclip_tpu.data.probe_datasets import OxfordPets

    ann = tmp_path / "annotations"
    ann.mkdir()
    ann.joinpath("trainval.txt").write_text(
        "#comment line\nAbyssinian_1 1 1 1\nbeagle_2 5 2 1\n")
    ann.joinpath("test.txt").write_text("Abyssinian_3 1 1 1\n")
    for name in ("Abyssinian_1", "beagle_2", "Abyssinian_3"):
        _save_jpg(str(tmp_path / "images" / (name + ".jpg")))
    tr = OxfordPets(str(tmp_path), "train", transform=_tf)
    te = OxfordPets(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 2 and len(te) == 1
    assert tr[0][1] == 0 and tr[1][1] == 4
    # real breed names from the image stems (zero-shot needs them)
    assert tr.classes[0] == "Abyssinian" and tr.classes[4] == "beagle"


def test_gtsrb_layout(tmp_path):
    from msclip_tpu.data.probe_datasets import Gtsrb

    base = tmp_path / "Final_Training" / "Images" / "00003"
    base.mkdir(parents=True)
    _save_jpg(str(base / "00000_00000.ppm"))
    with open(base / "GT-00003.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["Filename", "ClassId"], delimiter=";")
        w.writeheader()
        w.writerow({"Filename": "00000_00000.ppm", "ClassId": 3})
    tbase = tmp_path / "Final_Test" / "Images"
    tbase.mkdir(parents=True)
    _save_jpg(str(tbase / "00001.ppm"))
    with open(tbase / "GT-final_test.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["Filename", "ClassId"], delimiter=";")
        w.writeheader()
        w.writerow({"Filename": "00001.ppm", "ClassId": 7})
    tr = Gtsrb(str(tmp_path), "train", transform=_tf)
    te = Gtsrb(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 1 and tr[0][1] == 3
    assert len(te) == 1 and te[0][1] == 7


def test_flowers102_mat(tmp_path):
    from scipy.io import savemat

    from msclip_tpu.data.probe_datasets import Flowers102

    labels = np.array([[5, 3, 5, 1]])  # 1-based per image id
    savemat(tmp_path / "imagelabels.mat", {"labels": labels})
    savemat(tmp_path / "setid.mat",
            {"trnid": np.array([[1, 3]]), "valid": np.array([[2]]),
             "tstid": np.array([[4]])})
    for i in range(1, 5):
        _save_jpg(str(tmp_path / "jpg" / f"image_{i:05d}.jpg"))
    tr = Flowers102(str(tmp_path), "train", transform=_tf)
    te = Flowers102(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 2 and len(te) == 1
    assert tr[0][1] == 4 and tr[1][1] == 4 and te[0][1] == 0


def test_fgvc_aircraft_layout(tmp_path):
    from msclip_tpu.data.probe_datasets import FgvcAircraft

    base = tmp_path / "data"
    base.mkdir()
    (base / "variants.txt").write_text("707-320\nA310\n")
    (base / "images_variant_train.txt").write_text(
        "0034309 707-320\n0034958 A310\n")
    (base / "images_variant_test.txt").write_text("1234567 A310\n")
    for img_id in ("0034309", "0034958", "1234567"):
        _save_jpg(str(base / "images" / (img_id + ".jpg")))
    tr = FgvcAircraft(str(tmp_path), "train", transform=_tf)
    te = FgvcAircraft(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 2 and len(te) == 1
    assert tr[0][1] == 0 and tr[1][1] == 1 and te[0][1] == 1


def test_stanford_cars_mat(tmp_path):
    from scipy.io import savemat

    from msclip_tpu.data.probe_datasets import StanfordCars

    annos = np.zeros((1, 2), dtype=[("relative_im_path", "O"),
                                    ("class", "O"), ("test", "O")])
    annos[0, 0] = ("car_ims/000001.jpg", 3, 0)
    annos[0, 1] = ("car_ims/000002.jpg", 7, 1)
    names = np.array([f"Make Model {2000 + i}" for i in range(8)],
                     dtype=object)
    savemat(tmp_path / "cars_annos.mat",
            {"annotations": annos, "class_names": names})
    for name in ("000001.jpg", "000002.jpg"):
        _save_jpg(str(tmp_path / "car_ims" / name))
    tr = StanfordCars(str(tmp_path), "train", transform=_tf)
    te = StanfordCars(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 1 and tr[0][1] == 2
    assert len(te) == 1 and te[0][1] == 6
    # real class names from the mat (zero-shot needs them)
    assert tr.classes[2] == "Make Model 2002"

    # without class_names: numeric placeholders (zero-shot then refuses)
    savemat(tmp_path / "cars_annos.mat", {"annotations": annos})
    tr = StanfordCars(str(tmp_path), "train", transform=_tf)
    assert tr.classes[:2] == ["0", "1"]


def test_registry_and_probe_integration(tmp_path):
    """The registry exposes every loader, and a pickle-layout dataset runs
    through the real BatchLoader (default transform path)."""
    from msclip_tpu.data.loader import BatchLoader
    from msclip_tpu.data.probe_datasets import (
        PROBE_DATASETS,
        build_probe_dataset,
    )

    assert all(v is not None for v in PROBE_DATASETS.values())

    rng = np.random.default_rng(5)
    d10 = tmp_path / "cifar-10-batches-py"
    d10.mkdir()
    for name, n in [(f"data_batch_{i}", 2) for i in range(1, 6)] + [
        ("test_batch", 6)
    ]:
        data = {b"data": rng.integers(0, 256, (n, 3072), np.uint8),
                b"labels": list(rng.integers(0, 10, n))}
        (d10 / name).write_bytes(pickle.dumps(data))
    ds = build_probe_dataset("cifar-10", str(tmp_path), "test")
    batches = list(BatchLoader(ds, 4, workers=2))
    assert sum(int(b["mask"].sum()) for b in batches) == 6
    assert batches[0]["image"].shape == (4, 224, 224, 3)


def test_pcam_h5(tmp_path):
    import h5py

    from msclip_tpu.data.probe_datasets import PatchCamelyon

    rng = np.random.default_rng(7)
    for name, n in (("train", 4), ("test", 2)):
        with h5py.File(
            tmp_path / f"camelyonpatch_level_2_split_{name}_x.h5", "w"
        ) as f:
            f.create_dataset(
                "x", data=rng.integers(0, 256, (n, 96, 96, 3), np.uint8)
            )
        with h5py.File(
            tmp_path / f"camelyonpatch_level_2_split_{name}_y.h5", "w"
        ) as f:
            f.create_dataset(
                "y", data=rng.integers(0, 2, (n, 1, 1, 1), np.uint8)
            )
    tr = PatchCamelyon(str(tmp_path), "train", transform=_tf)
    te = PatchCamelyon(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 4 and len(te) == 2
    img, label = tr[0]
    assert img.shape == (8, 8, 3) and label in (0, 1)


def test_hash_split_folder(tmp_path):
    """EuroSAT layout: deterministic 80/20 split — disjoint, exhaustive,
    and stable when unrelated files are added."""
    from msclip_tpu.data.probe_datasets import EuroSat

    root = tmp_path / "2750"
    for cls in ("Forest", "River"):
        for i in range(20):
            _save_jpg(str(root / cls / f"{cls}_{i}.jpg"), seed=i)
    tr = EuroSat(str(tmp_path), "train", transform=_tf)
    te = EuroSat(str(tmp_path), "test", transform=_tf)
    assert tr.classes == ["Forest", "River"]
    tr_paths = {p for p, _ in tr.samples}
    te_paths = {p for p, _ in te.samples}
    assert not (tr_paths & te_paths)
    assert len(tr_paths) + len(te_paths) == 40
    assert 0 < len(te_paths) < 40  # both splits non-empty
    img, label = tr[0]
    assert img.shape == (8, 8, 3) and label in (0, 1)

    # membership is per-file: adding images never moves existing ones
    _save_jpg(str(root / "Forest" / "zz_new.jpg"))
    tr2 = EuroSat(str(tmp_path), "train", transform=_tf)
    te2 = EuroSat(str(tmp_path), "test", transform=_tf)
    assert tr_paths <= {p for p, _ in tr2.samples}
    assert te_paths <= {p for p, _ in te2.samples}


def test_resisc45_subdir(tmp_path):
    from msclip_tpu.data.probe_datasets import Resisc45

    root = tmp_path / "NWPU-RESISC45"
    for cls in ("airport", "beach"):
        for i in range(10):
            _save_jpg(str(root / cls / f"{cls}_{i:03d}.jpg"), seed=i)
    tr = Resisc45(str(tmp_path), "train", transform=_tf)
    te = Resisc45(str(tmp_path), "test", transform=_tf)
    assert len(tr) + len(te) == 20
    assert tr.classes == ["airport", "beach"]


def test_caltech101_protocol(tmp_path):
    """First 30 sorted images per class are train; BACKGROUND_Google is
    excluded per the standard protocol."""
    from msclip_tpu.data.probe_datasets import Caltech101

    root = tmp_path / "101_ObjectCategories"
    for i in range(33):
        _save_jpg(str(root / "accordion" / f"image_{i:04d}.jpg"), seed=i)
    for i in range(5):
        _save_jpg(str(root / "brain" / f"image_{i:04d}.jpg"), seed=i)
    _save_jpg(str(root / "BACKGROUND_Google" / "image_0001.jpg"))
    tr = Caltech101(str(tmp_path), "train", transform=_tf)
    te = Caltech101(str(tmp_path), "test", transform=_tf)
    assert tr.classes == ["accordion", "brain"]
    assert len(tr) == 30 + 5 and len(te) == 3
    # the 3 test rows are accordion's images 30..32 (sorted order)
    assert all(lbl == 0 for _, lbl in te.samples)
    assert {os.path.basename(p) for p, _ in te.samples} == {
        "image_0030.jpg", "image_0031.jpg", "image_0032.jpg"}


def test_country211_and_sst2_split_dirs(tmp_path):
    from msclip_tpu.data.probe_datasets import Country211, RenderedSst2

    for split, n in (("train", 3), ("valid", 2), ("test", 1)):
        for cls in ("DE", "US"):
            for i in range(n):
                _save_jpg(str(tmp_path / split / cls / f"{i}.jpg"), seed=i)
    tr = Country211(str(tmp_path), "train", transform=_tf)
    va = Country211(str(tmp_path), "val", transform=_tf)
    te = Country211(str(tmp_path), "test", transform=_tf)
    assert (len(tr), len(va), len(te)) == (6, 4, 2)
    assert tr.classes == ["DE", "US"]
    assert tr[3][1] == 1  # sorted scan: DE rows first
    # RenderedSst2 shares the layout family
    assert len(RenderedSst2(str(tmp_path), "test", transform=_tf)) == 2


def test_birdsnap_test_list(tmp_path):
    from msclip_tpu.data.probe_datasets import Birdsnap

    for cls, names in (("Acadian_Flycatcher", ["a.jpg", "b.jpg"]),
                       ("Blue_Jay", ["c.jpg"])):
        for n in names:
            _save_jpg(str(tmp_path / "images" / cls / n))
    (tmp_path / "test_images.txt").write_text(
        "fileName\nAcadian_Flycatcher/b.jpg\n")
    tr = Birdsnap(str(tmp_path), "train", transform=_tf)
    te = Birdsnap(str(tmp_path), "test", transform=_tf)
    assert len(tr) == 2 and len(te) == 1
    assert te.samples[0][0].endswith("b.jpg") and te.samples[0][1] == 0
    assert tr.classes == ["Acadian_Flycatcher", "Blue_Jay"]


def test_kitti_distance_bins(tmp_path):
    """VTAB closest-vehicle-distance binning from KITTI object labels."""
    from msclip_tpu.data.probe_datasets import KittiDistance

    img_dir = tmp_path / "training" / "image_2"
    lbl_dir = tmp_path / "training" / "label_2"
    lbl_dir.mkdir(parents=True)
    # field 13 is camera z; one object line per row
    obj = ("{typ} 0.0 0 0.0 100 100 200 200 "
           "1.5 1.6 3.9 {x} 1.7 {z} 0.0\n")
    cases = {
        "000000": (obj.format(typ="Car", x=1.0, z=5.0)
                   + obj.format(typ="Car", x=2.0, z=30.0), 0),
        "000001": (obj.format(typ="Van", x=1.0, z=12.0), 1),
        "000002": (obj.format(typ="Truck", x=1.0, z=45.0), 2),
        "000003": (obj.format(typ="Pedestrian", x=1.0, z=3.0), 3),
        "000004": ("", 3),
    }
    for stem, (text, _) in cases.items():
        _save_jpg(str(img_dir / f"{stem}.png"))
        (lbl_dir / f"{stem}.txt").write_text(text)
    tr = KittiDistance(str(tmp_path), "train", transform=_tf)
    te = KittiDistance(str(tmp_path), "test", transform=_tf)
    assert len(tr) + len(te) == 5
    got = {os.path.basename(p)[:6]: lbl
           for p, lbl in tr.samples + te.samples}
    assert got == {stem: lbl for stem, (_, lbl) in cases.items()}
    assert len(KittiDistance(str(tmp_path), "train", transform=_tf)
               .classes) == 4
