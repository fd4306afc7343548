"""Data-pipeline tests with real JPEG files: ImageFolder scan, PIL-exact
eval transform, pair datasets, device preprocessing."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    """2-class ImageFolder with real JPEGs of assorted sizes."""
    from PIL import Image

    root = tmp_path_factory.mktemp("imagefolder")
    rng = np.random.default_rng(0)
    sizes = [(320, 240), (200, 260), (640, 480)]
    for ci, cls in enumerate(["class_a", "class_b"]):
        (root / cls).mkdir()
        for i, (w, h) in enumerate(sizes):
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"img{i}.jpg")
    return str(root)


def test_image_folder_scan(image_folder):
    from msclip_tpu.data.datasets import ImageFolderDataset

    ds = ImageFolderDataset(image_folder)
    assert len(ds) == 6
    assert ds.classes == ["class_a", "class_b"]
    img, label = ds[0]
    assert img.shape == (224, 224, 3)
    assert img.dtype == np.float32
    assert label == 0
    assert ds[5][1] == 1


def test_pil_transform_matches_torchvision_semantics(image_folder):
    """Short side -> 224, center crop, ImageNet normalize; statistics in a
    plausible normalized range."""
    from msclip_tpu.data.datasets import ImageFolderDataset

    ds = ImageFolderDataset(image_folder)
    img, _ = ds[2]  # 640x480 -> resize short side
    assert img.shape == (224, 224, 3)
    assert -3.0 < img.min() and img.max() < 3.0


def test_resize_long_side_truncates():
    """torchvision 0.7 Resize computes the long side as
    int(size * long / short) — TRUNCATION. A 200x305 image must resample to
    224x341 (341.6 would round to 342); assert bit-equality with the
    torchvision-formula oracle built from the same PIL ops."""
    from PIL import Image

    from msclip_tpu.data.transforms import pil_eval_transform

    w, h = 200, 305  # 224 * 305 / 200 = 341.6 -> trunc 341
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    arr = (127 + 100 * np.sin(xx / 17) * np.cos(yy / 23)).clip(
        0, 255
    ).astype(np.uint8)
    img = Image.fromarray(np.stack([arr] * 3, -1))

    out = pil_eval_transform(img)

    size = 224
    new_w, new_h = size, int(size * h / w)
    assert new_h == 341
    oracle = img.resize((new_w, new_h), Image.BICUBIC)
    top = int(round((new_h - size) / 2.0))
    left = int(round((new_w - size) / 2.0))
    oracle = oracle.crop((left, top, left + size, top + size))
    o = np.asarray(oracle, np.float32) / 255.0
    o = (o - np.asarray((0.485, 0.456, 0.406), np.float32)) / np.asarray(
        (0.229, 0.224, 0.225), np.float32
    )
    np.testing.assert_array_equal(out, o)


def test_loader_with_real_files(image_folder):
    from msclip_tpu.data.datasets import ImageFolderDataset
    from msclip_tpu.data.loader import BatchLoader

    ds = ImageFolderDataset(image_folder)
    batches = list(BatchLoader(ds, batch_size=4, workers=2))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 224, 224, 3)
    assert batches[1]["mask"].sum() == 2


def test_device_preprocess_close_to_pil(tmp_path):
    """jax.image bicubic vs PIL bicubic on a smooth image: not bit-equal,
    but close (SURVEY hard part #2 — validated at the tolerance level, not
    bitwise; high-frequency noise decorrelates under any resampler
    difference, natural images do not)."""
    from PIL import Image

    from msclip_tpu.data.transforms import device_preprocess, pil_eval_transform

    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    smooth = np.stack(
        [
            127 + 100 * np.sin(xx / 40) * np.cos(yy / 30),
            127 + 100 * np.cos(xx / 25),
            127 + 100 * np.sin(yy / 50),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    img = Image.fromarray(smooth)

    pil_out = pil_eval_transform(img)
    dev_out = np.asarray(
        device_preprocess(jnp.asarray(smooth[None]), size=224)
    )[0]
    assert dev_out.shape == pil_out.shape
    assert np.abs(dev_out - pil_out).mean() < 0.02


def test_folder_pair_dataset(tmp_path):
    from PIL import Image

    from msclip_tpu.data import ClipTokenizer
    from msclip_tpu.data.pairs import FolderPairDataset

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"x{i}.jpg")
        (tmp_path / f"x{i}.txt").write_text(f"a photo number {i}")
    ds = FolderPairDataset(str(tmp_path), ClipTokenizer())
    assert len(ds) == 3
    img, tokens = ds[1]
    assert img.shape == (224, 224, 3)
    assert tokens.shape == (77,)
    assert tokens[0] == 49406


def test_tsv_pair_dataset(tmp_path):
    from PIL import Image

    from msclip_tpu.data import ClipTokenizer
    from msclip_tpu.data.pairs import TsvPairDataset

    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"im{i}.jpg")
        lines.append(f"im{i}.jpg\tcaption number {i}")
    tsv = tmp_path / "data.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    ds = TsvPairDataset([str(tsv)], ClipTokenizer())
    assert len(ds) == 2
    img, tokens = ds[0]
    assert img.shape == (224, 224, 3)
    assert tokens[0] == 49406


def test_sampler_orders():
    """DATASET.SAMPLER options (reference lib/config/default.py:74):
    class_aware rebalances long-tailed labels; chunk preserves intra-chunk
    order while shuffling chunk order."""
    import numpy as np

    from msclip_tpu.data.loader import sampler_order

    # default: permutation
    o = sampler_order(100, "default", shuffle=True, seed=1)
    assert sorted(o) == list(range(100))

    # class_aware: heavily imbalanced labels come out ~uniform per class
    labels = np.array([0] * 90 + [1] * 10)
    o = sampler_order(1000, "class_aware", seed=0, labels=labels)
    frac1 = np.mean(labels[o] == 1)
    assert 0.4 < frac1 < 0.6, frac1
    assert o.min() >= 0 and o.max() < 100

    # chunk: every chunk appears contiguously, in-order
    o = sampler_order(100, "chunk", seed=3, chunk_size=10)
    assert sorted(o) == list(range(100))
    chunks = [o[i * 10:(i + 1) * 10] for i in range(10)]
    for c in chunks:
        assert c[0] % 10 == 0 and list(c) == list(range(c[0], c[0] + 10))
    assert any(o[0] != 0 for o in [o])  # chunk order shuffled (seed 3)

    # unknown sampler raises, class_aware without labels raises
    import pytest

    with pytest.raises(ValueError):
        sampler_order(10, "nope")
    with pytest.raises(ValueError):
        sampler_order(10, "class_aware")


def test_batchloader_reshuffles_per_epoch():
    """Each epoch must see a fresh permutation (reference DataLoader
    shuffle / DistributedSampler.set_epoch semantics); set_epoch pins it
    deterministically for resume."""
    import numpy as np

    from msclip_tpu.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), i

    def epoch_labels(loader):
        return np.concatenate(
            [b["label"] for b in loader]
        ).tolist()

    loader = BatchLoader(DS(), 8, workers=1, shuffle=True, seed=5)
    e0, e1 = epoch_labels(loader), epoch_labels(loader)
    assert sorted(e0) == sorted(e1) == list(range(32))
    assert e0 != e1  # bare re-iteration reshuffles

    # set_epoch pins the order deterministically (resume replays exactly)
    loader.set_epoch(0)
    assert epoch_labels(loader) == e0
    loader.set_epoch(1)
    assert epoch_labels(loader) == e1


def test_batchloader_sampler_integration(tmp_path):
    import numpy as np

    from msclip_tpu.data.loader import BatchLoader

    class DS:
        samples = [(f"p{i}", i % 3) for i in range(30)]

        def __len__(self):
            return 30

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), self.samples[i][1]

    batches = list(BatchLoader(DS(), 10, workers=2, sampler="class_aware",
                               seed=0))
    assert len(batches) == 3
    labels = np.concatenate([b["label"] for b in batches])
    counts = np.bincount(labels, minlength=3)
    assert counts.min() >= 5  # roughly balanced draws


def test_class_aware_even_instance_coverage():
    """The per-class stream must be permutation-chained: within each class
    the draw counts across instances differ by at most 1 (reshuffle on
    exhaustion, never with-replacement sampling)."""
    import numpy as np

    from msclip_tpu.data.loader import sampler_order

    labels = np.array([0] * 90 + [1] * 10)
    o = sampler_order(1000, "class_aware", seed=0, labels=labels)
    for cls, pool in ((0, range(0, 90)), (1, range(90, 100))):
        drawn = o[labels[o] == cls]
        counts = np.bincount(drawn, minlength=100)[list(pool)]
        assert counts.max() - counts.min() <= 1, (cls, counts)


def test_batchloader_bounded_runahead():
    """A fast dataset against a slow consumer must NOT materialize the
    whole epoch: the producer keeps at most prefetch + workers batches
    outstanding (queued results + in-flight futures)."""
    import threading
    import time

    import numpy as np

    from msclip_tpu.data.loader import BatchLoader

    fetched = [0]
    lock = threading.Lock()

    class DS:
        def __len__(self):
            return 400

        def __getitem__(self, i):
            with lock:
                fetched[0] += 1
            return np.zeros((2, 2, 3), np.float32), i

    batch = 4
    loader = BatchLoader(DS(), batch, workers=2, prefetch=2)
    consumed = 0
    peak = 0
    for b in loader:
        consumed += int(b["mask"].sum())
        time.sleep(0.005)  # slow consumer: lets workers run far ahead
        with lock:
            peak = max(peak, fetched[0] - consumed)
    assert consumed == 400
    # bound: prefetch (queue) + prefetch+workers (outstanding) + slop,
    # in samples; the old submit-everything producer would hit ~396 here
    assert peak <= (2 + (2 + 2) + 2) * batch, peak


def test_batchloader_fast_forward():
    """Mid-epoch resume: fast_forward(k) skips the first k batches of the
    next epoch only (resume at step k replays batch k+1, not batch 0)."""
    import numpy as np

    from msclip_tpu.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return np.zeros((2, 2, 3), np.float32), i

    loader = BatchLoader(DS(), 8, workers=1, shuffle=False)
    loader.fast_forward(2)
    labels = np.concatenate([b["label"] for b in loader])
    assert labels.tolist() == list(range(16, 32))  # batches 2..3 only
    # one-shot: the following epoch iterates in full
    labels = np.concatenate([b["label"] for b in loader])
    assert labels.tolist() == list(range(32))


def test_batchloader_equal_shards_rank_agreement():
    """Regression: training loaders must give every rank the SAME batch
    count. With striped shards and len(dataset) % world crossing a batch
    boundary, rank 0 used to get one more drop_last batch than rank 1 —
    the extra train step's mesh collectives then deadlock waiting on the
    rank that already moved to the epoch-end save, and the resume
    modulus (step % num_batches) silently desynchronizes."""
    import numpy as np

    from msclip_tpu.data.loader import BatchLoader

    class DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return np.zeros((2, 2, 3), np.float32), i

    n, world, bs = 127, 2, 32  # stripes 64/63 -> 2 vs 1 drop_last batches

    # the bug, kept as the documented eval behavior (exactly-once):
    plain = [BatchLoader(DS(n), bs, workers=1, drop_last=True,
                         shard=(r, world)) for r in range(world)]
    assert plain[0].num_batches != plain[1].num_batches

    loaders = [BatchLoader(DS(n), bs, workers=1, drop_last=True,
                           shard=(r, world), equal_shards=True)
               for r in range(world)]
    counts, seen = [], []
    for ld in loaders:
        batches = list(ld)
        counts.append(len(batches))
        assert len(batches) == ld.num_batches  # resume modulus agrees
        seen.extend(np.concatenate([b["label"] for b in batches]).tolist())
    assert counts[0] == counts[1] == 2
    # wrap-padding repeats at most world-1 samples, never invents indices
    assert set(seen) <= set(range(n))
    # every index appears at most twice (the single wrapped duplicate)
    assert max(np.bincount(seen, minlength=n)) <= 2


def test_class_aware_draw_count_differs_from_dataset_size():
    """Regression: the vectorized sampler must bound class pools by the
    DATASET size, not the draw count (n < len(labels) crashed with an
    empty tail-class pool; n slightly below len(labels) silently dropped
    the last class's tail instances)."""
    import numpy as np

    from msclip_tpu.data.loader import sampler_order

    labels = np.array([0] * 50 + [1] * 50)
    o = sampler_order(40, "class_aware", seed=0, labels=labels)
    assert len(o) == 40 and o.min() >= 0 and o.max() < 100
    assert (labels[o] == 1).any() and (labels[o] == 0).any()

    # n just below the dataset size: the last class's tail instances
    # (90-99) must still be reachable
    labels = np.array([0] * 90 + [1] * 10)
    o = sampler_order(95, "class_aware", seed=1, labels=labels)
    drawn_tail = set(int(i) for i in o if i >= 90)
    assert len(drawn_tail) > 5, drawn_tail

    # n larger than the dataset still reshuffle-chains evenly
    o = sampler_order(300, "class_aware", seed=2, labels=labels)
    counts = np.bincount(o[labels[o] == 1], minlength=100)[90:]
    assert counts.max() - counts.min() <= 1


def test_pil_train_transform_semantics(tmp_path):
    """RandomResizedCrop + flip training transform: torchvision
    get_params semantics (bounds, scale range, ratio-clamped fallback),
    deterministic under a seeded rng, stochastic without."""
    import numpy as np
    from PIL import Image

    from msclip_tpu.data.transforms import pil_train_transform

    rng_img = np.random.default_rng(0)
    img = Image.fromarray(
        (rng_img.random((180, 240, 3)) * 255).astype(np.uint8)
    )
    a = pil_train_transform(img, size=64, rng=np.random.default_rng(5))
    b = pil_train_transform(img, size=64, rng=np.random.default_rng(5))
    c = pil_train_transform(img, size=64, rng=np.random.default_rng(6))
    assert a.shape == (64, 64, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)  # seeded -> deterministic
    assert np.abs(a - c).max() > 0  # different seed -> different crop
    d = pil_train_transform(img, size=64)  # OS entropy path
    assert d.shape == (64, 64, 3)

    # extreme aspect ratio forces the clamped center-crop fallback with
    # scale pinned near 1 (no valid box in 10 draws)
    wide = Image.fromarray(
        (rng_img.random((10, 400, 3)) * 255).astype(np.uint8)
    )
    e = pil_train_transform(wide, size=32, scale=(0.99, 1.0),
                            rng=np.random.default_rng(1))
    assert e.shape == (32, 32, 3) and np.isfinite(e).all()


def test_train_dataset_uses_random_crop(tmp_path):
    """make_train_dataset must wire the RandomResizedCrop transform (the
    aug primitives existed but the train path silently used the
    deterministic eval transform)."""
    import numpy as np
    from PIL import Image

    from msclip_tpu.config import get_default_config
    from msclip_tpu.data.pairs import make_train_dataset

    rng = np.random.default_rng(1)
    img_path = tmp_path / "a.jpg"
    Image.fromarray(
        (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    ).save(img_path, quality=95)
    (tmp_path / "pairs.tsv").write_text(f"{img_path}\ta photo\n")

    cfg = get_default_config()
    cfg.merge_from_dict({
        "DATASET": {"TRAIN_TSV_LIST": [str(tmp_path / "pairs.tsv")]},
        "TRAIN": {"IMAGE_SIZE": [64, 64]},
        "MODEL": {"SPEC": {"TEXT": {"CONTEXT_LENGTH": 77}}},
    })
    ds = make_train_dataset(cfg)
    assert len(ds) == 1
    im1, tok1 = ds[0]
    im2, _ = ds[0]
    assert im1.shape == (64, 64, 3)
    assert tok1[0] == 49406
    # stochastic aug: two reads of the same sample differ
    assert np.abs(im1 - im2).max() > 0

    # native JPEG branch (when the native lib builds here)
    from msclip_tpu import native as N

    if N.native_available():
        import os as _os

        _os.environ["MSCLIP_NATIVE_DECODE"] = "1"
        try:
            im3, _ = ds[0]
            assert im3.shape == (64, 64, 3) and np.isfinite(im3).all()
        finally:
            _os.environ.pop("MSCLIP_NATIVE_DECODE")
