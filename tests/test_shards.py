"""Tar-shard pair-data tests (``msclip_tpu/data/shards.py``): WebDataset
layout parsing, pread random access, index caching, loader integration,
and the bytes-in training transform."""

import io
import os
import tarfile

import numpy as np
import pytest


def _make_shard(path, keys, seed=0, size=(60, 80)):
    from PIL import Image

    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for k in keys:
            buf = io.BytesIO()
            Image.fromarray(
                (rng.random((size[0], size[1], 3)) * 255).astype(np.uint8)
            ).save(buf, "JPEG", quality=95)
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{k}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            cap = f"caption for {k}".encode()
            ti = tarfile.TarInfo(f"{k}.txt")
            ti.size = len(cap)
            tf.addfile(ti, io.BytesIO(cap))
        # an unpaired member must be ignored
        ti = tarfile.TarInfo("orphan.jpg")
        ti.size = 4
        tf.addfile(ti, io.BytesIO(b"xxxx"))


def _tf(img):
    return np.asarray(img.convert("RGB"), np.float32)[:8, :8] / 255.0


def test_tar_shard_dataset(tmp_path):
    from msclip_tpu.data.shards import TarShardPairDataset
    from msclip_tpu.data.tokenizer import ClipTokenizer

    _make_shard(tmp_path / "shard-000.tar", [f"a{i:03d}" for i in range(5)],
                seed=0)
    _make_shard(tmp_path / "shard-001.tar", [f"b{i:03d}" for i in range(3)],
                seed=1)

    ds = TarShardPairDataset(
        [str(tmp_path / "shard-*.tar")], ClipTokenizer(), transform=_tf
    )
    assert len(ds) == 8
    assert ds.chunk_starts == [0, 5]
    img, tokens = ds[0]
    assert img.shape == (8, 8, 3)
    assert tokens[0] == 49406 and tokens.shape == (77,)
    img2, tokens2 = ds[6]  # second shard
    assert img2.shape == (8, 8, 3)
    assert not np.array_equal(tokens, tokens2)  # different captions

    # index caches were written and are reused (delete a shard's bytes:
    # a cached index alone must not satisfy a CHANGED shard)
    assert os.path.exists(tmp_path / "shard-000.tar.idx.npz")
    ds2 = TarShardPairDataset(
        [str(tmp_path / "shard-000.tar")], ClipTokenizer(), transform=_tf
    )
    assert len(ds2) == 5

    # rewriting the shard invalidates the stale cache
    _make_shard(tmp_path / "shard-001.tar",
                [f"c{i:03d}" for i in range(2)], seed=2)
    os.utime(tmp_path / "shard-001.tar", (1, 1))  # force mtime change
    ds3 = TarShardPairDataset(
        [str(tmp_path / "shard-001.tar")], ClipTokenizer(), transform=_tf
    )
    assert len(ds3) == 2


def test_tar_shard_through_loader_and_sampler(tmp_path):
    """BatchLoader + the chunk sampler over shards: every sample arrives
    exactly once, intra-shard order preserved within chunks."""
    from msclip_tpu.data.loader import BatchLoader
    from msclip_tpu.data.shards import TarShardPairDataset
    from msclip_tpu.data.tokenizer import ClipTokenizer

    _make_shard(tmp_path / "s0.tar", [f"k{i:02d}" for i in range(6)])

    ds = TarShardPairDataset([str(tmp_path / "s0.tar")], ClipTokenizer(),
                             transform=_tf)
    batches = list(BatchLoader(ds, 4, workers=2, sampler="chunk",
                               chunk_size=3))
    n = sum(int(b["mask"].sum()) for b in batches)
    assert n == 6
    assert batches[0]["image"].shape == (4, 8, 8, 3)


def test_make_train_dataset_shards(tmp_path):
    """Config wiring: DATASET.TRAIN_SHARD_LIST routes to the shard
    dataset with the bytes-in RandomResizedCrop transform (stochastic)."""
    from msclip_tpu.config import get_default_config
    from msclip_tpu.data.pairs import make_train_dataset

    _make_shard(tmp_path / "train-000.tar", ["x1", "x2"], size=(100, 130))
    cfg = get_default_config()
    cfg.merge_from_dict({
        "DATASET": {"TRAIN_SHARD_LIST": [str(tmp_path / "train-*.tar")]},
        "TRAIN": {"IMAGE_SIZE": [64, 64]},
        "MODEL": {"SPEC": {"TEXT": {"CONTEXT_LENGTH": 77}}},
    })
    ds = make_train_dataset(cfg)
    assert len(ds) == 2
    im1, tok = ds[0]
    im2, _ = ds[0]
    assert im1.shape == (64, 64, 3) and tok.shape == (77,)
    assert np.abs(im1 - im2).max() > 0  # stochastic crop

    # native bytes branch (when the native lib builds here)
    from msclip_tpu import native as N

    if N.native_available():
        os.environ["MSCLIP_NATIVE_DECODE"] = "1"
        try:
            im3, _ = ds[0]
            assert im3.shape == (64, 64, 3) and np.isfinite(im3).all()
        finally:
            os.environ.pop("MSCLIP_NATIVE_DECODE")
