"""Image-text pair datasets for contrastive pretraining.

The reference trains on YFCC-22M / LAION-20M TSV shards
(``DATASET.TRAIN_TSV_LIST``, ``lib/config/default.py:67``); the loading code
is not part of the release. We provide:

* ``TsvPairDataset``     — tab-separated ``image_path<TAB>caption`` shards
  (paths relative to the TSV's directory or absolute);
* ``FolderPairDataset``  — a directory of images with sidecar ``.txt``
  captions;
* ``SyntheticPairDataset`` — deterministic random pairs for CI/bench.

All yield ``(float32 HWC image, int32 [context_length] tokens)``.
``make_train_dataset`` wires the TRAINING transform — RandomResizedCrop
(``AUG.SCALE``/``AUG.RATIO``, bilinear) + horizontal flip + normalize,
with the native C++ JPEG pipeline under ``MSCLIP_NATIVE_DECODE=1`` —
while a bare dataset defaults to the deterministic eval transform.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional

import numpy as np

from .tokenizer import ClipTokenizer
from .transforms import pil_eval_transform


_RNG_LOCAL = threading.local()


def _worker_rng() -> np.random.Generator:
    """Thread-local Generator for augmentation seed draws: a fresh
    ``default_rng()`` per decoded image pays a PRNG construction + OS
    entropy read on the training hot path (loader worker threads, one
    per sample at corpus scale). Each worker thread spawns one child
    stream from a shared SeedSequence (seeded by ``MSCLIP_SEED`` when
    set, OS entropy otherwise) and reuses it."""
    rng = getattr(_RNG_LOCAL, "rng", None)
    if rng is None:
        with _RNG_SS_LOCK:
            rng = np.random.default_rng(_RNG_SS.spawn(1)[0])
        _RNG_LOCAL.rng = rng
    return rng


_RNG_SS = np.random.SeedSequence(
    int(os.environ["MSCLIP_SEED"]) if os.environ.get("MSCLIP_SEED") else None
)
_RNG_SS_LOCK = threading.Lock()


def _native_train_decode(path: str, size, mean, std, scale, ratio, hflip_p):
    """JPEG fast path for training decode: the C++ RandomResizedCrop +
    flip + normalize pipeline (``native.decode_train``), with DCT-scaled
    decode when ``MSCLIP_DCT_SCALE=1``.

    Returns ``(image or None, bytes or None)``: on native failure the
    already-read bytes come back so the PIL fallback does not re-read
    the file (at corpus scale a silent double-read doubles input IO).
    Checks lib availability and the JPEG magic BEFORE touching the
    file/bytes path decisions."""
    if os.environ.get("MSCLIP_NATIVE_DECODE") != "1":
        return None, None
    from .. import native as N

    if not N.native_available():
        return None, None
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None, None
    with open(path, "rb") as f:
        data = f.read()
    if not N.is_jpeg(data):
        return None, data
    seed = int(_worker_rng().integers(1, 2 ** 63))
    img = N.decode_train(
        data, size, mean, std, seed=seed, scale=scale, ratio=ratio,
        hflip_p=hflip_p,
        dct_scale=os.environ.get("MSCLIP_DCT_SCALE") == "1",
    )
    return img, data


class TsvPairDataset:
    def __init__(self, tsv_paths: List[str], tokenizer: ClipTokenizer,
                 context_length: int = 77, transform=None):
        self.tokenizer = tokenizer
        self.context_length = context_length
        self.transform = transform or pil_eval_transform
        self.entries = []
        for tsv in tsv_paths:
            base = os.path.dirname(os.path.abspath(tsv))
            with open(tsv) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    path, caption = line.split("\t", 1)
                    if not os.path.isabs(path):
                        path = os.path.join(base, path)
                    self.entries.append((path, caption))

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        from .datasets import _load_image

        path, caption = self.entries[i]
        if getattr(self.transform, "takes_path", False):
            image = self.transform(path)
        else:
            image = self.transform(_load_image(path))
        tokens = self.tokenizer([caption], self.context_length)[0]
        return image, tokens


class FolderPairDataset:
    """``<root>/xxx.jpg`` + ``<root>/xxx.txt`` caption sidecars."""

    def __init__(self, root: str, tokenizer: ClipTokenizer,
                 context_length: int = 77, transform=None):
        from .datasets import IMG_EXTENSIONS

        self.root = root
        self.tokenizer = tokenizer
        self.context_length = context_length
        self.transform = transform or pil_eval_transform
        self.items = []
        for fname in sorted(os.listdir(root)):
            if fname.lower().endswith(IMG_EXTENSIONS):
                stem = os.path.splitext(fname)[0]
                txt = os.path.join(root, stem + ".txt")
                if os.path.exists(txt):
                    self.items.append((os.path.join(root, fname), txt))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from .datasets import _load_image

        img_path, txt_path = self.items[i]
        with open(txt_path) as f:
            caption = f.read().strip()
        if getattr(self.transform, "takes_path", False):
            image = self.transform(img_path)
        else:
            image = self.transform(_load_image(img_path))
        tokens = self.tokenizer([caption], self.context_length)[0]
        return image, tokens


class SyntheticPairDataset:
    def __init__(self, n: int = 1024, size: int = 224,
                 context_length: int = 77, vocab_size: int = 49408,
                 seed: int = 0):
        self.n = n
        self.size = size
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(self.seed + i)
        image = rng.standard_normal(
            (self.size, self.size, 3)
        ).astype(np.float32)
        tokens = np.zeros(self.context_length, np.int32)
        n = int(rng.integers(4, min(24, self.context_length - 1)))
        tokens[0] = self.vocab_size - 2
        tokens[1:n] = rng.integers(1, self.vocab_size - 2, n - 1)
        tokens[n] = self.vocab_size - 1
        return image, tokens


def make_train_transform(config):
    """Per-sample training transform from the AUG config surface:
    RandomResizedCrop(AUG.SCALE, AUG.RATIO) + flip + normalize. JPEGs
    route through the native C++ pipeline under MSCLIP_NATIVE_DECODE=1
    (same aug semantics, seeded in-library); everything else uses the
    PIL implementation."""
    import functools

    from .transforms import pil_train_transform

    size = config.TRAIN.IMAGE_SIZE[0]
    mean = tuple(config.INPUT.MEAN)
    std = tuple(config.INPUT.STD)
    scale = tuple(config.AUG.SCALE)
    ratio = tuple(config.AUG.RATIO)
    pil_fn = functools.partial(pil_train_transform, size=size, mean=mean,
                               std=std, scale=scale, ratio=ratio)

    import io

    from PIL import Image, ImageFile

    def transform(path):
        img, data = _native_train_decode(path, size, mean, std, scale,
                                         ratio, 0.5)
        if img is not None:
            return img
        if data is not None:  # bytes already read: decode them directly
            # same tolerance as datasets._load_image — a truncated JPEG
            # (native decode rejects it, hence this fallback) must not
            # kill the run at corpus scale
            ImageFile.LOAD_TRUNCATED_IMAGES = True
            return pil_fn(Image.open(io.BytesIO(data)))
        from .datasets import _load_image

        return pil_fn(_load_image(path))

    # marker: the pair datasets hand this transform the PATH (so the
    # native branch can decode raw bytes without a PIL round trip)
    transform.takes_path = True
    return transform


def make_train_dataset(config, tokenizer: Optional[ClipTokenizer] = None):
    tokenizer = tokenizer or ClipTokenizer()
    ctx = config.MODEL.SPEC.TEXT.get("CONTEXT_LENGTH", 77)
    shards = config.DATASET.get("TRAIN_SHARD_LIST", [])
    if shards:
        from .shards import TarShardPairDataset, make_shard_train_transform

        return TarShardPairDataset(
            shards, tokenizer, ctx,
            transform=make_shard_train_transform(config),
        )
    transform = make_train_transform(config)
    tsvs = config.DATASET.get("TRAIN_TSV_LIST", [])
    if tsvs:
        return TsvPairDataset(tsvs, tokenizer, ctx, transform=transform)
    name = config.DATASET.DATASET
    if name == "synthetic":
        return SyntheticPairDataset(
            n=config.DATASET.get("NUM_SAMPLES", 1024),
            size=config.TRAIN.IMAGE_SIZE[0],
            context_length=ctx,
            vocab_size=config.MODEL.SPEC.TEXT.get("VOCAB_SIZE", 49408),
        )
    root = os.path.join(config.DATASET.ROOT, config.DATASET.TRAIN_SET)
    return FolderPairDataset(root, tokenizer, ctx, transform=transform)
