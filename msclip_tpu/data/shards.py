"""Tar-shard image-text pair input (WebDataset layout).

Production-scale CLIP pretraining data ships as tar shards of paired
members (``<key>.jpg`` + ``<key>.txt``) — the de-facto public format for
YFCC/LAION-scale corpora. The reference trains from TSV lists
(``DATASET.TRAIN_TSV_LIST``; loader not released); this adds the shard
format with the same ``(float32 HWC image, int32 tokens)`` sample
contract, so ``BatchLoader``'s sampler/striping semantics (shuffle,
``chunk`` locality, per-epoch reshuffle, multi-process stripes,
fast-forward) apply unchanged.

TPU-first design points:

* **Random access, not streaming**: a one-pass index per shard records
  each member's byte offset/size (tar is a flat 512-byte-block format),
  so samples are read with ``os.pread`` on a cached fd — thread-safe
  under the loader's thread pool, no per-sample tarfile object, no
  decompression state. Use the ``chunk`` sampler to keep intra-shard
  sequential locality while shuffling shard order.
* **Native decode**: JPEG members go through the C++
  decode/RandomResizedCrop pipeline (with DCT-scaled decode) under
  ``MSCLIP_NATIVE_DECODE=1``; PIL fallback otherwise.
* Index building reads only headers (~512 B per member), so opening a
  22M-sample corpus touches metadata, not image bytes; indices are
  cached next to each shard as ``<shard>.idx.npz`` (rebuilt when the
  shard's mtime/size changes).

Config: ``DATASET.TRAIN_SHARD_LIST`` (list of tar paths or globs) —
checked by ``make_train_dataset`` before ``TRAIN_TSV_LIST``.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import tarfile
import threading
from typing import List

import numpy as np

from .tokenizer import ClipTokenizer

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _index_shard(path: str):
    """One pass over the tar headers -> arrays of (img_off, img_size,
    txt_off, txt_size) per paired sample key."""
    imgs, txts = {}, {}
    with tarfile.open(path, "r:") as tf:  # plain tar: members seekable
        for m in tf:
            if not m.isfile():
                continue
            key, ext = os.path.splitext(m.name)
            ext = ext.lower()
            if ext in _IMG_EXTS:
                imgs[key] = (m.offset_data, m.size, ext)
            elif ext == ".txt":
                txts[key] = (m.offset_data, m.size)
    keys = sorted(k for k in imgs if k in txts)
    rec = np.zeros((len(keys), 4), np.int64)
    for i, k in enumerate(keys):
        io_, is_, _ = imgs[k]
        to_, ts_ = txts[k]
        rec[i] = (io_, is_, to_, ts_)
    return rec


def _cached_index(path: str):
    cache = path + ".idx.npz"
    st = os.stat(path)
    if os.path.exists(cache):
        try:
            z = np.load(cache, allow_pickle=False)
            if (int(z["mtime"]) == int(st.st_mtime)
                    and int(z["size"]) == st.st_size):
                return z["rec"]
        except Exception:
            pass  # corrupt/stale cache: rebuild
    rec = _index_shard(path)
    try:
        np.savez(cache, rec=rec, mtime=int(st.st_mtime), size=st.st_size)
    except OSError:
        pass  # read-only data dir: index stays in memory
    return rec


class TarShardPairDataset:
    """Image-text pairs from WebDataset-style tar shards."""

    def __init__(self, shard_paths: List[str], tokenizer: ClipTokenizer,
                 context_length: int = 77, transform=None):
        paths = []
        for p in shard_paths:
            expanded = sorted(_glob.glob(p)) if any(
                c in p for c in "*?[") else [p]
            paths.extend(expanded)
        if not paths:
            raise FileNotFoundError(f"no shards match {shard_paths}")
        self.paths = paths
        self.tokenizer = tokenizer
        self.context_length = context_length
        if transform is None:
            from .transforms import pil_eval_transform

            transform = pil_eval_transform
        self.transform = transform
        # concatenated per-shard indices + sample -> shard mapping
        recs, shard_ids, starts = [], [], [0]
        for si, p in enumerate(paths):
            rec = _cached_index(p)
            recs.append(rec)
            shard_ids.append(np.full(len(rec), si, np.int32))
            starts.append(starts[-1] + len(rec))
        self.rec = np.concatenate(recs) if recs else np.zeros((0, 4))
        self.shard_of = np.concatenate(shard_ids)
        self.chunk_starts = starts[:-1]  # shard boundaries (chunk sampler)
        self._fds = {}
        self._fd_lock = threading.Lock()

    def __len__(self):
        return len(self.rec)

    def _fd(self, si: int) -> int:
        fd = self._fds.get(si)
        if fd is None:
            with self._fd_lock:
                fd = self._fds.get(si)
                if fd is None:
                    fd = os.open(self.paths[si], os.O_RDONLY)
                    self._fds[si] = fd
        return fd

    def _read(self, si: int, off: int, size: int) -> bytes:
        # pread: positionless, thread-safe across the loader pool
        return os.pread(self._fd(si), size, off)

    def __getitem__(self, i):
        io_, is_, to_, ts_ = (int(v) for v in self.rec[i])
        si = int(self.shard_of[i])
        caption = self._read(si, to_, ts_).decode(
            "utf-8", errors="replace").strip()
        data = self._read(si, io_, is_)
        if getattr(self.transform, "takes_bytes", False):
            image = self.transform(data)
        else:
            from PIL import Image

            img = Image.open(io.BytesIO(data))
            image = self.transform(img)
        tokens = self.tokenizer([caption], self.context_length)[0]
        return image, tokens

    def __del__(self):
        for fd in getattr(self, "_fds", {}).values():
            try:
                os.close(fd)
            except OSError:
                pass


def make_shard_train_transform(config):
    """Bytes-in training transform for shard members: native C++
    decode+RandomResizedCrop for JPEG bytes (MSCLIP_NATIVE_DECODE=1),
    PIL RandomResizedCrop otherwise."""
    import functools

    from .transforms import pil_train_transform

    size = config.TRAIN.IMAGE_SIZE[0]
    mean = tuple(config.INPUT.MEAN)
    std = tuple(config.INPUT.STD)
    scale = tuple(config.AUG.SCALE)
    ratio = tuple(config.AUG.RATIO)
    pil_fn = functools.partial(pil_train_transform, size=size, mean=mean,
                               std=std, scale=scale, ratio=ratio)

    def transform(data: bytes):
        if os.environ.get("MSCLIP_NATIVE_DECODE") == "1":
            from .. import native as N
            from .pairs import _worker_rng

            seed = int(_worker_rng().integers(1, 2 ** 63))
            img = N.decode_train(
                data, size, mean, std, seed=seed, scale=scale,
                ratio=ratio, hflip_p=0.5,
                dct_scale=os.environ.get("MSCLIP_DCT_SCALE") == "1",
            )
            if img is not None:
                return img
        from PIL import Image

        return pil_fn(Image.open(io.BytesIO(data)))

    transform.takes_bytes = True
    return transform
