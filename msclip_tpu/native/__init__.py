"""Native (C++) host-runtime components.

The reference delegates its host-side image work to torchvision/PIL inside
``torch.utils.data`` worker processes (``tools/zero_shot.py:202-217``,
``lib/evaluation/dataset.py``); this package provides the TPU framework's
native equivalent: a libjpeg + PIL-compatible-bicubic decode/resample/
normalize pipeline compiled from ``image_pipeline.cc`` and driven through
ctypes (the C calls release the GIL, so either the in-library thread pool
or the Python-side loader threads scale across cores).

Build is on demand and cached; every entry point degrades gracefully to
the PIL path when a compiler or libjpeg is unavailable, so the framework
has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "image_pipeline.cc")
_LOCK = threading.Lock()
_LIB = None
_LIB_ERR = None


def _cache_dir() -> str:
    d = os.environ.get("MSCLIP_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "msclip_tpu"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"image_pipeline_{tag}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-pthread",
           _SRC, "-o", tmp, "-ljpeg"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def _load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_ERR is not None:
            return _LIB
        try:
            lib = ctypes.CDLL(_build())
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.ip_decode_eval.argtypes = [
                u8p, ctypes.c_size_t, ctypes.c_int, f32p, f32p, f32p,
                ctypes.c_int,
            ]
            lib.ip_decode_eval.restype = ctypes.c_int
            lib.ip_decode_train.argtypes = [
                u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_uint64, f32p,
                f32p, f32p, ctypes.c_int,
            ]
            lib.ip_decode_train.restype = ctypes.c_int
            lib.ip_decode_eval_batch.argtypes = [
                u8p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
                ctypes.c_int, f32p, f32p, ctypes.c_int, f32p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            lib.ip_decode_eval_batch.restype = ctypes.c_int
            lib.ip_decode_eval_u8.argtypes = [
                u8p, ctypes.c_size_t, ctypes.c_int, u8p, ctypes.c_int,
            ]
            lib.ip_decode_eval_u8.restype = ctypes.c_int
            lib.ip_decode_eval_batch_u8.argtypes = [
                u8p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, u8p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            lib.ip_decode_eval_batch_u8.restype = ctypes.c_int
            _LIB = lib
        except Exception as e:  # no compiler / libjpeg: PIL fallback
            _LIB_ERR = e
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_error():
    _load()
    return _LIB_ERR


def _fvec(v):
    return np.ascontiguousarray(v, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)
    )


_JPEG_MAGIC = b"\xff\xd8"


def is_jpeg(data: bytes) -> bool:
    return data[:2] == _JPEG_MAGIC


def decode_eval(data: bytes, size: int, mean, std, dct_scale: bool = False):
    """JPEG bytes -> float32 [size, size, 3] (resize/center-crop/normalize).
    Returns None when the native path can't handle the input (caller falls
    back to PIL). ``dct_scale``: decode at the smallest IDCT scale >= the
    resize target (3-4x cheaper on large photos; PIL-draft-equivalent
    pixels, not bit-identical with full decode)."""
    lib = _load()
    if lib is None or not is_jpeg(data):
        return None
    out = np.empty((size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.ip_decode_eval(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data), size,
        _fvec(mean), _fvec(std),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(bool(dct_scale)),
    )
    return out if rc == 0 else None


def decode_eval_u8(data: bytes, size: int, dct_scale: bool = False):
    """JPEG bytes -> uint8 [size, size, 3] resize/center-crop (the
    normalize runs in-graph on device — the serving boundary contract,
    ``serve/export.py``: 4x smaller host->device payload, and the
    /255-mean-std math in fp32 on device matches ``pil_eval_transform``'s
    numpy arithmetic exactly). Returns None when the native path can't
    handle the input (caller falls back to PIL)."""
    lib = _load()
    if lib is None or not is_jpeg(data):
        return None
    out = np.empty((size, size, 3), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.ip_decode_eval_u8(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(bool(dct_scale)),
    )
    return out if rc == 0 else None


def decode_train(data: bytes, size: int, mean, std, seed: int,
                 scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 hflip_p: float = 0.5, dct_scale: bool = False):
    """JPEG bytes -> RandomResizedCrop(size) + hflip + normalize.
    ``dct_scale`` decodes at >= 2x the crop target (aug statistics
    preserved, window geometry in scaled coordinates)."""
    lib = _load()
    if lib is None or not is_jpeg(data):
        return None
    out = np.empty((size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.ip_decode_train(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data), size,
        float(scale[0]), float(scale[1]),
        float(ratio[0]), float(ratio[1]), float(hflip_p),
        ctypes.c_uint64(seed & (2 ** 64 - 1)).value or 1,
        _fvec(mean), _fvec(std),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(bool(dct_scale)),
    )
    return out if rc == 0 else None


def _decode_eval_batch_common(datas, size: int, dtype, n_threads: int,
                              invoke):
    """Shared batch-decode plumbing (blob/offset assembly, JPEG filter,
    thread-count heuristic, ok-mask scatter); ``invoke(lib, buf, offsets,
    nimg, n_threads, sub, status)`` calls the dtype-specific C entry."""
    lib = _load()
    n = len(datas)
    out = np.zeros((n, size, size, 3), dtype)
    ok = np.zeros(n, bool)
    if lib is None or n == 0:
        return out, ok
    idx = [i for i, d in enumerate(datas) if is_jpeg(d)]
    if not idx:
        return out, ok
    blob = b"".join(datas[i] for i in idx)
    offsets = np.zeros(len(idx) + 1, np.uint64)
    np.cumsum([len(datas[i]) for i in idx], out=offsets[1:])
    buf = np.frombuffer(blob, np.uint8)
    sub = np.empty((len(idx), size, size, 3), dtype)
    status = np.empty(len(idx), np.int32)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 8, 16)
    invoke(lib, buf, offsets, len(idx), n_threads, sub, status)
    for j, i in enumerate(idx):
        if status[j] == 0:
            out[i] = sub[j]
            ok[i] = True
    return out, ok


def decode_eval_batch(datas, size: int, mean, std, n_threads: int = 0,
                      dct_scale: bool = False):
    """List of JPEG byte strings -> (float32 [N, size, size, 3], ok mask).

    Uses the in-library thread pool (one C call for the whole batch).
    Entries with ok=False (non-JPEG or decode failure) are zero-filled;
    the caller decodes those via PIL.
    """
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)

    def invoke(lib, buf, offsets, nimg, nthr, sub, status):
        lib.ip_decode_eval_batch(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            nimg, size, _fvec(mean), _fvec(std), nthr,
            sub.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(bool(dct_scale)),
        )

    return _decode_eval_batch_common(datas, size, np.float32, n_threads,
                                     invoke)


def decode_eval_batch_u8(datas, size: int, n_threads: int = 0,
                         dct_scale: bool = False):
    """List of JPEG byte strings -> (uint8 [N, size, size, 3], ok mask).

    The uint8-boundary batch decode (see :func:`decode_eval_u8`): one C
    call for the whole batch via the in-library thread pool. Entries with
    ok=False are zero-filled; the caller decodes those via PIL.
    """
    def invoke(lib, buf, offsets, nimg, nthr, sub, status):
        lib.ip_decode_eval_batch_u8(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            nimg, size, nthr,
            sub.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(bool(dct_scale)),
        )

    return _decode_eval_batch_common(datas, size, np.uint8, n_threads,
                                     invoke)
