"""Native C++ image pipeline vs the PIL parity transform.

The native path reimplements PIL's separable bicubic resampling
(coefficients, uint8 two-pass clipping) on top of the system libjpeg;
JPEG IDCT rounding differs slightly between decoders, so comparisons are
tolerance-based on the normalized output.
"""

import io
import os

import numpy as np
import pytest

from msclip_tpu import native as N
from msclip_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    pil_eval_transform,
)

pytestmark = pytest.mark.skipif(
    not N.native_available(),
    reason=f"native pipeline unavailable: {N.build_error()}",
)


def _jpeg_bytes(w, h, seed=0, quality=95):
    from PIL import Image

    rng = np.random.default_rng(seed)
    # smooth low-frequency content so JPEG round-trip noise stays small
    small = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    img = Image.fromarray(small, "RGB").resize((w, h), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


# (200,305)/(305,200): post-resize long side 341 -> odd crop margin 117,
# offset 58.5 — regression for the half-to-even crop rounding (std::lround
# shifted the crop one pixel vs Python round; mean diff was 0.124)
@pytest.mark.parametrize("wh", [(320, 240), (240, 320), (224, 224),
                                (1024, 768), (100, 400), (200, 305),
                                (305, 200)])
def test_eval_matches_pil(wh):
    from PIL import Image

    data = _jpeg_bytes(*wh, seed=sum(wh))
    got = N.decode_eval(data, 224, IMAGENET_MEAN, IMAGENET_STD)
    assert got is not None and got.shape == (224, 224, 3)
    ref = pil_eval_transform(Image.open(io.BytesIO(data)))
    # units: normalized (x/255 - mean)/std; 1/255 quantum is ~0.017-0.02
    diff = np.abs(got - ref)
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.999) < 0.15


def test_grayscale_jpeg():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 80), np.uint8), "L"
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    got = N.decode_eval(buf.getvalue(), 224, IMAGENET_MEAN, IMAGENET_STD)
    assert got is not None
    ref = pil_eval_transform(Image.open(io.BytesIO(buf.getvalue())))
    assert np.abs(got - ref).mean() < 0.03


def test_batch_api_and_fallback():
    datas = [_jpeg_bytes(120, 90, seed=i) for i in range(6)]
    datas[3] = b"\x89PNG not a jpeg"
    datas[5] = b"\xff\xd8corrupted jpeg data"
    out, ok = N.decode_eval_batch(datas, 224, IMAGENET_MEAN, IMAGENET_STD,
                                  n_threads=4)
    assert out.shape == (6, 224, 224, 3)
    assert list(ok) == [True, True, True, False, True, False]
    for i in (0, 1, 2, 4):
        single = N.decode_eval(datas[i], 224, IMAGENET_MEAN, IMAGENET_STD)
        np.testing.assert_array_equal(out[i], single)
    assert not out[3].any() and not out[5].any()


def test_decode_train_deterministic_and_valid():
    data = _jpeg_bytes(300, 200, seed=7)
    a = N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD, seed=42)
    b = N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD, seed=42)
    c = N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD, seed=43)
    assert a is not None, (
        f"native decode_train returned None (decode failure); "
        f"native_available={N.native_available()} build_error="
        f"{N.build_error()} is_jpeg={N.is_jpeg(data)} len={len(data)}"
    )
    assert a.shape == (224, 224, 3)
    assert b is not None and c is not None
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different seed, different crop
    # values stay in the normalized range of uint8 inputs
    lo = (0.0 - max(IMAGENET_MEAN)) / min(IMAGENET_STD)
    hi = (1.0 - min(IMAGENET_MEAN)) / min(IMAGENET_STD)
    assert a.min() >= lo - 1e-5 and a.max() <= hi + 1e-5


def _splitmix64_py(state):
    """Python replica of the C splitmix64 (image_pipeline.cc) so tests can
    derive the exact crop box a seed produces."""
    M = (1 << 64) - 1
    state = (state + 0x9E3779B97F4A7C15) & M
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return state, (z ^ (z >> 31))


def _uniform01_py(state):
    state, z = _splitmix64_py(state)
    return state, (z >> 11) * (1.0 / 9007199254740992.0)


def _train_params_py(seed, w, h, smin=0.08, smax=1.0, rmin=3 / 4,
                     rmax=4 / 3, hflip_p=0.5):
    """Replicates ip_decode_train's crop/flip draws."""
    import math

    rs = seed if seed else 0x2545F4914F6CDD1D
    area = float(w * h)
    log_rmin, log_rmax = math.log(rmin), math.log(rmax)
    found = False
    for _ in range(10):
        rs, u1 = _uniform01_py(rs)
        rs, u2 = _uniform01_py(rs)
        target = area * (smin + (smax - smin) * u1)
        ratio = math.exp(log_rmin + (log_rmax - log_rmin) * u2)
        tw = round(math.sqrt(target * ratio))
        th = round(math.sqrt(target / ratio))
        if 0 < tw <= w and 0 < th <= h:
            rs, u3 = _uniform01_py(rs)
            rs, u4 = _uniform01_py(rs)
            cx, cy, cw, ch = int(u3 * (w - tw + 1)), int(u4 * (h - th + 1)), tw, th
            found = True
            break
    if not found:
        in_ratio = w / h
        if in_ratio < rmin:
            cw, ch = w, round(w / rmin)
        elif in_ratio > rmax:
            ch, cw = h, round(h * rmax)
        else:
            cw, ch = w, h
        cx, cy = (w - cw) // 2, (h - ch) // 2
    rs, uf = _uniform01_py(rs)
    return cx, cy, cw, ch, uf < hflip_p


def test_decode_train_matches_pil_box_resize():
    """ip_decode_train must equal PIL's resize(box=crop) + flip within
    JPEG-decoder tolerance — in particular near crop edges, where PIL's
    filter support samples OUTSIDE the box (the round-1 OOB-read bug
    clamped to the box instead, corrupting the top rows)."""
    from PIL import Image

    data = _jpeg_bytes(300, 200, seed=7)
    img = Image.open(io.BytesIO(data)).convert("RGB")
    for seed in range(1, 6):
        got = N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD,
                             seed=seed)
        assert got is not None
        cx, cy, cw, ch, flip = _train_params_py(seed, *img.size)
        ref = img.resize((224, 224), Image.BICUBIC,
                         box=(cx, cy, cx + cw, cy + ch))
        arr = np.asarray(ref, np.float32) / 255.0
        if flip:
            arr = arr[:, ::-1]
        arr = (arr - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
            IMAGENET_STD, np.float32
        )
        diff = np.abs(got - arr)
        assert diff.mean() < 0.02, (seed, diff.mean())
        # the top/bottom rows specifically (where the OOB bug lived)
        assert diff[:2].mean() < 0.04 and diff[-2:].mean() < 0.04, seed


def test_decode_train_honors_ratio_range():
    """Regression: AUG.RATIO must reach the native RandomResizedCrop —
    it used to hardcode 3/4..4/3, silently training with different crop
    statistics on the native vs PIL path for non-default configs."""
    from PIL import Image

    data = _jpeg_bytes(300, 200, seed=7)
    img = Image.open(io.BytesIO(data)).convert("RGB")
    ratio = (0.95, 1.05)  # narrow, far from the 3/4..4/3 default
    for seed in range(1, 6):
        got = N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD,
                             seed=seed, ratio=ratio)
        assert got is not None
        cx, cy, cw, ch, flip = _train_params_py(
            seed, *img.size, rmin=ratio[0], rmax=ratio[1]
        )
        # the drawn window itself must respect the narrow range
        assert ratio[0] * 0.9 <= cw / ch <= ratio[1] * 1.1, (seed, cw, ch)
        ref = img.resize((224, 224), Image.BICUBIC,
                         box=(cx, cy, cx + cw, cy + ch))
        arr = np.asarray(ref, np.float32) / 255.0
        if flip:
            arr = arr[:, ::-1]
        arr = (arr - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
            IMAGENET_STD, np.float32
        )
        assert np.abs(got - arr).mean() < 0.02, seed


def test_decode_train_thread_deterministic():
    """Same (data, seed) must give bit-identical output from any calling
    thread (round-1 flake root cause: UB heap read made the result depend
    on the calling thread's allocator state)."""
    import concurrent.futures as cf

    data = _jpeg_bytes(300, 200, seed=7)
    golden = {s: N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD,
                                seed=s) for s in range(8)}
    assert all(v is not None for v in golden.values())

    def check(i):
        s = i % 8
        r = N.decode_train(data, 224, IMAGENET_MEAN, IMAGENET_STD, seed=s)
        return r is not None and np.array_equal(r, golden[s])

    with cf.ThreadPoolExecutor(8) as pool:
        results = list(pool.map(check, range(64)))
    assert all(results), f"{results.count(False)} thread mismatches"


def test_image_folder_native_path(tmp_path, monkeypatch):
    from PIL import Image

    from msclip_tpu.data.datasets import ImageFolderDataset

    # legacy host-side fp32 normalize mode (the uint8-boundary default is
    # covered by test_image_folder_native_u8)
    monkeypatch.setenv("MSCLIP_NATIVE_U8", "0")

    for cls in ("a", "b"):
        os.makedirs(tmp_path / cls)
    for i in range(2):
        with open(tmp_path / "a" / f"x{i}.jpg", "wb") as f:
            f.write(_jpeg_bytes(100, 80, seed=i))
    # one non-JPEG to exercise the PIL fallback inside the native dataset
    Image.fromarray(
        np.zeros((50, 60, 3), np.uint8), "RGB"
    ).save(tmp_path / "b" / "y.png")

    ds_native = ImageFolderDataset(str(tmp_path), native=True)
    ds_pil = ImageFolderDataset(str(tmp_path))
    assert len(ds_native) == 3
    for i in range(3):
        img_n, lbl_n = ds_native[i]
        img_p, lbl_p = ds_pil[i]
        assert lbl_n == lbl_p
        assert img_n.shape == img_p.shape == (224, 224, 3)
        assert np.abs(img_n - img_p).mean() < 0.03


def test_dct_scaled_decode_matches_pil_draft():
    """dct_scale decode must equal the PIL Image.draft pipeline when the
    chosen IDCT scale is a power of two (1600x1200 -> 1/4), and stay close
    to the full-decode output on smooth content."""
    from PIL import Image

    data = _jpeg_bytes(1600, 1200, seed=11)
    got = N.decode_eval(data, 224, IMAGENET_MEAN, IMAGENET_STD,
                        dct_scale=True)
    assert got is not None and got.shape == (224, 224, 3)

    # PIL draft oracle: short side 1200 needs scale 2/8 = 1/4 (300 >= 224)
    img = Image.open(io.BytesIO(data))
    img.draft("RGB", (1600 // 4, 1200 // 4))
    assert img.size == (400, 300)
    ref = pil_eval_transform(img)
    diff = np.abs(got - ref)
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.999) < 0.15

    # and close to (not bit-equal with) the full-decode output
    full = N.decode_eval(data, 224, IMAGENET_MEAN, IMAGENET_STD)
    d2 = np.abs(got - full)
    assert d2.mean() < 0.03, d2.mean()

    # small images never upscale through the IDCT (scale stays 8/8):
    # bit-identical with the full decode
    small = _jpeg_bytes(200, 160, seed=12)
    a = N.decode_eval(small, 224, IMAGENET_MEAN, IMAGENET_STD,
                      dct_scale=True)
    b = N.decode_eval(small, 224, IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_array_equal(a, b)


def test_decode_eval_u8_crop_matches_pil_uint8():
    """The uint8-boundary decode must produce the same center crop as
    PIL's (pil_eval_uint8 / serve.pil_to_uint8) within JPEG-decoder
    rounding — this is the pixel-equality contract of VERDICT r3 #2."""
    from PIL import Image

    from msclip_tpu.data.transforms import pil_eval_uint8

    for wh in [(320, 240), (200, 305), (1024, 768)]:
        data = _jpeg_bytes(*wh, seed=sum(wh))
        got = N.decode_eval_u8(data, 224)
        assert got is not None and got.dtype == np.uint8
        ref = pil_eval_uint8(Image.open(io.BytesIO(data)))
        diff = np.abs(got.astype(np.int16) - ref.astype(np.int16))
        # 1 uint8 step ~ the 0.02 normalized-unit budget of
        # test_eval_matches_pil; same decoder-rounding envelope
        assert diff.mean() < 1.2, (wh, diff.mean())
        assert np.quantile(diff, 0.999) < 9, (wh, np.quantile(diff, 0.999))


def test_normalize_uint8_bit_identical_to_fp32_path():
    """uint8 crop + in-graph normalize must equal the host-side fp32
    transform BIT-FOR-BIT (same fp32 ops in the same order) — the uint8
    boundary loses nothing; and the native fp32 decode (which multiplies
    by 1/std instead of dividing) stays within 1 ulp of it."""
    from PIL import Image

    from msclip_tpu.data.transforms import (normalize_uint8,
                                            pil_eval_transform,
                                            pil_eval_uint8)

    data = _jpeg_bytes(320, 240, seed=3)
    img = Image.open(io.BytesIO(data))
    fp32 = pil_eval_transform(img)
    u8 = pil_eval_uint8(img)
    via_u8 = np.asarray(normalize_uint8(u8, IMAGENET_MEAN, IMAGENET_STD))
    np.testing.assert_array_equal(via_u8, fp32)

    # native u8 -> in-graph normalize vs native fp32 decode: same pixels,
    # multiply-by-inverse vs divide -> <= 1 ulp
    nat_u8 = N.decode_eval_u8(data, 224)
    nat_fp32 = N.decode_eval(data, 224, IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_array_equal(nat_u8, pil_u8_of_native(nat_fp32))
    via_nat = np.asarray(
        normalize_uint8(nat_u8, IMAGENET_MEAN, IMAGENET_STD)
    )
    np.testing.assert_allclose(via_nat, nat_fp32, rtol=1e-6, atol=1e-6)


def pil_u8_of_native(nat_fp32):
    """Invert the native fp32 normalize to recover its uint8 pixels
    (exact: the normalize is affine per channel and the inputs are
    integers/255)."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return np.rint((nat_fp32 * std + mean) * 255.0).astype(np.uint8)


def test_decode_eval_batch_u8_and_fallback():
    datas = [_jpeg_bytes(120, 90, seed=i) for i in range(5)]
    datas[2] = b"\x89PNG not a jpeg"
    out, ok = N.decode_eval_batch_u8(datas, 224, n_threads=4)
    assert out.shape == (5, 224, 224, 3) and out.dtype == np.uint8
    assert list(ok) == [True, True, False, True, True]
    for i in (0, 1, 3, 4):
        np.testing.assert_array_equal(out[i], N.decode_eval_u8(datas[i],
                                                               224))
    assert not out[2].any()


def test_image_folder_native_u8(tmp_path, monkeypatch):
    """Native ImageFolder emits uint8 crops by default (emits_uint8=True,
    PIL fallback included so batches stay one dtype); MSCLIP_NATIVE_U8=0
    restores the legacy fp32 behavior."""
    from PIL import Image

    from msclip_tpu.data.datasets import ImageFolderDataset
    from msclip_tpu.data.transforms import normalize_uint8

    os.makedirs(tmp_path / "a")
    with open(tmp_path / "a" / "x.jpg", "wb") as f:
        f.write(_jpeg_bytes(100, 80, seed=0))
    Image.fromarray(np.full((50, 60, 3), 7, np.uint8), "RGB").save(
        tmp_path / "a" / "y.png"
    )

    ds = ImageFolderDataset(str(tmp_path), native=True)
    assert ds.emits_uint8
    ds_pil = ImageFolderDataset(str(tmp_path))
    for i in range(2):
        img_u8, _ = ds[i]
        assert img_u8.dtype == np.uint8 and img_u8.shape == (224, 224, 3)
        normed = np.asarray(
            normalize_uint8(img_u8, IMAGENET_MEAN, IMAGENET_STD)
        )
        assert np.abs(normed - ds_pil[i][0]).mean() < 0.03

    monkeypatch.setenv("MSCLIP_NATIVE_U8", "0")
    ds_fp32 = ImageFolderDataset(str(tmp_path), native=True)
    assert not ds_fp32.emits_uint8
    assert ds_fp32[0][0].dtype == np.float32

    # fp32-native fallback must honor ctor geometry + stats: the PNG
    # sample (native decode returns None) previously fell back to the
    # bare 224/ImageNet default, yielding a shape mismatch vs the JPEG
    # samples whenever image_size != 224 and silently different stats.
    ds_192 = ImageFolderDataset(str(tmp_path), native=True,
                                image_size=192,
                                mean=(0.5, 0.5, 0.5), std=(0.25, 0.3, 0.2))
    for i in range(2):  # i=0: x.jpg (native); i=1: y.png (PIL fallback)
        img, _ = ds_192[i]
        assert img.shape == (192, 192, 3), (i, img.shape)
    # stats applied on the fallback sample too: solid gray-7 PNG
    want = ((np.float32(7) / 255 - 0.5) / np.asarray(
        (0.25, 0.3, 0.2), np.float32))
    np.testing.assert_allclose(ds_192[1][0][0, 0], want, atol=1e-6)


def test_dct_scaled_batch_and_train():
    datas = [_jpeg_bytes(900, 700, seed=i) for i in range(4)]
    out, ok = N.decode_eval_batch(datas, 224, IMAGENET_MEAN, IMAGENET_STD,
                                  n_threads=2, dct_scale=True)
    assert ok.all()
    for i in range(4):
        single = N.decode_eval(datas[i], 224, IMAGENET_MEAN, IMAGENET_STD,
                               dct_scale=True)
        np.testing.assert_array_equal(out[i], single)

    # train: deterministic per seed, valid range, actually scaled path
    a = N.decode_train(datas[0], 224, IMAGENET_MEAN, IMAGENET_STD, seed=5,
                       dct_scale=True)
    b = N.decode_train(datas[0], 224, IMAGENET_MEAN, IMAGENET_STD, seed=5,
                       dct_scale=True)
    assert a is not None and a.shape == (224, 224, 3)
    np.testing.assert_array_equal(a, b)
