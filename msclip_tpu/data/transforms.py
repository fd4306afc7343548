"""Image preprocessing.

Two paths:

* ``pil_eval_transform`` — host-side, bit-compatible with the reference eval
  transform (``tools/zero_shot.py:202-207``): PIL bicubic resize of the
  short side to 224, center crop, /255, ImageNet-stats normalize. PIL
  bicubic differs from ``jax.image`` bicubic at the bit level (SURVEY.md
  hard part #2), so eval parity uses this path.
* ``device_preprocess`` — jit-compiled device-resident resize / crop /
  normalize over uint8 batches for the high-throughput pipeline; XLA fuses
  the normalize into the first conv's input.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def pil_eval_uint8(image, size: int = 224) -> np.ndarray:
    """PIL image -> uint8 ``[size, size, 3]`` center crop: exactly the
    resize/crop stages of :func:`pil_eval_transform` with the /255 +
    normalize left to run in-graph on device (:func:`normalize_uint8`).
    ``normalize_uint8(pil_eval_uint8(img))`` equals
    ``pil_eval_transform(img)`` bit-for-bit (same fp32 ops in the same
    order), while the host->device payload is 4x smaller — the production
    input boundary (serve/export.py and the native eval path share it)."""
    from PIL import Image

    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    # torchvision Resize(size): scale the SHORT side to `size`; the long
    # side TRUNCATES (int(size * long / short)), it does not round —
    # torchvision 0.7 functional.resize semantics, parity-critical.
    if w <= h:
        new_w, new_h = size, int(size * h / w)
    else:
        new_w, new_h = int(size * w / h), size
    image = image.resize((new_w, new_h), Image.BICUBIC)
    # torchvision CenterCrop
    left = int(round((new_w - size) / 2.0))
    top = int(round((new_h - size) / 2.0))
    image = image.crop((left, top, left + size, top + size))
    return np.asarray(image, dtype=np.uint8)


def pil_eval_transform(image, size: int = 224,
                       mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """PIL image -> float32 HWC array, reference-eval-compatible."""
    arr = pil_eval_uint8(image, size).astype(np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr


def normalize_uint8(images_u8, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """In-graph /255 + mean/std normalize of uint8 pixels (traceable; XLA
    fuses it into the first conv). The fp32 op order matches
    :func:`pil_eval_transform`'s numpy arithmetic exactly, so a uint8
    boundary + this function is bit-identical to shipping fp32 pixels."""
    import jax.numpy as jnp

    x = images_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
        std, jnp.float32
    )


def dataset_normalizer(dataset):
    """In-graph input stage matching what ``dataset`` emits.

    uint8-boundary datasets (``emits_uint8`` — the native-decode eval
    path) ship raw center crops across the host->device link and rely on
    the consumer to run :func:`normalize_uint8` inside its jitted
    program, with the STATS THE DATASET WAS BUILT WITH (``dataset.mean``
    / ``dataset.std``). fp32 datasets already normalized on host ->
    identity. Every tool that jits ``encode_image`` over loader batches
    must route inputs through this (zero-shot, feature extraction,
    retrieval, finetune) or raw 0-255 pixels reach the tower silently."""
    if getattr(dataset, "emits_uint8", False):
        mean = tuple(getattr(dataset, "mean", IMAGENET_MEAN))
        std = tuple(getattr(dataset, "std", IMAGENET_STD))
        return functools.partial(normalize_uint8, mean=mean, std=std)
    return lambda x: x


def pil_train_transform(image, size: int = 224,
                        mean=IMAGENET_MEAN, std=IMAGENET_STD,
                        scale=(0.08, 1.0),
                        ratio=(3.0 / 4.0, 4.0 / 3.0),
                        hflip_p: float = 0.5, rng=None) -> np.ndarray:
    """Training transform: torchvision ``RandomResizedCrop(size,
    scale, ratio)`` semantics (10 box attempts, then the clamped-ratio
    center-crop fallback; BILINEAR resample — torchvision's default for
    RandomResizedCrop, unlike the eval path's bicubic) + horizontal flip
    + normalize. ``rng``: np.random.Generator; omitted -> OS-entropy
    (the DataLoader-worker default); pass one for determinism.
    Reference counterpart: the unreleased training transform implied by
    ``AUG.SCALE``/``AUG.RATIO`` (lib/config/default.py:83-84)."""
    from PIL import Image

    rng = rng if rng is not None else np.random.default_rng()
    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    area = float(w * h)
    for _ in range(10):
        target = area * rng.uniform(scale[0], scale[1])
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            break
    else:  # torchvision fallback: center crop at the clamped ratio
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw, ch = w, int(round(w / ratio[0]))
        elif in_ratio > ratio[1]:
            ch, cw = h, int(round(h * ratio[1]))
        else:
            cw, ch = w, h
        x0, y0 = (w - cw) // 2, (h - ch) // 2
    image = image.resize((size, size), Image.BILINEAR,
                         box=(x0, y0, x0 + cw, y0 + ch))
    if rng.random() < hflip_p:
        image = image.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(image, dtype=np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr


@functools.partial(
    __import__("jax").jit, static_argnames=("size", "antialias")
)
def device_preprocess(images_u8, size: int = 224,
                      mean: Tuple[float, ...] = IMAGENET_MEAN,
                      std: Tuple[float, ...] = IMAGENET_STD,
                      antialias: bool = True):
    """uint8 ``[B, H, W, 3]`` (already short-side-resized or raw square) ->
    normalized float ``[B, size, size, 3]`` on device.

    Uses ``jax.image.resize`` tricubic; close to (not bit-equal with) PIL.
    """
    import jax
    import jax.numpy as jnp

    x = images_u8.astype(jnp.float32) / 255.0
    B, H, W, C = x.shape
    # same long-side truncation as pil_eval_transform / torchvision
    new_h = size if H <= W else int(size * H / W)
    new_w = size if W <= H else int(size * W / H)
    x = jax.image.resize(x, (B, new_h, new_w, C), "bicubic",
                         antialias=antialias)
    # torchvision CenterCrop: int(round(margin/2)) — Python round() is
    # half-to-EVEN (58.5 -> 58), not half-up
    top = int(round((new_h - size) / 2.0))
    left = int(round((new_w - size) / 2.0))
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (B, size, size, C)
    )
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (x - mean_a) / std_a


def mixup_cutmix(key, images, labels, n_classes, mixup_alpha=0.0,
                 cutmix_alpha=0.0, switch_prob=0.5,
                 label_smoothing=0.0):
    """Batch-mode mixup / cutmix with soft labels (``AUG.MIXUP`` /
    ``AUG.MIXCUT`` / ``AUG.MIXUP_SWITCH_PROB``; used by the
    classification-finetune path, not the contrastive loss).

    Returns (mixed images, soft labels ``[B, n_classes]``).
    """
    import jax
    import jax.numpy as jnp

    B = images.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    perm = jnp.roll(jnp.arange(B), 1)

    off = label_smoothing / n_classes
    on = 1.0 - label_smoothing + off
    y1 = jax.nn.one_hot(labels, n_classes) * (on - off) + off
    y2 = y1[perm]

    # Which modes are configured is static (python floats); WHICH one fires
    # on a given batch is a per-call device-side draw, so when both are on
    # the switch must stay traceable: compute both branches and select with
    # jnp.where (aug cost is negligible next to the model step).
    do_mixup = mixup_alpha > 0.0
    do_cutmix = cutmix_alpha > 0.0
    if not do_mixup and not do_cutmix:
        return images, y1

    def _mixup():
        lam = jax.random.beta(k2, mixup_alpha, mixup_alpha)
        return lam * images + (1.0 - lam) * images[perm], lam

    def _cutmix():
        lam = jax.random.beta(
            jax.random.fold_in(k2, 1), cutmix_alpha, cutmix_alpha
        )
        H, W = images.shape[1:3]
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (H * ratio).astype(jnp.int32)
        cut_w = (W * ratio).astype(jnp.int32)
        cy = jax.random.randint(k3, (), 0, H)
        cx = jax.random.randint(jax.random.fold_in(k3, 1), (), 0, W)
        y0 = jnp.clip(cy - cut_h // 2, 0, H)
        y1_ = jnp.clip(cy + cut_h // 2, 0, H)
        x0 = jnp.clip(cx - cut_w // 2, 0, W)
        x1_ = jnp.clip(cx + cut_w // 2, 0, W)
        yy = jnp.arange(H)[None, :, None, None]
        xx = jnp.arange(W)[None, None, :, None]
        in_box = (yy >= y0) & (yy < y1_) & (xx >= x0) & (xx < x1_)
        mixed = jnp.where(in_box, images[perm], images)
        lam_eff = 1.0 - ((y1_ - y0) * (x1_ - x0)) / (H * W)
        return mixed, lam_eff

    if do_mixup and do_cutmix:
        use_cut = jax.random.bernoulli(k1, switch_prob)
        m_img, m_lam = _mixup()
        c_img, c_lam = _cutmix()
        mixed = jnp.where(use_cut, c_img, m_img)
        lam_eff = jnp.where(use_cut, c_lam, m_lam)
    elif do_cutmix:
        mixed, lam_eff = _cutmix()
    else:
        mixed, lam_eff = _mixup()
    soft = lam_eff * y1 + (1.0 - lam_eff) * y2
    return mixed, soft


def random_resized_crop_params(key, B: int, H: int, W: int,
                               scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision ``RandomResizedCrop.get_params`` semantics, vectorized:
    10 independent attempts per sample, take the FIRST whose integer crop
    box fits; otherwise fall back to the ratio-clamped center crop.
    Returns int32 arrays ``(y0, x0, ch, cw)`` of shape [B]."""
    import jax
    import jax.numpy as jnp

    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    ta = H * W * jax.random.uniform(
        k_area, (B, 10), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio, (B, 10),
        minval=float(np.log(ratio[0])), maxval=float(np.log(ratio[1])),
    )
    aspect = jnp.exp(log_r)
    cw = jnp.round(jnp.sqrt(ta * aspect)).astype(jnp.int32)
    ch = jnp.round(jnp.sqrt(ta / aspect)).astype(jnp.int32)
    valid = (cw > 0) & (cw <= W) & (ch > 0) & (ch <= H)
    first = jnp.argmax(valid, axis=1)  # first True (or 0 if none)
    any_valid = valid.any(axis=1)
    rows = jnp.arange(B)
    cw, ch = cw[rows, first], ch[rows, first]

    # fallback box (static: H, W, ratio are python values)
    in_ratio = W / H
    if in_ratio < ratio[0]:
        fw, fh = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = H, int(round(H * ratio[1]))
    else:
        fw, fh = W, H
    cw = jnp.where(any_valid, cw, fw)
    ch = jnp.where(any_valid, ch, fh)
    y0 = jax.random.randint(k_y, (B,), 0, H - ch + 1)
    x0 = jax.random.randint(k_x, (B,), 0, W - cw + 1)
    y0 = jnp.where(any_valid, y0, (H - fh) // 2)
    x0 = jnp.where(any_valid, x0, (W - fw) // 2)
    return y0, x0, ch, cw


def bilinear_crop_resize(img, y0, x0, ch, cw, size: int):
    """Variable crop box -> fixed [size, size, C] by bilinear sampling
    (align_corners=False grid: src = (dst + 0.5) * crop/size - 0.5, edges
    clamped to the crop box — torchvision tensor-backend resize
    semantics; per-sample crop sizes are traced, so the kernel support of
    an antialiased resample cannot be static — sampling bilinear is the
    jit-compatible choice)."""
    import jax.numpy as jnp

    H = img.shape[0]
    W = img.shape[1]
    ys = y0 + (jnp.arange(size) + 0.5) * (ch / size) - 0.5
    xs = x0 + (jnp.arange(size) + 0.5) * (cw / size) - 0.5
    ys = jnp.clip(ys, y0, y0 + ch - 1)
    xs = jnp.clip(xs, x0, x0 + cw - 1)
    yf, xf = jnp.floor(ys), jnp.floor(xs)
    wy = (ys - yf)[:, None, None]
    wx = (xs - xf)[None, :, None]
    yi0 = jnp.clip(yf.astype(jnp.int32), 0, H - 1)
    xi0 = jnp.clip(xf.astype(jnp.int32), 0, W - 1)
    yi1 = jnp.minimum(yi0 + 1, jnp.minimum(y0 + ch - 1, H - 1))
    xi1 = jnp.minimum(xi0 + 1, jnp.minimum(x0 + cw - 1, W - 1))
    top = img[yi0][:, xi0] * (1 - wx) + img[yi0][:, xi1] * wx
    bot = img[yi1][:, xi0] * (1 - wx) + img[yi1][:, xi1] * wx
    return top * (1 - wy) + bot * wy


def train_augment(key, images_u8, size: int = 224,
                  mean=IMAGENET_MEAN, std=IMAGENET_STD,
                  scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """Device-side RandomResizedCrop(bilinear) + horizontal flip +
    normalize.

    The jit-compiled training-augmentation equivalent of the torchvision
    pipeline configured by ``AUG.*`` (``lib/config/default.py:88-107``):
    crop-box sampling follows ``RandomResizedCrop.get_params`` (10
    attempts + ratio-clamped center fallback) and the resample is bilinear
    (not nearest); every stochastic draw uses its own split key.
    """
    import jax
    import jax.numpy as jnp

    B, H, W, C = images_u8.shape
    k_crop, k_flip = jax.random.split(key)
    x = images_u8.astype(jnp.float32) / 255.0

    y0, x0, ch, cw = random_resized_crop_params(
        k_crop, B, H, W, scale=scale, ratio=ratio
    )
    x = jax.vmap(
        lambda im, a, b, c, d: bilinear_crop_resize(im, a, b, c, d, size)
    )(x, y0, x0, ch, cw)
    flip = jax.random.bernoulli(k_flip, 0.5, (B,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (x - mean_a) / std_a
