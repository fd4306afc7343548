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


def pil_eval_transform(image, size: int = 224,
                       mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """PIL image -> float32 HWC array, reference-eval-compatible."""
    from PIL import Image

    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    # torchvision Resize(size): scale the SHORT side to `size`
    if w <= h:
        new_w, new_h = size, max(int(round(size * h / w)), size)
    else:
        new_w, new_h = max(int(round(size * w / h)), size), size
    image = image.resize((new_w, new_h), Image.BICUBIC)
    # torchvision CenterCrop
    left = int(round((new_w - size) / 2.0))
    top = int(round((new_h - size) / 2.0))
    image = image.crop((left, top, left + size, top + size))
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
    scale = size / min(H, W)
    new_h, new_w = max(int(round(H * scale)), size), max(
        int(round(W * scale)), size
    )
    x = jax.image.resize(x, (B, new_h, new_w, C), "bicubic",
                         antialias=antialias)
    # torchvision CenterCrop rounds .5 up
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

    use_cutmix = (
        cutmix_alpha > 0.0
        and (mixup_alpha == 0.0
             or bool(jax.random.bernoulli(k1, switch_prob)))
    )
    alpha = cutmix_alpha if use_cutmix else mixup_alpha
    if alpha <= 0.0:
        return images, y1
    lam = jax.random.beta(k2, alpha, alpha)

    if use_cutmix:
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
    else:
        mixed = lam * images + (1.0 - lam) * images[perm]
        lam_eff = lam
    soft = lam_eff * y1 + (1.0 - lam_eff) * y2
    return mixed, soft


def train_augment(key, images_u8, size: int = 224,
                  mean=IMAGENET_MEAN, std=IMAGENET_STD,
                  scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """Device-side RandomResizedCrop + horizontal flip + normalize.

    The jit-compiled training-augmentation equivalent of the torchvision
    pipeline configured by ``AUG.*`` (``lib/config/default.py:88-107``).
    """
    import jax
    import jax.numpy as jnp

    B, H, W, C = images_u8.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = images_u8.astype(jnp.float32) / 255.0

    area = H * W * jax.random.uniform(
        k1, (B,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k2, (B,),
        minval=jnp.log(jnp.asarray(ratio[0])),
        maxval=jnp.log(jnp.asarray(ratio[1])),
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(area * aspect), 8, W).astype(jnp.int32)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8, H).astype(jnp.int32)
    x0 = (jax.random.uniform(k3, (B,)) * (W - cw)).astype(jnp.int32)
    y0 = (jax.random.uniform(k4, (B,)) * (H - ch)).astype(jnp.int32)

    def crop_resize(img, y0, x0, ch, cw):
        # gather-based variable crop + resize to fixed size
        ys = y0 + (jnp.arange(size) * ch) // size
        xs = x0 + (jnp.arange(size) * cw) // size
        return img[ys][:, xs]

    x = jax.vmap(crop_resize)(x, y0, x0, ch, cw)
    flip = jax.random.bernoulli(k1, 0.5, (B,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (x - mean_a) / std_a
