"""Image-text retrieval evaluation (recall@K).

Standard CLIP-family evaluation (Flickr30k/COCO protocol): encode all
images and captions, rank by cosine similarity both directions, report
R@1/5/10. Not in the reference release (its eval is zero-shot
classification only), but part of the capability surface a CLIP framework
owes its users.
"""

from __future__ import annotations

import logging
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ClipTokenizer
from ..data.loader import BatchLoader
from ..models import MSClipModel


def encode_corpus(model: MSClipModel, params, image_dataset,
                  captions: Sequence[str], tokenizer=None, batch_size=256,
                  workers=8):
    """Encode all images and captions -> (img_feats [N,E], txt_feats [M,E])."""
    from .device import local_batch_sharding

    tokenizer = tokenizer or ClipTokenizer()
    n_local, sharding = local_batch_sharding()
    batch_size = batch_size * n_local  # per-chip -> per-dispatch
    # uint8-boundary datasets (native decode) normalize in-graph
    from ..data.transforms import dataset_normalizer

    pre = dataset_normalizer(image_dataset)
    encode_img = jax.jit(lambda p, x: model.encode_image(p, pre(x)))
    encode_txt = jax.jit(lambda p, t: model.encode_text(p, t))

    feats = []
    for batch in BatchLoader(image_dataset, batch_size, workers=workers):
        # one sharded host->chips transfer, straight from numpy
        images = (jax.device_put(batch["image"], sharding)
                  if sharding is not None
                  else jnp.asarray(batch["image"]))
        f = np.asarray(encode_img(params, images))
        feats.append(f[batch["mask"]])
    img_feats = np.concatenate(feats)

    tokens = tokenizer(list(captions), model.spec.context_length)
    pad = (-len(tokens)) % batch_size
    if pad:  # repeat row 0: always long enough, even for tiny caption sets
        tokens = np.concatenate(
            [tokens, np.repeat(tokens[:1], pad, axis=0)]
        )
    tfeats = []
    for i in range(0, len(tokens), batch_size):
        chunk = tokens[i:i + batch_size]
        chunk = (jax.device_put(chunk, sharding) if sharding is not None
                 else jnp.asarray(chunk))
        tfeats.append(np.asarray(encode_txt(params, chunk)))
    txt_feats = np.concatenate(tfeats)[: len(captions)]
    return img_feats, txt_feats


def recall_at_k(similarity: np.ndarray, gt_index: np.ndarray,
                ks=(1, 5, 10)) -> Dict[int, float]:
    """similarity [Q, C]; gt_index [Q] ground-truth column per query row."""
    order = np.argsort(-similarity, axis=1)
    ranks = np.argmax(order == gt_index[:, None], axis=1)
    return {k: 100.0 * float((ranks < k).mean()) for k in ks}


def run_retrieval(model: MSClipModel, params, image_dataset,
                  captions: Sequence[str],
                  caption_to_image: Sequence[int],
                  batch_size=256, workers=8, ks=(1, 5, 10)):
    """Bidirectional retrieval; ``caption_to_image[m]`` is the image index
    caption ``m`` describes. Returns {'i2t': {k: R@k}, 't2i': {k: R@k}}."""
    img_feats, txt_feats = encode_corpus(
        model, params, image_dataset, captions, batch_size=batch_size,
        workers=workers,
    )
    sim = img_feats @ txt_feats.T  # [N, M]
    cap2img = np.asarray(caption_to_image)

    # text -> image: rank images per caption; gt is its image
    t2i = recall_at_k(sim.T, cap2img, ks)

    # image -> text: rank captions per image; an image may have several
    # captions — count the best-ranked one
    order = np.argsort(-sim, axis=1)  # [N, M]
    hit_matrix = cap2img[order] == np.arange(sim.shape[0])[:, None]
    first_hit = np.argmax(hit_matrix, axis=1)
    i2t = {k: 100.0 * float((first_hit < k).mean()) for k in ks}

    logging.info(f"=> retrieval i2t: {i2t}  t2i: {t2i}")
    return {"i2t": i2t, "t2i": t2i}
