"""AOT serving bundles.

A *bundle* is a directory that fully describes a deployable model:

```
bundle/
  MANIFEST.json        # format, buckets, image size, normalize stats,
                       # platforms, param-tree paths, optional classnames
  image_b{B}.jaxexp    # jax.export blob: (params, uint8 [B,S,S,3]) -> [B,E]
  text_b{B}.jaxexp     # jax.export blob: (params, int32 [B,T])     -> [B,E]
  params.npz           # parameter leaves (fp32), keyed p0..pN; the tree
                       # structure lives in MANIFEST["param_paths"]
  classifier.npy       # optional [E, C] prompt-ensemble classifier
```

Design notes (TPU-first):

* **Static batch buckets, not symbolic shapes.** ``jax.export`` supports
  symbolic dimensions, but dynamic dims keep XLA off its tiled MXU paths
  and are unsupported by the Pallas attention kernels; a small ladder of
  static buckets (pad to the next bucket, slice the result) is the
  idiomatic TPU serving answer and costs only a few MB of StableHLO per
  bucket.
* **uint8 at the host boundary.** The exported image graph takes the
  *uint8 center crop* and performs /255 + ImageNet normalization on
  device (XLA fuses it into the first conv). Host-side decode/resize/crop
  uses the same PIL-parity semantics as the eval transform
  (:func:`pil_to_uint8`), so served embeddings are bit-identical to
  ``pil_eval_transform`` + ``encode_image``; the wire/PCIe payload is 4x
  smaller than fp32.
* **Parameters ride beside the graph, not inside it.** Exporting params
  as an argument (not baked constants) keeps the per-bucket blobs tiny
  and lets one ``params.npz`` serve every bucket; the loader device_puts
  the tree once.

``jax.export`` is ahead-of-time *lowering*: the serve host needs no model
code, no tracing, and gets stable numerics across framework versions, but
XLA still compiles each blob once per process (mitigate with the
persistent compilation cache, see docs/SERVING.md).

Reference counterpart: none — the reference ships research eval scripts
only (``/root/reference/tools/zero_shot.py``).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import numpy as np

DEFAULT_BUCKETS = (1, 4, 16, 64)
MANIFEST_NAME = "MANIFEST.json"
FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# param-tree (de)serialization: nested dict/list trees with array leaves
# ---------------------------------------------------------------------------

def _flatten_tree(tree, prefix=()):
    """Yield ``(path, leaf)`` pairs; path elements are ``["k", name]`` for
    dict keys and ``["i", idx]`` for list indices (JSON-serializable)."""
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten_tree(tree[k], prefix + (["k", k],))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_tree(v, prefix + (["i", i],))
    else:
        yield list(prefix), tree


def _rebuild_tree(paths, leaves):
    root = None

    def ensure(container, step, nxt):
        kind, key = step
        default = {} if nxt[0] == "k" else [] if nxt is not None else None
        if kind == "k":
            if key not in container:
                container[key] = default
            return container[key]
        while len(container) <= key:
            container.append(None)
        if container[key] is None:
            container[key] = default
        return container[key]

    for path, leaf in zip(paths, leaves):
        if root is None:
            root = {} if path[0][0] == "k" else []
        node = root
        for i, step in enumerate(path[:-1]):
            node = ensure(node, step, path[i + 1])
        kind, key = path[-1]
        if kind == "k":
            node[key] = leaf
        else:
            while len(node) <= key:
                node.append(None)
            node[key] = leaf
    return root


def save_params_npz(path: str, params):
    """Save a param pytree as npz + return the JSON-able path list."""
    pairs = list(_flatten_tree(params))
    arrays = {f"p{i}": np.asarray(leaf) for i, (_, leaf) in enumerate(pairs)}
    np.savez(path, **arrays)
    return [p for p, _ in pairs]


def load_params_npz(path: str, param_paths):
    with np.load(path) as z:
        leaves = [z[f"p{i}"] for i in range(len(param_paths))]
    # npz round-trips as np arrays; jax treats them as fp32/int leaves
    paths = [[tuple(step) for step in p] for p in param_paths]
    return _rebuild_tree(paths, leaves)


# ---------------------------------------------------------------------------
# host-side preprocessing (decode -> uint8 crop; normalize is in-graph)
# ---------------------------------------------------------------------------

def pil_to_uint8(image, size: int = 224) -> np.ndarray:
    """PIL image -> uint8 ``[size, size, 3]`` center crop.

    Exactly the resize/crop stages of
    :func:`msclip_tpu.data.transforms.pil_eval_transform` (torchvision
    Resize-short-side + CenterCrop semantics, PIL bicubic); the /255 +
    ImageNet normalize runs inside the exported graph, so
    ``graph(pil_to_uint8(img))`` equals
    ``encode_image(pil_eval_transform(img))`` bit-for-bit. (Alias of
    :func:`msclip_tpu.data.transforms.pil_eval_uint8` — the same uint8
    boundary now also feeds the native eval/bench paths.)
    """
    from ..data.transforms import pil_eval_uint8

    return pil_eval_uint8(image, size)


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _shape_structs(params):
    import jax

    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )


def export_bundle(
    model,
    params,
    out_dir: str,
    *,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    image_size: int = 224,
    platforms: Optional[Sequence[str]] = None,
    classifier: Optional[np.ndarray] = None,
    classnames: Optional[Sequence[str]] = None,
    mean=None,
    std=None,
):
    """Export ``model``/``params`` into a serving bundle at ``out_dir``.

    ``classifier``: optional ``[E, C]`` zero-shot classifier (already
    prompt-ensembled + L2-normalized); stored for ``/v1/classify``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    mean = tuple(mean) if mean is not None else IMAGENET_MEAN
    std = tuple(std) if std is not None else IMAGENET_STD
    spec = model.spec
    buckets = sorted(set(int(b) for b in buckets))
    if platforms is None:
        platforms = [jexport.default_export_platform()]
    os.makedirs(out_dir, exist_ok=True)

    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    def image_fn(p, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - mean_a) / std_a
        return model.encode_image(p, x)

    def text_fn(p, tokens):
        return model.encode_text(p, tokens)

    p_structs = _shape_structs(params)
    files = {}
    for b in buckets:
        img_struct = jax.ShapeDtypeStruct(
            (b, image_size, image_size, 3), jnp.uint8
        )
        tok_struct = jax.ShapeDtypeStruct(
            (b, spec.context_length), jnp.int32
        )
        exp_i = jexport.export(jax.jit(image_fn), platforms=list(platforms))(
            p_structs, img_struct
        )
        exp_t = jexport.export(jax.jit(text_fn), platforms=list(platforms))(
            p_structs, tok_struct
        )
        for tag, exp in (("image", exp_i), ("text", exp_t)):
            name = f"{tag}_b{b}.jaxexp"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            files[f"{tag}_b{b}"] = name

    param_paths = save_params_npz(os.path.join(out_dir, "params.npz"), params)

    embed_dim = int(spec.embed_dim)
    manifest = {
        "format": FORMAT_VERSION,
        "buckets": buckets,
        "image_size": image_size,
        "context_length": int(spec.context_length),
        "embed_dim": embed_dim,
        "mean": list(mean),
        "std": list(std),
        "platforms": list(platforms),
        "files": files,
        "param_paths": param_paths,
    }
    if classifier is not None:
        np.save(os.path.join(out_dir, "classifier.npy"),
                np.asarray(classifier, np.float32))
        manifest["classifier"] = "classifier.npy"
        if classnames is not None:
            manifest["classnames"] = list(classnames)
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# ---------------------------------------------------------------------------
# load + serve-side model
# ---------------------------------------------------------------------------

class ServingModel:
    """A loaded bundle: bucketed AOT graphs + device-resident params.

    ``encode_image`` takes uint8 ``[N, S, S, 3]`` (any N; chunked into the
    largest bucket, remainder padded up to the smallest fitting bucket)
    and returns fp32 ``[N, E]``; ``encode_text`` the same over token ids
    or raw strings. ``classify`` returns the reference-convention logits
    ``100 * feats @ W`` against the bundled classifier
    (``/root/reference/tools/zero_shot.py:149`` semantics).
    """

    def __init__(self, manifest: dict, image_fns, text_fns, params,
                 classifier: Optional[np.ndarray] = None):
        self.manifest = manifest
        self.buckets = sorted(manifest["buckets"])
        self.image_size = manifest["image_size"]
        self.context_length = manifest["context_length"]
        self.embed_dim = manifest["embed_dim"]
        self._image_fns = image_fns  # {bucket: callable(params, x)}
        self._text_fns = text_fns
        self._params = params
        self.classifier = classifier
        self.classnames = manifest.get("classnames")
        self._tokenizer = None

    # -- batching over buckets ------------------------------------------
    def _run_bucketed(self, fns: dict, x: np.ndarray,
                      pad_value) -> np.ndarray:
        n = x.shape[0]
        if n == 0:
            return np.zeros((0, self.embed_dim), np.float32)
        out = []
        top = self.buckets[-1]
        i = 0
        while i < n:
            rem = n - i
            b = next((b for b in self.buckets if b >= rem), top)
            take = min(rem, b)
            chunk = x[i:i + take]
            if take < b:
                pad = np.full((b - take,) + x.shape[1:], pad_value, x.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            res = np.asarray(fns[b](self._params, chunk))
            out.append(res[:take])
            i += take
        return np.concatenate(out, axis=0)

    def encode_image(self, images_u8: np.ndarray) -> np.ndarray:
        images_u8 = np.asarray(images_u8, np.uint8)
        if images_u8.ndim == 3:
            images_u8 = images_u8[None]
        return self._run_bucketed(self._image_fns, images_u8, 0)

    def encode_text(self, texts_or_tokens) -> np.ndarray:
        if (isinstance(texts_or_tokens, (list, tuple))
                and texts_or_tokens
                and isinstance(texts_or_tokens[0], str)) or isinstance(
                    texts_or_tokens, str):
            if self._tokenizer is None:
                from ..data.tokenizer import ClipTokenizer

                self._tokenizer = ClipTokenizer()
            texts = ([texts_or_tokens] if isinstance(texts_or_tokens, str)
                     else list(texts_or_tokens))
            tokens = np.asarray(
                self._tokenizer.tokenize(
                    texts, context_length=self.context_length
                ),
                np.int32,
            )
        else:
            tokens = np.asarray(texts_or_tokens, np.int32)
            if tokens.ndim == 1:
                tokens = tokens[None]
        return self._run_bucketed(self._text_fns, tokens, 0)

    def classify(self, images_u8: np.ndarray) -> np.ndarray:
        if self.classifier is None:
            raise ValueError("bundle was exported without a classifier")
        feats = self.encode_image(images_u8)
        return 100.0 * feats @ self.classifier


def load_bundle(bundle_dir: str) -> ServingModel:
    """Load a bundle directory; no model code or spec needed."""
    import jax
    from jax import export as jexport

    with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    if manifest.get("format") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported bundle format {manifest.get('format')!r}"
        )

    params = load_params_npz(
        os.path.join(bundle_dir, "params.npz"), manifest["param_paths"]
    )
    params = jax.device_put(params)  # once; jit calls reuse the buffers

    def _load(tag: str, b: int) -> Callable:
        name = manifest["files"][f"{tag}_b{b}"]
        with open(os.path.join(bundle_dir, name), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        return jax.jit(exp.call)

    image_fns = {b: _load("image", b) for b in manifest["buckets"]}
    text_fns = {b: _load("text", b) for b in manifest["buckets"]}

    classifier = None
    if "classifier" in manifest:
        classifier = np.load(
            os.path.join(bundle_dir, manifest["classifier"])
        )
    return ServingModel(manifest, image_fns, text_fns, params, classifier)
