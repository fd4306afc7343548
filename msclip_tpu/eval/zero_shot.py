"""Zero-shot evaluation engine.

The TPU-native rebuild of the reference eval pipeline
(``tools/zero_shot.py:183-310``, SURVEY.md §3.2):

* classifier build — all ``n_classes x n_templates`` prompts are tokenized
  host-side, then text-encoded in one jit-compiled chunked loop (the
  reference does 1,000 sequential 80-text forwards);
* image loop — jit-compiled image encoder over a prefetching host loader
  with padded static-shape batches;
* metric finalize — accuracy / 11-point mAP / mean-per-class / ROC-AUC
  selected by ``TEST.METRIC``.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ClipTokenizer, get_classnames, get_templates
from ..data.loader import BatchLoader
from ..models import MSClipModel
from ..utils import metrics as M


def build_zeroshot_classifier(model: MSClipModel, params, tokenizer,
                              classnames, templates, chunk_size: int = 1024):
    """Prompt-ensemble classifier: ``[embed_dim, n_classes]``.

    Per class: encode all templates (L2-normed), average, re-normalize
    (reference ``zeroshot_classifier``, tools/zero_shot.py:122-134).

    The chunk loop dispatches asynchronously (no per-chunk fetch), so
    wall time = one encode_text compile + total device compute
    (~0.11 s / 1024 texts on v5e) + the 2.8 s host BPE. A measured
    one-dispatch lax.scan variant saved nothing warm and cost a 6.8-min
    scan compile cold — per-chunk compilation is the right shape here.
    """
    from .device import local_batch_sharding

    n_classes, n_templates = len(classnames), len(templates)
    texts = [t.format(c) for c in classnames for t in templates]
    tokens = tokenizer(texts, model.spec.context_length)  # [C*T, 77]

    encode = jax.jit(lambda p, t: model.encode_text(p, t))
    _, sharding = local_batch_sharding()  # chunk_size % n_local must hold
    total = tokens.shape[0]
    # pad to a whole number of chunks for a single compiled shape;
    # repeat row 0 so the pad is always long enough even when the whole
    # prompt set is smaller than one chunk
    pad = (-total) % chunk_size
    if pad:
        tokens = np.concatenate(
            [tokens, np.repeat(tokens[:1], pad, axis=0)], axis=0
        )
    embeds = []
    for i in range(0, tokens.shape[0], chunk_size):
        chunk = tokens[i : i + chunk_size]
        if sharding is not None and chunk.shape[0] % len(
            sharding.mesh.devices
        ) == 0:
            chunk = jax.device_put(chunk, sharding)  # direct sharded xfer
        else:
            chunk = jnp.asarray(chunk)
        embeds.append(encode(params, chunk))
    embeds = jnp.concatenate(embeds, axis=0)[:total]
    embeds = embeds.reshape(n_classes, n_templates, -1)
    class_embeds = embeds.mean(axis=1)
    class_embeds = class_embeds / jnp.linalg.norm(
        class_embeds, axis=-1, keepdims=True
    )
    return class_embeds.T  # [E, C]


def resolve_prompts(prompt_name: str, dataset):
    """``(classnames, templates)`` for a zero-shot run: the curated
    prompt set when one exists, else the dataset's own classnames under
    the ImageNet-80 template ensemble (CLIP-paper default for unlisted
    datasets). Rejects numeric placeholder classnames — loaders whose
    label files are absent synthesize ``["0", "1", ...]``, and prompts
    like 'a photo of a 42.' would yield a plausible-looking near-chance
    accuracy instead of an error."""
    try:
        return get_classnames(prompt_name), get_templates(prompt_name)
    except ValueError:
        classnames = [str(c).replace("_", " ")
                      for c in getattr(dataset, "classes", [])]
        if not classnames:
            raise
        if all(c.strip().isdigit() for c in classnames):
            raise ValueError(
                f"dataset '{prompt_name}' exposes only numeric "
                "placeholder classnames — zero-shot needs real class "
                "names: provide the dataset's label/classname file or a "
                "curated prompt set (data/assets/prompts.json)"
            )
        logging.info(f"=> no prompt set for '{prompt_name}'; using "
                     f"{len(classnames)} dataset classnames with the "
                     "imagenet template ensemble")
        return classnames, get_templates("imagenet")


def make_dataset(config, transform=None, image_set: str = "test"):
    """Dataset factory mirroring the reference's dispatch
    (tools/zero_shot.py:208-217) plus a synthetic fallback for CI.

    ``image_set``: ``"test"`` (default, the eval split each dataset's
    protocol prescribes) or ``"train"`` (for linear-probe feature
    extraction)."""
    import functools
    import os

    from ..data.datasets import (
        ChestXRay8,
        HatefulMemes,
        ImageFolderDataset,
        SyntheticImageDataset,
        Voc2007Classification,
    )
    from ..data.transforms import pil_eval_transform

    # native C++ decode path (msclip_tpu.native): only for ImageFolder with
    # the default eval transform semantics; honors the config's size/stats
    use_native = (transform is None
                  and os.environ.get("MSCLIP_NATIVE_DECODE") == "1")
    if transform is None:
        transform = functools.partial(
            pil_eval_transform,
            size=config.TEST.IMAGE_SIZE[0],
            mean=tuple(config.INPUT.MEAN),
            std=tuple(config.INPUT.STD),
        )

    name = config.DATASET.DATASET
    root = config.DATASET.ROOT
    from ..data.probe_datasets import PROBE_DATASETS, build_probe_dataset

    if name in PROBE_DATASETS:
        return build_probe_dataset(name, root, image_set,
                                   transform=transform)
    if name == "voc2007classification":
        return Voc2007Classification(root, image_set=image_set,
                                     transform=transform)
    if name == "hatefulmemes":
        # its labeled eval split is 'val' (reference dataset.py:72-116)
        split = "val" if image_set == "test" else image_set
        return HatefulMemes(root, image_set=split, transform=transform)
    if name == "chestxray8":
        return ChestXRay8(root, image_set=image_set, transform=transform)
    if name == "synthetic":
        return SyntheticImageDataset(
            n=config.DATASET.get("NUM_SAMPLES", 256),
            size=config.TEST.IMAGE_SIZE[0],
            n_classes=config.DATASET.get("NUM_CLASSES", 1000),
            # test split keeps the historical seed 0; train gets
            # disjoint samples for probe feature extraction
            seed=10_000 if image_set == "train" else 0,
        )
    folder = os.path.join(
        root,
        config.DATASET.TRAIN_SET if image_set == "train"
        else config.DATASET.TEST_SET,
    )
    if use_native:
        return ImageFolderDataset(
            folder, native=True,
            image_size=config.TEST.IMAGE_SIZE[0],
            mean=tuple(config.INPUT.MEAN), std=tuple(config.INPUT.STD),
        )
    return ImageFolderDataset(folder, transform=transform)


def _consume(pending, metric, top1, all_logits, all_y, all_pred):
    logits_dev, batch = pending
    logits = np.asarray(logits_dev)
    mask = batch["mask"]
    if all_pred is not None:  # TEST.SAVE_PRED: per-image argmax + label
        all_pred.append((logits[mask].argmax(-1).astype(np.int64),
                         np.asarray(batch["label"])[mask]))
    if metric in ("11point_mAP", "mean-per-class", "roc_auc"):
        all_logits.append(logits[mask])
        all_y.append(np.asarray(batch["label"])[mask])
    else:
        prec1 = M.topk_accuracy(logits, batch["label"], (1,), mask)[0]
        top1.update(prec1, int(mask.sum()))


def run_zero_shot(config, dataset=None, prompt_dataset: str | None = None):
    """Full zero-shot eval; returns (metric_value, stats dict)."""
    from ..models import build_model
    from .checkpoint_load import load_model_params

    model = build_model(config)
    params = load_model_params(config, model)
    if config.TPU.get("FOLD_BN", True):
        from ..models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, model.spec)
    if config.TPU.get("INT8_EVAL", False):
        from ..models.quantize import quantize_params_for_eval

        params = quantize_params_for_eval(params, model.spec)

    tokenizer = ClipTokenizer()
    prompt_name = prompt_dataset or config.DATASET.DATASET
    if prompt_name == "synthetic":
        prompt_name = "imagenet"
    if dataset is None:
        dataset = make_dataset(config)
    classnames, templates = resolve_prompts(prompt_name, dataset)
    subset = int(config.TEST.get("SUBSET_CLASSES", 0) or 0)
    if subset > 0:
        classnames = classnames[:subset]

    logging.info("=> Start to build zeroshot classifier "
                 f"({len(classnames)} classes x {len(templates)} templates)")
    t0 = time.time()
    weights = build_zeroshot_classifier(
        model, params, tokenizer, classnames, templates
    )
    weights.block_until_ready()
    logging.info(f"=> classifier built in {time.time() - t0:.1f}s")

    from ..utils.comm import comm, gather_arrays, reduce_dict

    # Two-level data parallelism: each process evaluates a stripe of the
    # dataset (metrics reduced across processes), and within a process
    # the batch is sharded over all local chips — TEST.BATCH_SIZE_PER_GPU
    # keeps its reference meaning (per-chip batch), so a v5e-8 host runs
    # an 8x global batch with XLA splitting the image tower per chip.
    from .device import local_batch_sharding

    n_local, batch_sharding = local_batch_sharding()
    loader = BatchLoader(
        dataset,
        batch_size=config.TEST.BATCH_SIZE_PER_GPU * n_local,
        workers=config.WORKERS,
        shard=(comm.rank, comm.world_size),
    )

    # uint8-boundary datasets (native decode): pixels cross the host->
    # device link as uint8 crops (4x smaller) and the /255-mean-std
    # normalize runs in-graph, where XLA fuses it into the first conv —
    # numerically identical to host-side fp32 normalize (the op order
    # matches pil_eval_transform exactly; see data/transforms.py).
    from ..data.transforms import dataset_normalizer

    # stats come from the dataset itself (ctor mean/std — make_dataset
    # passes config.INPUT there), so a dataset built with custom stats
    # normalizes identically on the uint8 and fp32 paths
    pre = dataset_normalizer(dataset)

    @jax.jit
    def logits_fn(params, weights, images):
        feats = model.encode_image(params, pre(images))
        return 100.0 * feats @ weights

    metric = config.TEST.get("METRIC", "accuracy")
    save_pred = config.TEST.get("SAVE_PRED", "")
    top1 = M.AverageMeter()
    all_logits, all_y = [], []
    all_pred = [] if save_pred else None
    n_images = 0
    t0 = time.time()
    logging.info("=> Start to inference")
    # MSCLIP_TRACE=<dir>: xprof trace of steady-state eval batches 3-6
    # (past compile), rank 0 only — the CLI hook for
    # utils/summary.profile_trace (SURVEY.md §5 tracing)
    trace_dir = os.environ.get("MSCLIP_TRACE") if comm.rank == 0 else None
    tracing = False
    # simple double-buffering: dispatch batch i+1's transfer+compute before
    # reading batch i's result back to the host
    pending = None
    for bi, batch in enumerate(loader):
        if trace_dir and not tracing and bi == 3:
            jax.profiler.start_trace(trace_dir)
            tracing = True
        # device_put straight from numpy: one sharded host->chips
        # transfer (jnp.asarray first would commit the full batch to
        # device 0 and re-distribute)
        images = (jax.device_put(batch["image"], batch_sharding)
                  if batch_sharding is not None
                  else jnp.asarray(batch["image"]))
        dispatched = (logits_fn(params, weights, images), batch)
        if pending is not None:
            _consume(pending, metric, top1, all_logits, all_y, all_pred)
            n_images += int(pending[1]["mask"].sum())
        pending = dispatched
        if tracing and bi >= 6:
            pending[0].block_until_ready()  # flush the traced batches
            jax.profiler.stop_trace()
            tracing = False
            trace_dir = None
            logging.info("xprof trace written (MSCLIP_TRACE)")
    if tracing:  # dataset shorter than the trace window
        jax.profiler.stop_trace()
    if pending is not None:
        _consume(pending, metric, top1, all_logits, all_y, all_pred)
        n_images += int(pending[1]["mask"].sum())
    elapsed = time.time() - t0

    if save_pred and all_pred:
        arrs = {
            "pred": np.concatenate([p for p, _ in all_pred]),
            "label": np.concatenate([l for _, l in all_pred]),
        }
        if all_logits:
            arrs["logits"] = np.concatenate(all_logits)
        if comm.world_size > 1:
            # one file per stripe — identical paths on a shared
            # filesystem would clobber each other (last writer wins)
            root, ext = os.path.splitext(save_pred)
            save_pred = f"{root}.rank{comm.rank}{ext or '.npz'}"
        np.savez(save_pred, **arrs)
        logging.info(f"=> saved per-image predictions to {save_pred}")

    if comm.world_size > 1 and metric in ("11point_mAP", "mean-per-class",
                                          "roc_auc"):
        all_logits = [gather_arrays(np.concatenate(all_logits))]
        all_y = [gather_arrays(np.concatenate(all_y))]
    elif comm.world_size > 1:
        sums = reduce_dict(
            {"sum": top1.sum, "count": float(top1.count)}, average=False
        )
        top1 = M.AverageMeter()
        top1.update(sums["sum"] / max(sums["count"], 1), int(sums["count"]))

    if metric == "11point_mAP":
        value = M.multilabel_map_11points(
            np.concatenate(all_y), np.concatenate(all_logits)
        )
    elif metric == "mean-per-class":
        value = M.mean_per_class_accuracy(
            np.concatenate(all_y), np.concatenate(all_logits)
        )
    elif metric == "roc_auc":
        value = M.roc_auc(np.concatenate(all_y), np.concatenate(all_logits))
    else:
        value = top1.avg

    stats = {
        "n_images": n_images,
        "elapsed_s": elapsed,
        "images_per_sec": n_images / max(elapsed, 1e-9),
        "metric": metric,
    }
    logging.info(
        "=> {dataset}% TEST:\t"
        "Error@1 {error1:.3f}%\t"
        "{metric}@1 {top1:.3f}%\t({ips:.0f} img/s)".format(
            dataset=config.DATASET.DATASET, metric=metric, top1=value,
            error1=100 - value, ips=stats["images_per_sec"],
        )
    )
    return value, stats
