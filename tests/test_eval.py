"""Eval-harness tests: classifier build, metric math, loader padding, and
an end-to-end synthetic zero-shot run through the config-driven API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.data.loader import BatchLoader
from msclip_tpu.data.datasets import SyntheticImageDataset
from msclip_tpu.utils import metrics as M


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.4, 0.1, 0.5]])
    target = np.array([1, 0, 0])
    top1, top2 = M.topk_accuracy(logits, target, (1, 2))
    assert top1 == pytest.approx(100 * 2 / 3)
    assert top2 == pytest.approx(100.0)


def test_topk_accuracy_mask():
    logits = np.array([[0.9, 0.1], [0.9, 0.1]])
    target = np.array([0, 1])
    mask = np.array([True, False])
    assert M.topk_accuracy(logits, target, (1,), mask)[0] == 100.0


def test_map_11points_perfect():
    y = np.array([1, 1, 0, 0])
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    assert M.map_11points(y, scores) == pytest.approx(1.0)


def test_loader_padding_and_order():
    ds = SyntheticImageDataset(n=10, size=8)
    loader = BatchLoader(ds, batch_size=4, workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["mask"].sum() == 2
    assert all(b["image"].shape == (4, 8, 8, 3) for b in batches)
    # deterministic order
    first = ds[0][0]
    np.testing.assert_array_equal(batches[0]["image"][0], first)


def test_zeroshot_classifier_shape():
    from msclip_tpu.data import ClipTokenizer
    from msclip_tpu.eval import build_zeroshot_classifier
    from msclip_tpu.models import MSClipModel, MSClipSpec

    spec = MSClipSpec(
        embed_dim=32, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=49408,
    )
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    tok = ClipTokenizer()
    classnames = ["cat", "dog", "bird"]
    templates = ["a photo of a {}.", "an image of a {}."]
    w = build_zeroshot_classifier(model, params, tok, classnames, templates,
                                  chunk_size=4)
    assert w.shape == (32, 3)
    norms = np.linalg.norm(np.asarray(w), axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_run_zero_shot_synthetic():
    """End-to-end config-driven eval on synthetic data."""
    from msclip_tpu.config import get_default_config
    from msclip_tpu.eval import run_zero_shot

    cfg = get_default_config()
    cfg.merge_from_dict({
        "MODEL": {"SPEC": {
            "EMBED_DIM": 32,
            "VISION": {"MODEL": "vit", "PATCH_SIZE": 16, "WIDTH": 64,
                        "LAYERS": 2},
            "TEXT": {"TOKENIZER": "clip", "STYLE": "clip",
                      "CONTEXT_LENGTH": 77, "VOCAB_SIZE": 49408,
                      "WIDTH": 64, "HEADS": 1, "LAYERS": 2},
        }},
        "DATASET": {"DATASET": "synthetic", "NUM_SAMPLES": 16,
                     "NUM_CLASSES": 10},
        "TRAIN": {"IMAGE_SIZE": [32, 32]},
        "TEST": {"IMAGE_SIZE": [32, 32], "BATCH_SIZE_PER_GPU": 8,
                  "METRIC": "accuracy"},
        "WORKERS": 2,
    })
    # use a 10-class slice of the imagenet prompts via synthetic->imagenet
    value, stats = run_zero_shot(cfg)
    assert 0.0 <= value <= 100.0
    assert stats["n_images"] == 16


def _uint8_pil_dataset_pair(tmp_path, *, seed, img_hw, n_per_class,
                            size=32):
    """PNG cat/dog class-folder fixture + (native uint8-boundary, PIL
    fp32) dataset pair over the SAME files — the two ends of the
    dataset_normalizer contract (data/transforms.py). One source of
    truth for the uint8-parity tests below."""
    import os

    from PIL import Image

    from msclip_tpu.data.datasets import ImageFolderDataset
    from msclip_tpu.data.transforms import pil_eval_transform

    rng = np.random.default_rng(seed)
    for cls in ["cat", "dog"]:
        os.makedirs(tmp_path / "imgs" / cls)
        for i in range(n_per_class):
            Image.fromarray(
                rng.integers(0, 256, (*img_hw, 3), np.uint8), "RGB"
            ).save(tmp_path / "imgs" / cls / f"{i}.png")
    ds_u8 = ImageFolderDataset(str(tmp_path / "imgs"), native=True,
                               image_size=size)
    assert ds_u8.emits_uint8
    ds_pil = ImageFolderDataset(
        str(tmp_path / "imgs"),
        transform=lambda im: pil_eval_transform(im, size=size),
    )
    return ds_u8, ds_pil


def test_run_zero_shot_uint8_boundary_matches_pil(tmp_path, monkeypatch):
    """End-to-end uint8-boundary wiring: a native ImageFolder dataset
    (emits_uint8) evaluated through run_zero_shot must reproduce the PIL
    fp32 path EXACTLY — the uint8 crop + in-graph normalize is
    bit-identical to host-side normalize (data/transforms.py). PNG inputs
    pin the pixels themselves (the PIL-uint8 fallback inside the native
    dataset), isolating the boundary/wiring from JPEG-decoder rounding,
    which test_native_pipeline.py covers separately."""
    from msclip_tpu.config import get_default_config
    from msclip_tpu.eval import run_zero_shot

    ds_u8, ds_pil = _uint8_pil_dataset_pair(tmp_path, seed=0,
                                            img_hw=(48, 64), n_per_class=4)

    cfg = get_default_config()
    cfg.merge_from_dict({
        "MODEL": {"SPEC": {
            "EMBED_DIM": 32,
            "VISION": {"MODEL": "vit", "PATCH_SIZE": 16, "WIDTH": 64,
                        "LAYERS": 2},
            "TEXT": {"TOKENIZER": "clip", "STYLE": "clip",
                      "CONTEXT_LENGTH": 77, "VOCAB_SIZE": 49408,
                      "WIDTH": 64, "HEADS": 1, "LAYERS": 2},
        }},
        "DATASET": {"DATASET": "folder-pets", "ROOT": str(tmp_path),
                     "TEST_SET": "imgs"},
        "TRAIN": {"IMAGE_SIZE": [32, 32]},
        "TEST": {"IMAGE_SIZE": [32, 32], "BATCH_SIZE_PER_GPU": 8,
                  "METRIC": "accuracy"},
        "WORKERS": 1,
    })

    # 'folder-pets' has no curated prompt set -> resolve_prompts falls
    # back to the dataset's own classnames (cat/dog) under the imagenet
    # template ensemble
    v_u8, stats_u8 = run_zero_shot(cfg, dataset=ds_u8)
    v_pil, stats_pil = run_zero_shot(cfg, dataset=ds_pil)
    assert stats_u8["n_images"] == stats_pil["n_images"] == 8
    assert v_u8 == v_pil


def test_extract_features_sharded_matches_direct():
    """The local-device batch sharding in the feature loop
    (eval/device.py — batches split over the 8-device mesh) must be a
    pure placement change: features equal a direct unsharded forward of
    the same images."""
    from msclip_tpu.data.datasets import SyntheticImageDataset
    from msclip_tpu.eval.linear_probe import extract_features
    from msclip_tpu.models import MSClipModel, MSClipSpec

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=128, context_length=16,
    )
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    ds = SyntheticImageDataset(n=12, size=32, n_classes=3)

    feats, labels = extract_features(model, params, ds, batch_size=2,
                                     workers=1)
    assert feats.shape == (12, 16)

    images = np.stack([ds[i][0] for i in range(12)]).astype(np.float32)
    want = np.asarray(model.encode_image(params, jnp.asarray(images)))
    np.testing.assert_allclose(feats, want, atol=1e-5)  # loader keeps order
    np.testing.assert_array_equal(labels, [ds[i][1] for i in range(12)])


def test_extract_features_uint8_boundary_matches_pil(tmp_path):
    """Feature extraction must apply the in-graph normalize for
    uint8-boundary (native-decode) datasets — regression for the bug
    where only run_zero_shot checked ``emits_uint8`` and the linear
    probe / retrieval / finetune towers saw raw 0-255 pixels."""
    from msclip_tpu.eval.linear_probe import extract_features
    from msclip_tpu.models import MSClipModel, MSClipSpec

    ds_u8, ds_pil = _uint8_pil_dataset_pair(tmp_path, seed=1,
                                            img_hw=(40, 56), n_per_class=3)

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=128, context_length=16,
    )
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))

    f_u8, y_u8 = extract_features(model, params, ds_u8, batch_size=2,
                                  workers=1)
    f_pil, y_pil = extract_features(model, params, ds_pil, batch_size=2,
                                    workers=1)
    np.testing.assert_array_equal(y_u8, y_pil)
    # PNG inputs: the uint8 crop + in-graph normalize is bit-compatible
    # with host-side fp32 normalize, so features agree to fp tolerance
    np.testing.assert_allclose(f_u8, f_pil, atol=1e-5)


def test_dataset_normalizer_custom_stats():
    """dataset_normalizer must honor the DATASET's ctor stats, not a
    global default — a uint8 dataset built with custom mean/std
    normalizes identically to its own fp32 path."""
    from msclip_tpu.data.transforms import dataset_normalizer

    class _U8:
        emits_uint8 = True
        mean = (0.3, 0.4, 0.5)
        std = (0.1, 0.2, 0.3)

    x = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    got = np.asarray(dataset_normalizer(_U8())(jnp.asarray(x)))
    want = ((x.astype(np.float32) / 255.0 - np.asarray(_U8.mean, np.float32))
            / np.asarray(_U8.std, np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    class _F32:
        emits_uint8 = False

    xf = np.ones((2, 3), np.float32)
    assert dataset_normalizer(_F32())(xf) is xf  # identity passthrough


def test_recall_at_k():
    from msclip_tpu.eval.retrieval import recall_at_k

    sim = np.array([
        [0.9, 0.1, 0.0],   # gt 0 -> rank 0
        [0.2, 0.1, 0.8],   # gt 1 -> rank 2
    ])
    r = recall_at_k(sim, np.array([0, 1]), ks=(1, 2, 3))
    assert r[1] == 50.0
    assert r[3] == 100.0


def test_run_retrieval_identity():
    """With captions whose embeddings equal their image's, retrieval must
    be perfect; sanity on the plumbing with a tiny random model."""
    from msclip_tpu.data.datasets import SyntheticImageDataset
    from msclip_tpu.eval.retrieval import run_retrieval
    from msclip_tpu.models import MSClipModel, MSClipSpec

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=49408,
    )
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    ds = SyntheticImageDataset(n=6, size=32, n_classes=3)
    captions = [f"an image number {i}" for i in range(12)]
    cap2img = [i // 2 for i in range(12)]
    out = run_retrieval(model, params, ds, captions, cap2img,
                        batch_size=4, workers=2)
    for d in (out["i2t"], out["t2i"]):
        assert set(d) == {1, 5, 10}
        assert all(0.0 <= v <= 100.0 for v in d.values())

    # tiny corpus << one dispatch batch: the token pad must come from
    # row repetition (the [:pad] slice under-padded when pad > corpus,
    # breaking the local-device batch split)
    out2 = run_retrieval(model, params, SyntheticImageDataset(
        n=2, size=32, n_classes=2), ["a", "b"], [0, 1],
        batch_size=8, workers=1)
    assert set(out2["i2t"]) == {1, 5, 10}


def test_linear_probe_c_sweep():
    """CLIP-protocol C sweep: on nearly-separable features where heavy
    regularization hurts, the sweep must find a C that matches or beats
    the tiny fixed C and the reported accuracy must be the full-train
    refit score."""
    from msclip_tpu.eval.linear_probe import fit_linear_probe_sklearn

    rng = np.random.default_rng(0)
    n, d = 240, 8
    centers = rng.standard_normal((3, d)) * 3.0
    y = rng.integers(0, 3, n)
    x = centers[y] + rng.standard_normal((n, d))
    xt = centers[y[:60]] + rng.standard_normal((60, d))

    acc_tiny_c = fit_linear_probe_sklearn(x, y, xt, y[:60], C=1e-6)
    acc_sweep = fit_linear_probe_sklearn(x, y, xt, y[:60], sweep_c=True)
    assert acc_sweep >= acc_tiny_c - 1e-9
    assert 0.0 <= acc_sweep <= 100.0


def test_make_dataset_image_set_routing(tmp_path):
    """make_dataset(image_set=...) routes every branch to the right
    split: ImageFolder TRAIN_SET/TEST_SET dirs, hatefulmemes test->val
    mapping, synthetic disjoint seeds, probe-registry forwarding."""
    from PIL import Image

    from msclip_tpu.config import get_default_config
    from msclip_tpu.eval.zero_shot import make_dataset

    cfg = get_default_config()
    cfg.TEST.IMAGE_SIZE = [32, 32]
    cfg.TRAIN.IMAGE_SIZE = [32, 32]

    # ImageFolder: distinct TRAIN_SET/TEST_SET subdirs
    rng = np.random.default_rng(0)
    for split, n in (("tr", 3), ("va", 2)):
        d = tmp_path / "folder" / split / "classA"
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                (rng.random((32, 32, 3)) * 255).astype(np.uint8)
            ).save(d / f"{i}.jpg")
    cfg.DATASET.DATASET = "imagefolder"
    cfg.DATASET.ROOT = str(tmp_path / "folder")
    cfg.DATASET.TRAIN_SET = "tr"
    cfg.DATASET.TEST_SET = "va"
    assert len(make_dataset(cfg, image_set="train")) == 3
    assert len(make_dataset(cfg, image_set="test")) == 2

    # synthetic: train/test draw disjoint seeds, test keeps seed 0
    cfg.DATASET.DATASET = "synthetic"
    ds_tr = make_dataset(cfg, image_set="train")
    ds_te = make_dataset(cfg, image_set="test")
    assert ds_te._rng_seed == 0 and ds_tr._rng_seed == 10_000

    # probe registry: image_set forwarded (eurosat hash split)
    for cls in ("Forest", "River"):
        d = tmp_path / "es" / "2750" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.fromarray(
                (rng.random((32, 32, 3)) * 255).astype(np.uint8)
            ).save(d / f"{cls}_{i}.jpg")
    cfg.DATASET.DATASET = "eurosat"
    cfg.DATASET.ROOT = str(tmp_path / "es")
    n_tr = len(make_dataset(cfg, image_set="train"))
    n_te = len(make_dataset(cfg, image_set="test"))
    assert n_tr + n_te == 20 and n_tr > 0 and n_te > 0

    # hatefulmemes: 'test' maps to the labeled dev split (val)
    import json as _json

    root = tmp_path / "hm"
    (root / "img").mkdir(parents=True)
    for split, fname, n in (("train", "train.jsonl", 2),
                            ("val", "dev_seen.jsonl", 1)):
        recs = []
        for i in range(n):
            img = f"img/{split}_{i}.png"
            Image.fromarray(
                (rng.random((20, 20, 3)) * 255).astype(np.uint8)
            ).save(root / img)
            recs.append({"img": img, "text": "t", "label": i % 2})
        (root / fname).write_text(
            "\n".join(_json.dumps(r) for r in recs))
    cfg.DATASET.DATASET = "hatefulmemes"
    cfg.DATASET.ROOT = str(root)
    assert len(make_dataset(cfg, image_set="train")) == 2
    assert len(make_dataset(cfg, image_set="test")) == 1


def test_resolve_prompts_fallback_and_placeholder_guard():
    """Classname fallback: curated prompt sets win; datasets exposing
    real classnames fall back to them under the imagenet templates;
    numeric placeholder classnames (loaders synthesizing ["0", "1", ...]
    when label files are absent) must FAIL loudly instead of producing a
    plausible-looking near-chance accuracy."""
    from msclip_tpu.data import get_classnames, get_templates
    from msclip_tpu.eval.zero_shot import resolve_prompts

    class DS:
        def __init__(self, classes):
            self.classes = classes

    # curated set: dataset classes ignored
    names, templates = resolve_prompts("imagenet", DS(["x"]))
    assert names == get_classnames("imagenet")

    # fallback: dataset classnames + imagenet templates, '_' -> ' '
    names, templates = resolve_prompts("nosuchset", DS(["water_lily", "cat"]))
    assert names == ["water lily", "cat"]
    assert templates == get_templates("imagenet")

    # numeric placeholders: loud failure
    with pytest.raises(ValueError, match="placeholder"):
        resolve_prompts("nosuchset", DS([str(i) for i in range(5)]))
    # no classes at all: the original lookup error propagates
    with pytest.raises(ValueError):
        resolve_prompts("nosuchset", DS([]))
