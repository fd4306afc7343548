"""Serving subsystem tests: AOT bundle export/load round trip, bucket
padding equivalence, host-preprocess parity, the dynamic batcher, and the
HTTP server end to end (in-process + CLI subprocess)."""

import io
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    pil_eval_transform,
)
from msclip_tpu.models import MSClipModel
from msclip_tpu.serve import (
    DynamicBatcher,
    export_bundle,
    load_bundle,
    pil_to_uint8,
)

from test_train import tiny_msclips_spec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZE = 32  # tiny_msclips_spec image_resolution


@pytest.fixture(scope="module")
def tiny_model():
    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def bundle(tiny_model, tmp_path_factory):
    model, params = tiny_model
    out = tmp_path_factory.mktemp("bundle")
    rng = np.random.default_rng(0)
    classifier = rng.standard_normal((model.spec.embed_dim, 7)).astype(
        np.float32
    )
    classifier /= np.linalg.norm(classifier, axis=0, keepdims=True)
    export_bundle(
        model, params, str(out),
        buckets=(2, 4), image_size=SIZE,
        classifier=classifier,
        classnames=[f"class {i}" for i in range(7)],
    )
    return str(out)


def _expected_image_feats(model, params, images_u8):
    x = images_u8.astype(np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    return np.asarray(model.encode_image(params, jnp.asarray(x)))


def test_export_load_roundtrip(tiny_model, bundle):
    """Deserialized AOT graphs reproduce the live model exactly, for both
    towers, through the npz param round trip."""
    model, params = tiny_model
    served = load_bundle(bundle)
    assert served.buckets == [2, 4]
    assert served.embed_dim == model.spec.embed_dim

    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8)
    got = served.encode_image(images)
    want = _expected_image_feats(model, params, images)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    tokens = rng.integers(
        1, model.spec.vocab_size, (2, model.spec.context_length)
    ).astype(np.int32)
    got_t = served.encode_text(tokens)
    want_t = np.asarray(model.encode_text(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got_t, want_t, atol=1e-5, rtol=1e-5)


def test_bucket_padding_equivalence(tiny_model, bundle):
    """N=3 with buckets [2,4] (chunk of 2 + padded remainder) and N=7
    (4 + pad(3->4)) must equal the per-sample results — padding rows never
    leak into real outputs."""
    model, params = tiny_model
    served = load_bundle(bundle)
    rng = np.random.default_rng(2)
    for n in (1, 3, 7):
        images = rng.integers(0, 256, (n, SIZE, SIZE, 3), dtype=np.uint8)
        got = served.encode_image(images)
        assert got.shape == (n, model.spec.embed_dim)
        want = _expected_image_feats(model, params, images)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pil_to_uint8_matches_eval_transform():
    """Host uint8 crop + in-graph normalize == pil_eval_transform: the
    served preprocessing is bit-compatible with the eval parity path."""
    from PIL import Image

    rng = np.random.default_rng(3)
    img = Image.fromarray(
        rng.integers(0, 256, (50, 41, 3), dtype=np.uint8)
    )
    crop = pil_to_uint8(img, size=SIZE)
    assert crop.shape == (SIZE, SIZE, 3) and crop.dtype == np.uint8
    renorm = (crop.astype(np.float32) / 255.0
              - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    want = pil_eval_transform(img, size=SIZE)
    np.testing.assert_allclose(renorm, want, atol=1e-6)


def test_decode_image_rejects_bad_npy_shapes():
    """Malformed npy uploads must fail at decode (-> a 400 for that one
    client), BEFORE reaching the batcher — np.stack over mixed shapes
    there would poison every concurrent request coalesced into the same
    batch."""
    import io as _io

    import pytest

    from msclip_tpu.serve.server import _decode_image

    def npy_bytes(arr):
        buf = _io.BytesIO()
        np.save(buf, arr)
        return buf.getvalue()

    ok = _decode_image(
        npy_bytes(np.zeros((SIZE, SIZE, 3), np.uint8)), "npy", SIZE
    )
    assert ok.shape == (SIZE, SIZE, 3)
    for bad in [np.zeros((SIZE, SIZE, 4), np.uint8),   # RGBA fast path
                np.zeros((SIZE, SIZE, 1), np.uint8),   # grayscale
                np.zeros((SIZE, SIZE), np.uint8),      # 2-D
                np.zeros((SIZE, SIZE, 3), np.float32)]:
        with pytest.raises(ValueError):
            _decode_image(npy_bytes(bad), "npy", SIZE)


def test_dynamic_batcher_coalesces_and_routes():
    calls = []

    def fn(batch):
        calls.append(batch.shape[0])
        time.sleep(0.02)  # let concurrent submitters queue up
        return batch.sum(axis=1, keepdims=True)

    b = DynamicBatcher(fn, max_batch=8, max_wait_ms=100.0)
    try:
        samples = [np.full((3,), i, np.float32) for i in range(16)]
        futs = [b.submit(s) for s in samples]
        results = [f.result(timeout=10) for f in futs]
        for i, r in enumerate(results):
            assert r.shape == (1,) and r[0] == 3.0 * i
        stats = b.stats
        assert stats["requests"] == 16 and stats["samples"] == 16
        # 16 quick submissions against a 100ms window: far fewer device
        # calls than requests (deterministically <= 8; typically 2-3)
        assert stats["batches"] <= 8
        assert stats["batches"] == len(calls)
    finally:
        b.close()


def test_dynamic_batcher_propagates_errors():
    def fn(batch):
        raise RuntimeError("device exploded")

    b = DynamicBatcher(fn, max_batch=4, max_wait_ms=1.0)
    try:
        fut = b.submit(np.zeros((2,), np.float32))
        with pytest.raises(RuntimeError, match="device exploded"):
            fut.result(timeout=10)
        # the batcher thread survives a failed batch
        fut2 = b.submit(np.zeros((2,), np.float32))
        with pytest.raises(RuntimeError):
            fut2.result(timeout=10)
    finally:
        b.close()


def _post(url, body, content_type):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_server_end_to_end(bundle):
    """healthz/stats + image/text/classify endpoints against the loaded
    bundle; the image embedding must match a direct ServingModel call on
    the identically-decoded JPEG."""
    from PIL import Image

    from msclip_tpu.serve.server import InferenceServer

    served = load_bundle(bundle)
    server = InferenceServer(served, port=0, max_wait_ms=2.0).start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["has_classifier"]

        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        jpeg = buf.getvalue()

        out = _post(base + "/v1/embed/image", jpeg, "image/jpeg")
        got = np.asarray(out["embedding"], np.float32)
        crop = pil_to_uint8(Image.open(io.BytesIO(jpeg)), size=SIZE)
        want = served.encode_image(crop[None])[0]
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

        # concurrent image requests: all correct, batcher coalesced
        results = [None] * 6

        def hit(i):
            results[i] = _post(base + "/v1/embed/image", jpeg, "image/jpeg")

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        for r in results:
            np.testing.assert_allclose(
                np.asarray(r["embedding"], np.float32), want,
                atol=1e-4, rtol=1e-4,
            )

        out_t = _post(
            base + "/v1/embed/text",
            json.dumps({"texts": ["a photo of a cat", "a dog"]}).encode(),
            "application/json",
        )
        want_t = served.encode_text(["a photo of a cat", "a dog"])
        np.testing.assert_allclose(
            np.asarray(out_t["embeddings"], np.float32), want_t,
            atol=1e-4, rtol=1e-4,
        )

        cls = _post(base + "/v1/classify?topk=3", jpeg, "image/jpeg")
        assert len(cls["topk"]) == 3
        logits = 100.0 * want @ served.classifier
        assert cls["topk"][0]["index"] == int(np.argmax(logits))
        assert cls["topk"][0]["label"].startswith("class ")

        # /v1/rank: caller-supplied candidate texts, cosine convention
        import base64

        texts = ["a photo of a cat", "a photo of a dog", "a red square"]
        rank = _post(
            base + "/v1/rank",
            json.dumps({"texts": texts,
                        "image": base64.b64encode(jpeg).decode(),
                        "content_type": "image/jpeg"}).encode(),
            "application/json",
        )
        rows = rank["ranking"]
        assert [r["text"] for r in rows[:1]][0] in texts
        assert len(rows) == 3
        img_n = want / np.linalg.norm(want)
        t_emb = served.encode_text(texts)
        t_emb = t_emb / np.linalg.norm(t_emb, axis=-1, keepdims=True)
        want_logits = 100.0 * t_emb @ img_n
        got_order = [r["index"] for r in rows]
        assert got_order == list(np.argsort(want_logits)[::-1])
        np.testing.assert_allclose(
            sorted((r["logit"] for r in rows), reverse=True),
            np.sort(want_logits)[::-1], atol=1e-3, rtol=1e-3,
        )
        assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-5

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["image"]["requests"] >= 7
    finally:
        server.close()


def test_serving_cli_end_to_end(tmp_path):
    """tools/export_serving.py then tools/serve.py as real subprocesses:
    export a tiny random-init bundle with a baked classifier, start the
    server, and round-trip one image through /v1/classify."""
    env = dict(os.environ)
    env["MSCLIP_PLATFORM"] = "cpu"
    bundle_dir = str(tmp_path / "bundle")
    tiny = [
        "TRAIN.IMAGE_SIZE", "[64,64]", "TEST.IMAGE_SIZE", "[64,64]",
        "MODEL.SPEC.VISION.WIDTH", "128", "MODEL.SPEC.VISION.LAYERS", "2",
        "MODEL.SPEC.VISION.PATCH_SIZE", "32",
        "MODEL.SPEC.TEXT.WIDTH", "128", "MODEL.SPEC.TEXT.HEADS", "2",
        "MODEL.SPEC.TEXT.LAYERS", "2", "MODEL.SPEC.EMBED_DIM", "32",
    ]
    r = subprocess.run(
        [sys.executable, "tools/export_serving.py",
         "--model", "experiments/model/b32.yaml",
         "--out", bundle_dir, "--buckets", "1,2",
         "--classify-prompts", "voc2007classification"] + tiny,
        cwd=REPO, capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EXPORTED" in r.stdout
    assert os.path.exists(os.path.join(bundle_dir, "MANIFEST.json"))

    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--bundle", bundle_dir,
         "--port", "0"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env,
    )
    try:
        base = None
        deadline = time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if line.startswith("SERVING "):
                base = line.split()[1].strip()
                break
        assert base, "server never announced its address"

        from PIL import Image

        rng = np.random.default_rng(5)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        out = _post(base + "/v1/classify", buf.getvalue(), "image/jpeg")
        assert len(out["topk"]) == 5
        assert all("label" in t and "prob" in t for t in out["topk"])
        probs = [t["prob"] for t in out["topk"]]
        assert probs == sorted(probs, reverse=True)
    finally:
        proc.terminate()
        proc.wait(30)


def test_live_serving_multichip(tiny_model):
    """Live mode on the 8-device CPU mesh: buckets round up to device
    multiples, outputs equal the unsharded model, and the per-bucket
    callables really shard the batch axis across all devices."""
    from msclip_tpu.serve import live_serving_model

    model, params = tiny_model
    n_dev = jax.local_device_count()
    assert n_dev == 8  # conftest forces the 8-device CPU mesh

    served = live_serving_model(model, params, buckets=(2, 12),
                                image_size=SIZE)
    assert served.buckets == [8, 16]
    assert served.manifest["devices"] == n_dev

    rng = np.random.default_rng(6)
    images = rng.integers(0, 256, (5, SIZE, SIZE, 3), dtype=np.uint8)
    got = served.encode_image(images)
    want = _expected_image_feats(model, params, images)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    tokens = rng.integers(
        1, model.spec.vocab_size, (3, model.spec.context_length)
    ).astype(np.int32)
    got_t = served.encode_text(tokens)
    want_t = np.asarray(model.encode_text(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got_t, want_t, atol=1e-5, rtol=1e-5)

    # the bucket callable's result is genuinely sharded over the mesh
    out = served._image_fns[8](
        served._params,
        jnp.zeros((8, SIZE, SIZE, 3), jnp.uint8),
    )
    assert len(out.sharding.device_set) == n_dev


def test_live_serving_http(tiny_model):
    """The HTTP server runs unchanged on a live (mesh-sharded) model."""
    from msclip_tpu.serve import live_serving_model
    from msclip_tpu.serve.server import InferenceServer

    model, params = tiny_model
    rng = np.random.default_rng(7)
    classifier = rng.standard_normal(
        (model.spec.embed_dim, 3)
    ).astype(np.float32)
    served = live_serving_model(
        model, params, buckets=(8,), image_size=SIZE,
        classifier=classifier, classnames=["a", "b", "c"],
    )
    server = InferenceServer(served, port=0, max_wait_ms=2.0).start()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        arr = rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, arr)
        out = _post(base + "/v1/embed/image", buf.getvalue(),
                    "application/npy")
        got = np.asarray(out["embedding"], np.float32)
        want = served.encode_image(arr[None])[0]
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

        cls = _post(base + "/v1/classify?topk=2", buf.getvalue(),
                    "application/npy")
        logits = 100.0 * want @ classifier
        assert cls["topk"][0]["index"] == int(np.argmax(logits))
    finally:
        server.close()


def test_live_serving_cli(tmp_path):
    """tools/serve.py --model (live mode) as a real subprocess on a
    forced 8-device CPU host: buckets announce as device multiples and
    one text embedding round-trips."""
    env = dict(os.environ)
    env["MSCLIP_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    tiny = [
        "TRAIN.IMAGE_SIZE", "[64,64]", "TEST.IMAGE_SIZE", "[64,64]",
        "MODEL.SPEC.VISION.WIDTH", "128", "MODEL.SPEC.VISION.LAYERS", "2",
        "MODEL.SPEC.VISION.PATCH_SIZE", "32",
        "MODEL.SPEC.TEXT.WIDTH", "128", "MODEL.SPEC.TEXT.HEADS", "2",
        "MODEL.SPEC.TEXT.LAYERS", "2", "MODEL.SPEC.EMBED_DIM", "32",
    ]
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--model",
         "experiments/model/b32.yaml", "--port", "0",
         "--buckets", "1"] + tiny,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env,
    )
    try:
        base = None
        deadline = time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if line.startswith("SERVING "):
                base = line.split()[1].strip()
                break
        assert base, "live server never announced its address"

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["buckets"] == [8]  # 1 rounded up to the 8 devices

        out = _post(
            base + "/v1/embed/text",
            json.dumps({"text": "a photo of a dog"}).encode(),
            "application/json",
        )
        emb = np.asarray(out["embeddings"], np.float32)
        assert emb.shape == (1, 32) and np.isfinite(emb).all()
    finally:
        proc.terminate()
        proc.wait(30)


def test_concurrent_burst_no_resets(tiny_model):
    """A burst of simultaneous connections must not be RST'd: socket-
    server's default listen backlog is 5, so 24+ concurrent clients
    overflowed the accept queue and saw ConnectionResetError with
    nothing in the server log (observed live on TPU, r4). _Httpd deepens
    the backlog; this drives 2x192 requests at 24-way concurrency and
    also proves the dynamic batcher coalesces them (mean batch > 1)."""
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from msclip_tpu.serve import live_serving_model
    from msclip_tpu.serve.server import InferenceServer

    model, params = tiny_model
    served = live_serving_model(model, params, buckets=(8,),
                                image_size=SIZE)
    server = InferenceServer(served, port=0, max_wait_ms=2.0).start()
    host, port = server.address
    url = f"http://{host}:{port}/v1/embed/image"
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.save(buf, arr)
    body = buf.getvalue()

    def one(_):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/npy"}
        )
        urllib.request.urlopen(req, timeout=60).read()
        return 1

    try:
        for _ in range(2):
            with ThreadPoolExecutor(24) as ex:
                assert sum(ex.map(one, range(192))) == 192
        stats = server._stats()["image"]
        assert stats["requests"] == 384
        assert stats["mean_batch"] > 1.0, stats
    finally:
        server.close()
