"""Serving load test: drive a bundle's HTTP server with concurrent
clients and report throughput, latency percentiles, and the dynamic
batcher's achieved coalescing.

    python experiments/serve_loadtest.py [n_clients] [n_requests] \
        [--model b32-yfcc-msclips] [--buckets 1,8,32] [--wait-ms 5] \
        [--live]   # live multi-chip mode instead of an AOT bundle

Builds a random-init bundle for the given model config in a temp dir
(geometry is what matters for throughput), starts the server in-process,
and fires `n_clients` threads each posting `n_requests` JPEG images.
On the axon tunnel every device dispatch pays ~28 ms RTT, so absolute
latency here is tunnel-dominated; the coalescing ratio (requests per
device batch) is the portable result — it is exactly the factor by which
batching divides per-request device cost.
"""

import io
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): (a.split("=") + ["1"])[1]
            for a in sys.argv[1:] if a.startswith("--")}
    n_clients = int(args[0]) if args else 16
    n_requests = int(args[1]) if len(args) > 1 else 8
    model_yaml = opts.get("model", "b32-yfcc-msclips")
    buckets = [int(b) for b in opts.get("buckets", "1,8,32").split(",")]
    wait_ms = float(opts.get("wait-ms", "5"))

    import jax
    from PIL import Image

    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.models import MSClipModel, spec_from_config
    from msclip_tpu.serve import (
        export_bundle,
        live_serving_model,
        load_bundle,
    )
    from msclip_tpu.serve.server import InferenceServer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_config()
    update_config(cfg, os.path.join(root,
                                    f"experiments/model/{model_yaml}.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if "tiny" in opts:  # smoke mode: shrink geometry, keep the plumbing
        cfg.TRAIN.IMAGE_SIZE = [64, 64]
        cfg.TEST.IMAGE_SIZE = [64, 64]
        for k, v in (("WIDTH", 128), ("LAYERS", 2), ("PATCH_SIZE", 32)):
            setattr(cfg.MODEL.SPEC.VISION, k, v)
        for k, v in (("WIDTH", 128), ("HEADS", 2), ("LAYERS", 2)):
            setattr(cfg.MODEL.SPEC.TEXT, k, v)
        cfg.MODEL.SPEC.EMBED_DIM = 32
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))

    with tempfile.TemporaryDirectory() as td:
        if "live" in opts:
            print(f"=> live model over {jax.local_device_count()} "
                  f"device(s) (buckets {buckets}) ...", file=sys.stderr)
            served = live_serving_model(
                model, params, buckets=buckets,
                image_size=cfg.TEST.IMAGE_SIZE[0],
            )
        else:
            print(f"=> exporting bundle (buckets {buckets}) ...",
                  file=sys.stderr)
            export_bundle(model, params, td, buckets=buckets,
                          image_size=cfg.TEST.IMAGE_SIZE[0])
            served = load_bundle(td)
        size = served.image_size
        for b in served.buckets:  # warm every bucket
            served.encode_image(np.zeros((b, size, size, 3), np.uint8))
        server = InferenceServer(served, port=0, max_wait_ms=wait_ms).start()
        host, port = server.address
        url = f"http://{host}:{port}/v1/embed/image"

        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        ).save(buf, format="JPEG", quality=90)
        jpeg = buf.getvalue()

        import urllib.request

        latencies = []
        lat_lock = threading.Lock()

        def client():
            for _ in range(n_requests):
                t0 = time.perf_counter()
                req = urllib.request.Request(
                    url, data=jpeg, headers={"Content-Type": "image/jpeg"}
                )
                urllib.request.urlopen(req, timeout=120).read()
                dt = time.perf_counter() - t0
                with lat_lock:
                    latencies.append(dt)

        print(f"=> {n_clients} clients x {n_requests} requests ...",
              file=sys.stderr)
        threads = [threading.Thread(target=client)
                   for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        stats = server._image_batcher.stats
        lat = np.asarray(sorted(latencies))
        out = {
            "model": model_yaml,
            "clients": n_clients,
            "requests": int(stats["requests"]),
            "wall_s": round(wall, 2),
            "throughput_rps": round(len(latencies) / wall, 1),
            "mean_batch": round(stats["mean_batch"], 2),
            "device_batches": int(stats["batches"]),
            "p50_ms": round(1000 * lat[len(lat) // 2], 1),
            "p99_ms": round(1000 * lat[int(len(lat) * 0.99)], 1),
            "wait_ms": wait_ms,
            "buckets": served.buckets,
            "live": "live" in opts,
        }
        server.close()
        print(json.dumps(out))


if __name__ == "__main__":
    main()
