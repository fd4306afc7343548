"""Headline benchmark: zero-shot eval image throughput per chip.

Measures jit-compiled MS-CLIP-S ViT-B/32 ``encode_image`` + classifier
matmul throughput (bf16 compute, fp32 params) on the available device —
the hot loop of the reference's eval pipeline (SURVEY.md §3.2 hot loop #2).
Baseline target (BASELINE.md): >=10,000 images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_IMG_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.models import MSClipModel, spec_from_config

    root = os.path.dirname(os.path.abspath(__file__))
    cfg = get_default_config()
    model_yaml = os.environ.get("BENCH_MODEL", "b32-yfcc-msclips")
    update_config(
        cfg, os.path.join(root, f"experiments/model/{model_yaml}.yaml")
    )
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    # fused Pallas attention core is the default (BENCH_PALLAS=0 disables)
    if os.environ.get("BENCH_PALLAS", "1") != "0":
        cfg.TPU.USE_PALLAS = True
    cfg.TPU.CONV_LAYOUT = os.environ.get("BENCH_CONV_LAYOUT", "NHWC")
    if os.environ.get("BENCH_FUSED_BLOCK", "0") != "0":
        cfg.TPU.USE_FUSED_BLOCK = True
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_FOLD_BN", "1") != "0":
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, spec)

    # 32 chained iterations amortize the dispatch round-trip (~28 ms over
    # remote tunnels) to <1 ms/iter, measuring steady-state throughput —
    # production eval pipelines the host loop (double-buffered feeds), so
    # per-dispatch latency is not a per-batch cost.
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    n_iters = int(os.environ.get("BENCH_ITERS", "32"))
    n_classes = 1000

    classifier = jax.random.normal(
        jax.random.PRNGKey(1), (spec.embed_dim, n_classes), jnp.bfloat16
    )

    from msclip_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    @jax.jit
    def eval_many(params, classifier, key):
        """n_iters eval batches chained in ONE dispatch (lax.scan), so the
        host<->device round-trip (tens of ms over remote tunnels) is paid
        once, not per batch. Returns one scalar; fetching it is the
        completion barrier (block_until_ready is unreliable over tunnels).

        Input arrives as uint8 and is normalized on device — the
        production pipeline (host decodes JPEGs to uint8, device does
        /255-mean-std; BASELINE.json north star), so the per-batch HBM
        input traffic matches deployment (38.5 MB of uint8, not a 154 MB
        fp32 copy).
        """

        base = jax.random.randint(
            key, (batch, 224, 224, 3), 0, 256, jnp.uint8
        )
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        def body(carry, i):
            # cheap per-step perturbation defeats CSE without adding
            # measurable work
            images_u8 = base + i.astype(jnp.uint8)
            images = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
            feats = model.encode_image(params, images)
            logits = 100.0 * feats @ classifier.astype(feats.dtype)
            top1 = jnp.argmax(logits, axis=-1).astype(jnp.int32).sum()
            return carry + top1, None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), jnp.arange(n_iters)
        )
        return total

    key = jax.random.PRNGKey(2)
    int(eval_many(params, classifier, key))  # compile + warmup

    times = []
    for t in range(3):
        t0 = time.perf_counter()
        int(eval_many(params, classifier, jax.random.PRNGKey(t)))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    n_chips = jax.local_device_count()
    ips = batch * n_iters / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": (
                    f"zero-shot eval throughput, MS-CLIP-S {model_yaml} "
                    "@224 bf16 (uint8 in, device normalize, "
                    "encode_image + 1k-class logits)"
                ),
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
