"""Segment-level TPU profile of the MS-CLIP-S eval forward.

Times each stage of ``encode_image`` (stem, parallel branch, lateral
adapters, trunk blocks, head) separately with the scan-amortized
methodology from bench.py (one dispatch, K chained iterations, scalar
fetch as the barrier — the tunnel's ~28 ms RTT would otherwise swamp
per-segment numbers).

Usage: python experiments/profile_segments.py [B] [K]
Env: PROF_PALLAS=0, PROF_CONV_LAYOUT, PROF_FOLD_BN=0, PROF_MODEL
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.models import MSClipModel, spec_from_config
from msclip_tpu.models import layers as L
from msclip_tpu.models import stem as S
from msclip_tpu.models.msclip import _block_fn
from msclip_tpu.models.stem import BNState


def timed(fn, *args, iters=3):
    """Scan-chained fn; returns best wall seconds for ONE inner step."""
    out = fn(*args)
    float(out)  # compile + warmup barrier
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_config()
    model_yaml = os.environ.get("PROF_MODEL", "b32-yfcc-msclips")
    update_config(cfg, os.path.join(root, f"experiments/model/{model_yaml}.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS = os.environ.get("PROF_PALLAS", "1") != "0"
    cfg.TPU.CONV_LAYOUT = os.environ.get("PROF_CONV_LAYOUT", "NHWC")
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    if os.environ.get("PROF_FOLD_BN", "1") != "0":
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, spec)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = spec.conv_layout
    g = spec.grid
    W = spec.vision_width

    def scan_loop(body, init_x):
        def run(params):
            def step(carry, i):
                x = init_x + i.astype(init_x.dtype) * 1e-6
                return carry + body(params, x), None

            total, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jnp.arange(K)
            )
            return total

        return jax.jit(run)

    images = jax.random.normal(
        jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16
    )
    img_conv = images.transpose(0, 3, 1, 2) if lo == "NCHW" else images

    # -- full encode_image ---------------------------------------------------
    full = scan_loop(
        lambda p, x: model.encode_image(p, x).astype(jnp.float32).sum(),
        images,
    )

    # -- stem only -------------------------------------------------------
    def stem_body(p, x):
        bn = BNState(training=False, layout=lo)
        fmap = S.apply_earlyconv_res(
            p["visual"]["stem"], x, spec.early_conv_strides, bn,
            first_conv_k=spec.early_conv_first_k,
        )
        return fmap.astype(jnp.float32).sum()

    stem_fn = scan_loop(stem_body, img_conv)

    # -- parallel branch only (all 5 stages chained) -------------------------
    def branch_body(p, x):
        bn = BNState(training=False, layout=lo)
        out = x
        acc = jnp.zeros((), jnp.float32)
        for li in range(len(spec.lateral_layers)):
            out = S.apply_parallel_stage(
                p["visual"]["parallel_stages"][li], out,
                spec.parallel_kernels[li], spec.parallel_strides[li],
                spec.parallel_paddings[li], bn, "x",
            )
            acc = acc + out.astype(jnp.float32).sum() * 0
        return acc + out.astype(jnp.float32).sum()

    branch_fn = scan_loop(branch_body, img_conv)

    # -- adapters only (fixed-size inputs per stage) --------------------------
    def adapters_body(p, tokens):
        bn = BNState(training=False, layout=lo)
        acc = jnp.zeros((), jnp.float32)
        out_dims = [W // 16, W // 8, W // 4, W // 2, W]
        sizes = [112, 56, 28, 14, g]
        if spec.parallel_strides[-1] == 1:
            sizes = [112, 56, 28, 14, 14]
        for li in range(len(spec.lateral_layers)):
            hw = sizes[li]
            shape = ((B, out_dims[li], hw, hw) if lo == "NCHW"
                     else (B, hw, hw, out_dims[li]))
            top = jnp.full(shape, 0.1, jnp.bfloat16) + tokens[0, 0, 0] * 0
            _, fused = S.apply_lateral_adapter(
                p["visual"]["lateral_adapters"][li], top, tokens, (g, g),
                spec.t2b_kernels[li], spec.t2b_strides[li],
                spec.t2b_paddings[li], bn, "x",
                use_cls=spec.t2b_use_cls, eps=spec.ln_eps,
                top_layout=lo,
            )
            acc = acc + fused.astype(jnp.float32).sum()
        return acc

    tokens0 = jax.random.normal(
        jax.random.PRNGKey(2), (B, g * g + 1, W), jnp.bfloat16
    )
    adapters_fn = scan_loop(adapters_body, tokens0)

    # -- trunk blocks only ----------------------------------------------------
    def trunk_body(p, tokens):
        block = _block_fn(spec)
        x = tokens
        for i in range(spec.n_trunk_blocks):
            x = block(p["visual"]["blocks"][i], x, spec.vision_heads, None)
        return x.astype(jnp.float32).sum()

    trunk_fn = scan_loop(trunk_body, tokens0)

    # -- one block ------------------------------------------------------------
    def block1_body(p, tokens):
        block = _block_fn(spec)
        x = block(p["visual"]["blocks"][0], tokens, spec.vision_heads, None)
        return x.astype(jnp.float32).sum()

    block1_fn = scan_loop(block1_body, tokens0)

    # health check
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    print(f"# health: tiny dispatch {time.perf_counter() - t0:.3f}s", flush=True)

    results = {}
    for name, fn in [
        ("full_encode_image", full),
        ("stem", stem_fn),
        ("parallel_branch", branch_fn),
        ("adapters", adapters_fn),
        ("trunk_blocks", trunk_fn),
        ("one_block", block1_fn),
    ]:
        t = timed(fn, params)
        per_iter_ms = (t / K) * 1e3
        results[name] = per_iter_ms
        print(f"{name:20s} {per_iter_ms:8.2f} ms/iter  "
              f"({B / (t / K):,.0f} img/s)", flush=True)

    acc = (results["stem"] + results["parallel_branch"]
           + results["adapters"] + results["trunk_blocks"])
    print(f"# segments sum = {acc:.2f} ms vs full {results['full_encode_image']:.2f} ms")


if __name__ == "__main__":
    main()
