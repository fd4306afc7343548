"""Fine-grained TPU profile: per-stage branch/stem conv costs and the
trunk's GEMM vs attention-core split. Same scan-amortized methodology as
profile_segments.py (K chained iters per dispatch; numbers include
~28ms/K of tunnel RTT)."""

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
from msclip_tpu.models.stem import BNState

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
RTT_MS = 28.0 / K  # subtracted per-iter estimate


def scan_timed(name, body, init_x, params, iters=3):
    @jax.jit
    def run(params, init_x):
        def step(carry, i):
            x = init_x + i.astype(init_x.dtype) * 1e-6
            return carry + body(params, x), None

        total, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                jnp.arange(K))
        return total

    init_x = jax.device_put(init_x)
    float(run(params, init_x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(params, init_x))
        times.append(time.perf_counter() - t0)
    ms = min(times) / K * 1e3 - RTT_MS
    print(f"{name:26s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_config()
    update_config(cfg, os.path.join(root, "experiments/model/b32-yfcc-msclips.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS = os.environ.get("PROF_PALLAS", "1") != "0"
    lo = os.environ.get("PROF_CONV_LAYOUT", "NHWC")
    cfg.TPU.CONV_LAYOUT = lo
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    from msclip_tpu.models.folding import fold_params_for_eval

    params = fold_params_for_eval(params, spec)
    W = spec.vision_width

    float(jnp.ones((8, 8)).sum())  # health

    # per-stage parallel branch
    in_dims = [3, W // 16, W // 8, W // 4, W // 2]
    sizes_in = [224, 112, 56, 28, 14]
    for li in range(5):
        shape = ((B, in_dims[li], sizes_in[li], sizes_in[li]) if lo == "NCHW"
                 else (B, sizes_in[li], sizes_in[li], in_dims[li]))
        x0 = jax.random.normal(jax.random.PRNGKey(li), shape, jnp.bfloat16)

        def body(p, x, li=li):
            bn = BNState(training=False, layout=lo)
            out = S.apply_parallel_stage(
                p["visual"]["parallel_stages"][li], x,
                spec.parallel_kernels[li], spec.parallel_strides[li],
                spec.parallel_paddings[li], bn, "x")
            return out.astype(jnp.float32).sum()

        scan_timed(f"branch_stage{li} ({sizes_in[li]}px,{in_dims[li]}c)",
                   body, x0, params)

    # stem: first conv alone, then full stem
    img_shape = (B, 3, 224, 224) if lo == "NCHW" else (B, 224, 224, 3)
    img = jax.random.normal(jax.random.PRNGKey(9), img_shape, jnp.bfloat16)

    def stem_conv1(p, x):
        y = L.conv2d(p["visual"]["stem"]["conv1"], x, stride=2, padding=1,
                     layout=lo)
        return y.astype(jnp.float32).sum()

    scan_timed("stem_conv1 (3->48 s2)", stem_conv1, img, params)

    def stem_full(p, x):
        bn = BNState(training=False, layout=lo)
        f = S.apply_earlyconv_res(p["visual"]["stem"], x,
                                  spec.early_conv_strides, bn,
                                  first_conv_k=spec.early_conv_first_k)
        return f.astype(jnp.float32).sum()

    scan_timed("stem_full", stem_full, img, params)

    # trunk: GEMMs-only vs attention-core-only vs full block (x11)
    g = spec.grid
    tokens0 = jax.random.normal(jax.random.PRNGKey(2), (B, g * g + 1, W),
                                jnp.bfloat16)

    def gemms_only(p, x):
        acc = x
        for i in range(spec.n_trunk_blocks):
            blk = p["visual"]["blocks"][i]
            h = L.layer_norm(blk["ln_1"], acc, eps=spec.ln_eps)
            qkv = L.linear({"w": blk["attn"]["qkv_w"],
                            "b": blk["attn"]["qkv_b"]}, h)
            # stand-in for the attention core: slice E columns
            ctx = qkv[..., :W]
            acc = acc + L.linear({"w": blk["attn"]["out_w"],
                                  "b": blk["attn"]["out_b"]}, ctx)
            acc = acc + L.mlp(blk["mlp"],
                              L.layer_norm(blk["ln_2"], acc, eps=spec.ln_eps))
        return acc.astype(jnp.float32).sum()

    scan_timed("trunk_gemms_only (x11)", gemms_only, tokens0, params)

    qkv0 = jax.random.normal(jax.random.PRNGKey(3), (B, g * g + 1, 3 * W),
                             jnp.bfloat16)

    def attn_core_only(p, qkv):
        from msclip_tpu.ops.attention import fused_attention_qkv

        acc = jnp.zeros((), jnp.float32)
        for i in range(spec.n_trunk_blocks):
            out = fused_attention_qkv(qkv + i * 1e-6, spec.vision_heads, None)
            acc = acc + out.astype(jnp.float32).sum()
        return acc

    scan_timed("attn_core_only (x11)", attn_core_only, qkv0, params)

    def full_trunk(p, x):
        from msclip_tpu.models.msclip import _block_fn

        block = _block_fn(spec)
        for i in range(spec.n_trunk_blocks):
            x = block(p["visual"]["blocks"][i], x, spec.vision_heads, None)
        return x.astype(jnp.float32).sum()

    scan_timed("trunk_full (x11)", full_trunk, tokens0, params)


if __name__ == "__main__":
    main()
