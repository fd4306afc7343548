"""Text-tower TPU budget: where do the 29 ms (fwd, B=256) go?

The train-step segment budget (profile_train_segments.py) showed the
text tower costing as much as the image tower (29.3 vs 29.5 ms fwd at
B=256 b32) despite ~0.68x its FLOPs — i.e. the text tower runs at
~0.68x the image tower's efficiency. This script splits text fwd (and
optionally fwd+bwd) into:

  full          encode_text (embed + 12 blocks + pool + proj + norm)
  blocks        12 causal-masked transformer blocks on pre-embedded x
  blocks_nomask the same without the causal mask
  blocks_xla    blocks with the Pallas attention core disabled
  gemms         GEMM skeleton only (qkv/out/mlp GEMMs + QuickGELU,
                no attention core / LN / residual) — the MXU floor

Derived: embed+pool = full - blocks; attn-core+LN = blocks - gemms.

Usage: python experiments/profile_text.py [B] [K] [--grad]
Env: PROF_MODEL (default b32-yfcc-msclips), PROF_PALLAS=0.

Methodology as profile_train.py: K steps chained in one jit'd scan
(tunnel RTT paid once), inputs perturbed per step (tokens rolled — a
loop-invariant tower gets hoisted by XLA and times as zero).
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
from msclip_tpu.models import msclip as MM


def scan_timed(name, fn, args, K, iters=3):
    """fn(args, i) -> scalar; times K chained iterations in one jit."""

    @jax.jit
    def run(args):
        def body(c, i):
            return c + fn(args, i), None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
        return tot

    t0 = time.perf_counter()
    float(run(args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(args))
        times.append(time.perf_counter() - t0)
    ms = min(times) / K * 1e3
    print(f"{name:14s} {ms:7.2f} ms/iter   (compile {compile_s:.0f}s)",
          flush=True)
    return ms


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_config()
    model_yaml = os.environ.get("PROF_MODEL", "b32-yfcc-msclips")
    update_config(cfg, os.path.join(root,
                                    f"experiments/model/{model_yaml}.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS = os.environ.get("PROF_PALLAS", "1") != "0"
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if len(pos) > 0 else 256
    K = int(pos[1]) if len(pos) > 1 else 16
    grad = "--grad" in sys.argv

    params = model.init(jax.random.PRNGKey(0))
    W = spec.text_width
    Lctx = spec.context_length
    heads = spec.text_heads

    tokens = jnp.zeros((B, Lctx), jnp.int32).at[:, 0].set(49406)
    tokens = tokens.at[:, 1].set(320).at[:, 2].set(49407)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, Lctx, W),
                           jnp.bfloat16)
    mask = L.build_causal_mask(Lctx)

    print(f"{model_yaml} text tower B={B} L={Lctx} W={W} "
          f"pallas={int(spec.use_pallas)} grad={int(grad)}")

    # -- full encode_text (tokens rolled per step to defeat hoisting) ----
    def full(p, i):
        f = MM.encode_text(p, spec, jnp.roll(tokens, i, axis=0))
        return f.astype(jnp.float32).sum()

    scan_timed("full", lambda a, i: full(a, i), params, K)

    def run_blocks(p, x, m, use_pallas):
        bl = [MM.resolve_text_block(p, spec, i)
              for i in range(spec.text_layers)]
        for bp in bl:
            x = L.transformer_block(bp, x, heads, m, eps=spec.ln_eps,
                                    use_pallas=use_pallas)
        return x.astype(jnp.float32).sum()

    def mk(mask_, up):
        def f(p, i):
            return run_blocks(p, x0 + i.astype(x0.dtype) * 1e-6, mask_, up)

        return f

    scan_timed("blocks", mk(mask, spec.use_pallas), params, K)
    scan_timed("blocks_nomask", mk(None, spec.use_pallas), params, K)
    scan_timed("blocks_xla", mk(mask, False), params, K)

    # -- GEMM skeleton: the pure-MXU floor for the same weight set -------
    def gemms(p, i):
        x = x0 + i.astype(x0.dtype) * 1e-6
        for bp in [MM.resolve_text_block(p, spec, j)
                   for j in range(spec.text_layers)]:
            a = bp["attn"]
            qkv = x @ a["qkv_w"].astype(x.dtype) + a["qkv_b"].astype(x.dtype)
            ctx = qkv[..., :W]
            x = ctx @ a["out_w"].astype(x.dtype) + a["out_b"].astype(x.dtype)
            m = bp["mlp"]
            h = x @ m["c_fc"]["w"].astype(x.dtype) \
                + m["c_fc"]["b"].astype(x.dtype)
            h = L.quick_gelu(h)
            x = h @ m["c_proj"]["w"].astype(x.dtype) \
                + m["c_proj"]["b"].astype(x.dtype)
        return x.astype(jnp.float32).sum()

    scan_timed("gemms", gemms, params, K)

    if grad:
        # fwd+bwd w.r.t. the block INPUT (param grads included by jax.grad
        # over params would change the comparison; x-grad flows through
        # every layer the same way the train step's does)
        def blocks_vjp(use_pallas):
            def f(p, i):
                def inner(x_):
                    return run_blocks(p, x_ + i.astype(x_.dtype) * 1e-6,
                                      mask, use_pallas)

                return jax.grad(inner)(x0).astype(jnp.float32).sum()

            return f

        scan_timed("blocks+bwd", blocks_vjp(spec.use_pallas), params, K)
        scan_timed("blocks+bwd_xla", blocks_vjp(False), params, K)


if __name__ == "__main__":
    main()
