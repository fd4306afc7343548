"""Probe int8 MXU headroom at MS-CLIP trunk GEMM shapes (v5e).

v5e's MXU runs int8 at 2x the bf16 rate (394 -> 787 TOPS peak). This
measures what a weight+activation int8 path could buy at the exact
B=256 trunk shapes before committing to quantized kernels: bf16 GEMM vs
int8 GEMM (int32 accumulate) vs int8 with per-channel dequant epilogue.

Run: python experiments/int8_gemm_probe.py [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K_ITERS = 32

# (label, M, K, N): the four trunk GEMMs at b32 (L=50) and b16 (L=197)
SHAPES = [
    ("b32 qkv  [B*50,768]x[768,2304]", B * 50, 768, 2304),
    ("b32 mlp1 [B*50,768]x[768,3072]", B * 50, 768, 3072),
    ("b16 qkv  [B*197,768]x[768,2304]", B * 197, 768, 2304),
    ("b16 mlp1 [B*197,768]x[768,3072]", B * 197, 768, 3072),
]


def bench(label, fn, x, w, flops):
    @jax.jit
    def run(x, w):
        def body(c, i):
            y = fn(x, w, i)
            return c + y.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(K_ITERS))
        return tot

    try:
        float(run(x, w))
    except Exception as e:
        print(f"  {label:14s} FAILED: {repr(e)[:100]}", flush=True)
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, w))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K_ITERS
    print(f"  {label:14s} {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)
    return dt


def main():
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    print(f"# health: {time.perf_counter() - t0:.2f}s", flush=True)

    for label, M, K, N in SHAPES:
        print(label, flush=True)
        flops = 2.0 * M * K * N
        xk = jax.random.PRNGKey(0)
        xb = jax.random.normal(xk, (M, K), jnp.bfloat16)
        wb = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
        x8 = (jax.random.normal(xk, (M, K)) * 30).astype(jnp.int8)
        w8 = (jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 30).astype(
            jnp.int8
        )
        scale = jax.random.uniform(jax.random.PRNGKey(2), (N,), jnp.float32)

        t_bf16 = bench(
            "bf16", lambda x, w, i: jnp.dot(
                x + i.astype(x.dtype) * 0, w,
                preferred_element_type=jnp.float32), xb, wb, flops)
        bench(
            "int8->int32", lambda x, w, i: jnp.dot(
                x + i.astype(x.dtype) * 0, w,
                preferred_element_type=jnp.int32), x8, w8, flops)
        t_q = bench(
            "int8+dequant", lambda x, w, i: (jnp.dot(
                x + i.astype(x.dtype) * 0, w,
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * scale).astype(jnp.bfloat16),
            x8, w8, flops)
        if t_bf16 and t_q:
            print(f"  -> int8 speedup incl. dequant: {t_bf16 / t_q:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
