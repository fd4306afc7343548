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

B = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
     else 256)
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




def probe_dynamic():
    """The model-shaped path: bf16 [B, L, E] activations, dynamic
    per-token quant -> int8 GEMM -> fp32 dequant, vs plain bf16 GEMM.
    Isolates whether the end-to-end int8 loss is the quant chain or the
    GEMM/layout itself."""
    import functools

    B, Lq, E, N = 256, 197, 768, 2304
    x = jax.random.normal(jax.random.PRNGKey(0), (B, Lq, E), jnp.bfloat16)
    wb = jax.random.normal(jax.random.PRNGKey(1), (E, N), jnp.bfloat16)
    w8 = (jax.random.normal(jax.random.PRNGKey(1), (E, N)) * 30).astype(
        jnp.int8)
    ws = jax.random.uniform(jax.random.PRNGKey(2), (N,), jnp.float32)
    flops = 2.0 * B * Lq * E * N

    def quant(xf):
        s = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True) / 127.0,
                        1e-8)
        xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return xq, s

    def v_bf16(x, w, i):
        return jnp.dot(x + i.astype(x.dtype) * 0, w,
                       preferred_element_type=jnp.float32)

    def v_quant_only(x, w, i):
        xq, s = quant((x + i.astype(x.dtype) * 0).astype(jnp.float32))
        return xq.astype(jnp.float32).sum() + s.sum() + w[0, 0] * 0

    def v_full(x, w, i):
        xq, s = quant((x + i.astype(x.dtype) * 0).astype(jnp.float32))
        y = jax.lax.dot_general(xq, w, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * s * ws).astype(jnp.bfloat16)

    def v_pre8(x, w, i):
        # pre-quantized activation: GEMM + dequant only
        y = jax.lax.dot_general(x + i.astype(jnp.int8) * 0, w,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * ws).astype(jnp.bfloat16)

    x8 = (jax.random.normal(jax.random.PRNGKey(3), (B, Lq, E)) * 30).astype(
        jnp.int8)
    print(f"dynamic-quant path [{B},{Lq},{E}]x[{E},{N}]", flush=True)
    bench("bf16 3d", v_bf16, x, wb, flops)
    bench("quant only", v_quant_only, x, wb, 0.0)
    bench("quant+gemm+dq", v_full, x, w8, flops)
    bench("pre8 gemm+dq", v_pre8, x8, w8, flops)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "dyn":
        probe_dynamic()
    else:
        main()
