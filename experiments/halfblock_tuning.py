"""Iterate on fused half-block kernel internals (attn + MLP) on the TPU.

Each variant is an inline pallas kernel; measured as 11 chained layers,
scan-amortized. Run: python experiments/halfblock_tuning.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from msclip_tpu.models import layers as L

B, Lq, E, H = 256, 50, 768, 12
D = E // H
SCALE = D ** -0.5
K = 32
EPS = 1e-12

blk = L.init_block(jax.random.PRNGKey(0), E)
x0 = jax.random.normal(jax.random.PRNGKey(1), (B, Lq, E), jnp.bfloat16)


def _ln(xt, g, b):
    xf = xt.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = ((xf - mu) * jax.lax.rsqrt(var + EPS)).astype(xt.dtype)
    return g.astype(xt.dtype) * normed + b.astype(xt.dtype)


def _full(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def make_attn_half(kern, tb, n_scratch=1, scratch_dtype=None):
    def apply(x, blk):
        wq = blk["attn"]["qkv_w"].astype(x.dtype)
        wo = blk["attn"]["out_w"].astype(x.dtype)
        scratch = []
        if n_scratch:
            scratch = [pltpu.VMEM((tb, Lq, E), scratch_dtype or x.dtype)]
        return pl.pallas_call(
            kern,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, Lq, E), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full((E,)), _full((E,)),
                _full((E, 3 * E)), _full((3 * E,)),
                _full((E, E)), _full((E,)),
            ],
            out_specs=pl.BlockSpec((tb, Lq, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Lq, E), x.dtype),
            scratch_shapes=scratch,
        )(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"], wq,
          blk["attn"]["qkv_b"], wo, blk["attn"]["out_b"])

    return apply


# --- v0: current implementation (fp32 qkv round-trip, ctx scratch) --------
def attn_kern_v0(x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                 o_ref, ctx_ref):
    xt = x_ref[...]
    TB = xt.shape[0]
    h = _ln(xt, g_ref[...], b_ref[...])
    qkv = jax.lax.dot_general(
        h.reshape(TB * Lq, E), wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(xt.dtype)
    qkv = qkv.reshape(TB, Lq, 3 * E)
    for hh in range(H):
        q = qkv[:, :, hh * D:(hh + 1) * D].astype(jnp.float32)
        k = qkv[:, :, E + hh * D:E + (hh + 1) * D].astype(jnp.float32)
        v = qkv[:, :, 2 * E + hh * D:2 * E + (hh + 1) * D]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * SCALE
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(w, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)
    out = jax.lax.dot_general(
        ctx_ref[...].reshape(TB * Lq, E), wo_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.reshape(TB, Lq, E).astype(xt.dtype)


# --- v1: bf16 qkv GEMM output, bf16 score inputs (like the core kernel) ---
def attn_kern_v1(x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                 o_ref, ctx_ref):
    xt = x_ref[...]
    TB = xt.shape[0]
    h = _ln(xt, g_ref[...], b_ref[...])
    qkv = jax.lax.dot_general(
        h.reshape(TB * Lq, E), wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=xt.dtype)
    qkv = (qkv + bq_ref[...].astype(xt.dtype)).reshape(TB, Lq, 3 * E)
    for hh in range(H):
        q = qkv[:, :, hh * D:(hh + 1) * D]
        k = qkv[:, :, E + hh * D:E + (hh + 1) * D]
        v = qkv[:, :, 2 * E + hh * D:2 * E + (hh + 1) * D]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * SCALE
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(w, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)
    out = jax.lax.dot_general(
        ctx_ref[...].reshape(TB * Lq, E), wo_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.reshape(TB, Lq, E).astype(xt.dtype)


def bench(name, fn):
    @jax.jit
    def run(x, blk):
        def step(c, i):
            y = x + i * 1e-6
            for _ in range(11):
                y = fn(y, blk)
            return c + (y.astype(jnp.float32) ** 2).sum(), None

        t, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            jnp.arange(K).astype(jnp.bfloat16))
        return t

    try:
        float(run(x0, blk))
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, blk))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts) / K * 1e3 - 28.0 / K:7.3f} ms/11-layers",
          flush=True)


if __name__ == "__main__":
    float(jnp.ones((8, 8)).sum())
    for tb in [8, 16]:
        bench(f"attn_v0 tb={tb}", make_attn_half(attn_kern_v0, tb))
    for tb in [8, 16, 32]:
        bench(f"attn_v1_bf16 tb={tb}", make_attn_half(attn_kern_v1, tb))


# --- v2: 3D dots (no TB*L reshape), separate q/k/v GEMMs ------------------
def attn_kern_v2(x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                 o_ref, ctx_ref):
    xt = x_ref[...]
    h = _ln(xt, g_ref[...], b_ref[...])

    def proj(w, b):  # [TB, L, E] @ [E, N] -> bf16 [TB, L, N]
        r = jax.lax.dot_general(h, w, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (r + b.astype(jnp.float32)).astype(xt.dtype)

    wq = wq_ref[...]
    bq = bq_ref[...]
    q = proj(wq[:, :E], bq[:E])
    k = proj(wq[:, E:2 * E], bq[E:2 * E])
    v = proj(wq[:, 2 * E:], bq[2 * E:])
    for hh in range(H):
        qh = q[:, :, hh * D:(hh + 1) * D]
        kh = k[:, :, hh * D:(hh + 1) * D]
        vh = v[:, :, hh * D:(hh + 1) * D]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * SCALE
        w = jax.nn.softmax(s, axis=-1).astype(xt.dtype)
        o = jax.lax.dot_general(w, vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)
    out = jax.lax.dot_general(ctx_ref[...], wo_ref[...],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.astype(xt.dtype)


# --- v3: like v0 but 3D dots for the projections --------------------------
def attn_kern_v3(x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                 o_ref, ctx_ref):
    xt = x_ref[...]
    h = _ln(xt, g_ref[...], b_ref[...])
    qkv = jax.lax.dot_general(h, wq_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(xt.dtype)
    for hh in range(H):
        q = qkv[:, :, hh * D:(hh + 1) * D]
        k = qkv[:, :, E + hh * D:E + (hh + 1) * D]
        v = qkv[:, :, 2 * E + hh * D:2 * E + (hh + 1) * D]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * SCALE
        w = jax.nn.softmax(s, axis=-1).astype(xt.dtype)
        o = jax.lax.dot_general(w, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)
    out = jax.lax.dot_general(ctx_ref[...], wo_ref[...],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.astype(xt.dtype)


# --- v2a: v2 without the head loop (ctx = v) — isolates GEMM+LN cost ------
def attn_kern_v2a(x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                  o_ref, ctx_ref):
    xt = x_ref[...]
    h = _ln(xt, g_ref[...], b_ref[...])

    def proj(w, b):
        r = jax.lax.dot_general(h, w, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (r + b.astype(jnp.float32)).astype(xt.dtype)

    wq = wq_ref[...]
    bq = bq_ref[...]
    q = proj(wq[:, :E], bq[:E])
    k = proj(wq[:, E:2 * E], bq[E:2 * E])
    v = proj(wq[:, 2 * E:], bq[2 * E:])
    ctx = v + 0.0001 * q + 0.0001 * k
    out = jax.lax.dot_general(ctx, wo_ref[...],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.astype(xt.dtype)


# --- v2b: v2 but scores/context per head-pair via single reshaped dot -----
def attn_kern_v2c(x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                  o_ref, ctx_ref):
    """v2 with softmax on fewer ops: single fused max/exp/sum chain."""
    xt = x_ref[...]
    h = _ln(xt, g_ref[...], b_ref[...])

    def proj(w, b):
        r = jax.lax.dot_general(h, w, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (r + b.astype(jnp.float32)).astype(xt.dtype)

    wq = wq_ref[...]
    bq = bq_ref[...]
    q = proj(wq[:, :E], bq[:E])
    k = proj(wq[:, E:2 * E], bq[E:2 * E])
    v = proj(wq[:, 2 * E:], bq[2 * E:])
    for hh in range(H):
        qh = q[:, :, hh * D:(hh + 1) * D]
        kh = k[:, :, hh * D:(hh + 1) * D]
        vh = v[:, :, hh * D:(hh + 1) * D]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        w = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(xt.dtype)
        o = jax.lax.dot_general(w, vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)
    out = jax.lax.dot_general(ctx_ref[...], wo_ref[...],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.astype(xt.dtype)


# --- hybrid B: XLA qkv GEMM; Pallas [core + out-proj + residual] ----------
def core_out_kern(x_ref, qkv_ref, wo_ref, bo_ref, o_ref, ctx_ref):
    xt = x_ref[...]
    qkv = qkv_ref[...]
    for hh in range(H):
        q = qkv[:, :, hh * D:(hh + 1) * D]
        k = qkv[:, :, E + hh * D:E + (hh + 1) * D]
        v = qkv[:, :, 2 * E + hh * D:2 * E + (hh + 1) * D]
        s = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * SCALE
        w = jax.nn.softmax(s, axis=-1).astype(xt.dtype)
        o = jax.lax.dot_general(w, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)
    out = jax.lax.dot_general(ctx_ref[...], wo_ref[...],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = xt + (out + bo_ref[...].astype(jnp.float32)).astype(xt.dtype)


def make_hybrid_b(tb):
    def apply(x, blk):
        h = _ln(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
        qkv = jnp.dot(h, blk["attn"]["qkv_w"].astype(x.dtype),
                      precision=jax.lax.Precision.HIGHEST) \
            + blk["attn"]["qkv_b"].astype(x.dtype)
        return pl.pallas_call(
            core_out_kern,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, Lq, E), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, Lq, 3 * E), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full((E, E)), _full((E,)),
            ],
            out_specs=pl.BlockSpec((tb, Lq, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Lq, E), x.dtype),
            scratch_shapes=[pltpu.VMEM((tb, Lq, E), x.dtype)],
        )(x, qkv, blk["attn"]["out_w"].astype(x.dtype),
          blk["attn"]["out_b"])

    return apply
