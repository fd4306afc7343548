"""Fused attention half-block megakernel (Pallas TPU, inference).

``fused_attention_halfblock`` computes ``x + attn(ln_1(x))`` in ONE kernel:
LN -> q/k/v projections -> per-head attention -> out-projection -> residual
add, with all weights VMEM-resident. None of the intermediates (ln(x), q,
k, v, scores, context, projection input) ever touch HBM; per layer only x
is read and x' written.

Kernel-shape findings from v5e tuning (experiments/halfblock_tuning.py,
B=256, ViT-B/32):

* Mosaic's in-kernel matmul reaches ~131 TF/s at these shapes vs ~296 TF/s
  for XLA's GEMM emitter, so fusing a GEMM into Pallas costs ~2x its
  compute time and is only worth it when the eliminated HBM round-trips
  are bigger. At round-1 measurement that held for the attention half
  (qkv round trip is 118 MB/layer at B=256: fused 7.7 ms vs 9.3 ms
  unfused per 11 layers) but NOT for the MLP half (240 GFLOP/layer of
  GEMM vs one 78 MB intermediate: fused measured slower), so
  ``fused_block`` keeps the MLP half in XLA.
* Round-2 UPDATE: after the attention-core kernel switched to
  native-dtype multiplies, the default path (XLA GEMMs + core kernel)
  beats this hybrid end to end on BOTH models (b32: 10,666 vs 9,418
  img/s; b16: 3,561 vs 3,033 — at L=197 the tile drops to 2 and the
  Mosaic GEMM penalty dominates). ``TPU.USE_FUSED_BLOCK`` therefore
  stays default-off; the kernel remains for memory-constrained serving.
* 3-D dots (batch dim = samples) beat flattening ``[TB, L, E]`` to
  ``[TB*L, E]`` — the flatten is a relayout at L=50 (not a multiple of the
  bf16 16-row tile), and padding L to 64 costs more FLOPs than the
  alignment recovers.
* Separate q/k/v projections (three ``[E, E]`` dots) beat one fused
  ``[E, 3E]`` dot: the fp32 accumulator stays 3x smaller and the bf16
  cast pipelines per projection.

Inference-path kernel (no VJP): enabled by ``TPU.USE_FUSED_BLOCK`` for
eval; training uses the differentiable attention-core kernel instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(xt, g, b, eps):
    xf = xt.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(xt.dtype)
    return g.astype(xt.dtype) * normed + b.astype(xt.dtype)


def _attn_half_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref,
                      bo_ref, mask_ref, o_ref, ctx_ref, *, n_head, scale,
                      eps, has_mask):
    xt = x_ref[...]  # [TB, L, E]
    TB, Lk, E = xt.shape
    D = E // n_head

    h = _ln(xt, g_ref[...], b_ref[...], eps)
    wq = wqkv_ref[...]
    bq = bqkv_ref[...]

    def proj(w, b):  # [TB, L, E] @ [E, E] -> bf16, fp32 accumulation
        r = jax.lax.dot_general(h, w, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (r + b.astype(jnp.float32)).astype(xt.dtype)

    q = proj(wq[:, :E], bq[:E])
    k = proj(wq[:, E:2 * E], bq[E:2 * E])
    v = proj(wq[:, 2 * E:], bq[2 * E:])

    for hh in range(n_head):
        qh = q[:, :, hh * D:(hh + 1) * D]
        kh = k[:, :, hh * D:(hh + 1) * D]
        vh = v[:, :, hh * D:(hh + 1) * D]
        # native-dtype multiply, fp32 accumulate (one MXU pass for bf16
        # instead of fp32's 3-pass decomposition); softmax stays fp32
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if has_mask:
            s = s + mask_ref[...]
        w = jax.nn.softmax(s, axis=-1).astype(xt.dtype)
        o = jax.lax.dot_general(w, vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)

    out = jax.lax.dot_general(ctx_ref[...], wo_ref[...],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.astype(xt.dtype)


def _mlp_half_kernel(x_ref, g_ref, b_ref, wfc_ref, bfc_ref, wpr_ref,
                     bpr_ref, o_ref, *, eps):
    xt = x_ref[...]
    h = _ln(xt, g_ref[...], b_ref[...], eps)
    mid = jax.lax.dot_general(
        h, wfc_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mid = mid + bfc_ref[...].astype(jnp.float32)
    mid = (mid * jax.nn.sigmoid(1.702 * mid)).astype(xt.dtype)
    out = jax.lax.dot_general(
        mid, wpr_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bpr_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.astype(xt.dtype)


def _pick_tb(batch, per_sample_bytes, budget=4 * 1024 * 1024):
    tb = max(1, budget // per_sample_bytes)
    tb = 1 << (tb.bit_length() - 1)
    while tb > 1 and batch % tb:
        tb //= 2
    return max(tb, 1)


def _full(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "interpret",
                                             "batch_tile"))
def fused_attention_halfblock(x, blk, n_head, mask=None, *, eps=1e-12,
                              interpret=False, batch_tile=None):
    """x + attention(ln_1(x)) in one kernel. x: [B, L, E]."""
    B, L, E = x.shape
    scale = (E // n_head) ** -0.5
    tb = batch_tile or _pick_tb(B, L * E * x.dtype.itemsize * 5)
    pad_b = (-B) % tb
    xp = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0))) if pad_b else x
    Bp = B + pad_b

    in_specs = [
        pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _full((E,)), _full((E,)),
        _full((E, 3 * E)), _full((3 * E,)),
        _full((E, E)), _full((E,)),
    ]
    inputs = [
        xp, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
        blk["attn"]["qkv_w"].astype(x.dtype), blk["attn"]["qkv_b"],
        blk["attn"]["out_w"].astype(x.dtype), blk["attn"]["out_b"],
    ]
    has_mask = mask is not None
    if has_mask:
        in_specs.append(_full((L, L)))
        inputs.append(mask.astype(jnp.float32))

        def body(x_r, g_r, b_r, wq_r, bq_r, wo_r, bo_r, m_r, o_r, c_r):
            _attn_half_kernel(x_r, g_r, b_r, wq_r, bq_r, wo_r, bo_r, m_r,
                              o_r, c_r, n_head=n_head, scale=scale, eps=eps,
                              has_mask=True)
    else:

        def body(x_r, g_r, b_r, wq_r, bq_r, wo_r, bo_r, o_r, c_r):
            _attn_half_kernel(x_r, g_r, b_r, wq_r, bq_r, wo_r, bo_r, None,
                              o_r, c_r, n_head=n_head, scale=scale, eps=eps,
                              has_mask=False)

    out = pl.pallas_call(
        body,
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, E), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, L, E), x.dtype)],
        interpret=interpret,
    )(*inputs)
    return out[:B] if pad_b else out


@functools.partial(jax.jit, static_argnames=("eps", "interpret",
                                             "batch_tile"))
def fused_mlp_halfblock(x, blk, *, eps=1e-12, interpret=False,
                        batch_tile=None):
    """x + mlp(ln_2(x)) in one kernel. x: [B, L, E].

    NOTE: measured slower than the XLA MLP half on v5e (Mosaic GEMM
    efficiency, see module docstring) — kept for API completeness and
    memory-constrained serving (the 4x intermediate never hits HBM), but
    ``fused_block`` does not use it.
    """
    B, L, E = x.shape
    tb = batch_tile or _pick_tb(B, L * E * x.dtype.itemsize * 10)
    pad_b = (-B) % tb
    xp = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0))) if pad_b else x
    Bp = B + pad_b

    out = pl.pallas_call(
        functools.partial(_mlp_half_kernel, eps=eps),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _full((E,)), _full((E,)),
            _full((E, 4 * E)), _full((4 * E,)),
            _full((4 * E, E)), _full((E,)),
        ],
        out_specs=pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, E), x.dtype),
        interpret=interpret,
    )(
        xp, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
        blk["mlp"]["c_fc"]["w"].astype(x.dtype), blk["mlp"]["c_fc"]["b"],
        blk["mlp"]["c_proj"]["w"].astype(x.dtype), blk["mlp"]["c_proj"]["b"],
    )
    return out[:B] if pad_b else out


def fused_block(x, blk, n_head, mask=None, *, eps=1e-12, interpret=False):
    """Full pre-LN block: fused attention half + XLA MLP half.

    The hybrid is the measured-fastest split on v5e (see module
    docstring): Pallas where fusion wins (attention half), XLA where its
    GEMM emitter wins (MLP half).
    """
    x = fused_attention_halfblock(x, blk, n_head, mask, eps=eps,
                                  interpret=interpret)
    h = _ln(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"], eps)
    mid = jnp.dot(h, blk["mlp"]["c_fc"]["w"].astype(x.dtype),
                  precision=jax.lax.Precision.HIGHEST) \
        + blk["mlp"]["c_fc"]["b"].astype(x.dtype)
    mid = mid * jax.nn.sigmoid(1.702 * mid)
    out = jnp.dot(mid, blk["mlp"]["c_proj"]["w"].astype(x.dtype),
                  precision=jax.lax.Precision.HIGHEST) \
        + blk["mlp"]["c_proj"]["b"].astype(x.dtype)
    return x + out
