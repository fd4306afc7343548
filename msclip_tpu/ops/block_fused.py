"""Fully-fused transformer half-block kernels (Pallas TPU, inference).

Two megakernels covering a whole pre-LN block:

* ``fused_attention_halfblock`` — LN -> QKV GEMM -> per-head attention ->
  out-projection -> residual add, with ALL weights VMEM-resident. Nothing
  but x and x' touch HBM (the XLA pipeline writes ln(x), qkv, scores,
  context and the projection input).
* ``fused_mlp_halfblock``       — LN -> c_fc GEMM -> QuickGELU -> c_proj ->
  residual add; the 4x-wide intermediate never leaves VMEM.

Inference-path kernels (no VJP): enabled by ``TPU.USE_FUSED_BLOCK`` for
eval; training uses the differentiable attention-core kernel instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(xt, g_ref, b_ref, eps):
    xf = xt.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(xt.dtype)
    return g_ref[...].astype(xt.dtype) * normed \
        + b_ref[...].astype(xt.dtype)


def _attn_half_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref,
                      bo_ref, mask_ref, o_ref, ctx_ref, *, n_head, scale,
                      eps, has_mask):
    xt = x_ref[...]  # [TB, L, E]
    TB, Lk, E = xt.shape
    D = E // n_head

    h = _ln(xt, g_ref, b_ref, eps)
    qkv = jax.lax.dot_general(
        h.reshape(TB * Lk, E), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(xt.dtype)
    qkv = qkv.reshape(TB, Lk, 3 * E)

    for hh in range(n_head):
        q = qkv[:, :, hh * D:(hh + 1) * D].astype(jnp.float32)
        k = qkv[:, :, E + hh * D:E + (hh + 1) * D].astype(jnp.float32)
        v = qkv[:, :, 2 * E + hh * D:2 * E + (hh + 1) * D]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_mask:
            s = s + mask_ref[...]
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            w, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ctx_ref[:, :, hh * D:(hh + 1) * D] = o.astype(ctx_ref.dtype)

    out = jax.lax.dot_general(
        ctx_ref[...].reshape(TB * Lk, E), wo_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.reshape(TB, Lk, E).astype(xt.dtype)


def _mlp_half_kernel(x_ref, g_ref, b_ref, wfc_ref, bfc_ref, wpr_ref,
                     bpr_ref, o_ref, *, eps):
    xt = x_ref[...]
    TB, Lk, E = xt.shape
    h = _ln(xt, g_ref, b_ref, eps).reshape(TB * Lk, E)
    mid = jax.lax.dot_general(
        h, wfc_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mid = mid + bfc_ref[...].astype(jnp.float32)
    mid = (mid * jax.nn.sigmoid(1.702 * mid)).astype(xt.dtype)
    out = jax.lax.dot_general(
        mid, wpr_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bpr_ref[...].astype(jnp.float32)
    o_ref[...] = xt + out.reshape(TB, Lk, E).astype(xt.dtype)


def _pick_tb(batch, per_sample_bytes, budget=2 * 1024 * 1024):
    tb = max(1, budget // per_sample_bytes)
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
    """x + mlp(ln_2(x)) in one kernel. x: [B, L, E]."""
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
    """Full pre-LN block as two megakernels (inference)."""
    x = fused_attention_halfblock(x, blk, n_head, mask, eps=eps,
                                  interpret=interpret)
    return fused_mlp_halfblock(x, blk, eps=eps, interpret=interpret)
