"""Fused multi-head attention core (Pallas TPU).

Computes per-head ``softmax(q k^T * scale [+ mask]) v`` directly from the
fused QKV projection output in its **native** ``[B, L, 3E]`` layout — heads
are sliced inside the kernel in VMEM, so none of the head-split transposes
or fp32 score tensors that dominate XLA's schedule ever touch HBM. For
CLIP-scale short sequences (50/197 image tokens, 77 text; SURVEY.md hard
part #6) the whole per-(batch-tile, head) computation is VMEM-resident —
no flash-style tiling needed; the win is fusion.

Measured on v5e (B=256, ViT-B/32 trunk): 11 blocks 22.7ms (XLA) ->
15.2ms (this kernel), bitwise-close (<= 1e-3 in bf16).

The QKV / output projections stay in XLA: they are large well-tiled GEMMs
and XLA fuses the LayerNorm prologue into them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tuning import get_tuning


def _pick_batch_tile(batch: int, seq: int, three_e: int, itemsize: int,
                     io_cols: int | None = None) -> int:
    """Largest power-of-two batch tile whose pipelined VMEM footprint fits.

    ``io_cols``: total last-dim columns DMA'd per sample — fwd moves
    3E in + E out (default), bwd moves 3E+E in + 3E out = 7E. Mosaic
    double-buffers every blocked operand across grid steps, so the
    constraint is ``2 * tb * seq * io_cols * itemsize <= budget`` (the
    round-1 picker modelled only the 3E input block and compiled a bwd
    tile whose stack allocation exceeded VMEM at B=512 / any b16 train
    batch). Power-of-two rounding first: 17 -> 16, not 8 via the
    divisibility loop; measured 26% faster at ViT-B/32 shapes on v5e.
    Verified vs a sweep at L=197 (experiments/attn197_tuning.py): picks
    the measured-optimal fwd tile (4) and the largest compilable sizes.
    """
    if io_cols is None:
        io_cols = 4 * (three_e // 3)
    per_sample = seq * io_cols * itemsize
    tb = max(1, get_tuning().attn_vmem_budget // (2 * per_sample))
    tb = 1 << (tb.bit_length() - 1)
    # largest power of two <= tb that also divides the (padded) batch
    while tb > 1 and batch % tb:
        tb //= 2
    return max(tb, 1)


def _attn_kernel(qkv_ref, o_ref, *, n_head, scale, has_mask, mask_ref=None):
    qkv = qkv_ref[...]  # [TB, L, 3E]
    E = qkv.shape[-1] // 3
    D = E // n_head
    for h in range(n_head):
        q = qkv[:, :, h * D:(h + 1) * D]
        k = qkv[:, :, E + h * D:E + (h + 1) * D]
        v = qkv[:, :, 2 * E + h * D:2 * E + (h + 1) * D]
        # native-dtype multiply, fp32 accumulate: a bf16 qk^T runs as one
        # MXU pass instead of fp32's 3-pass decomposition (softmax and the
        # running max/sum stay fp32 via preferred_element_type)
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_mask:
            scores = scores + mask_ref[...]
        weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jax.lax.dot_general(
            weights, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * D:(h + 1) * D] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, n_head, scale, has_mask,
                     mask_ref=None):
    """Backward: recompute the softmax weights per head in VMEM and produce
    dqkv (standard attention VJP, no flash tiling needed at CLIP seq
    lengths)."""
    qkv = qkv_ref[...]
    E = qkv.shape[-1] // 3
    D = E // n_head
    # all five matmuls run native-dtype multiply / fp32 accumulate (one MXU
    # pass for bf16 vs fp32's 3-pass form); the softmax, the dS correction
    # and the scale stay fp32. With fp32 inputs nothing changes.
    ct = qkv_ref.dtype
    for h in range(n_head):
        q = qkv[:, :, h * D:(h + 1) * D]
        k = qkv[:, :, E + h * D:E + (h + 1) * D]
        v = qkv[:, :, 2 * E + h * D:2 * E + (h + 1) * D]
        g = g_ref[:, :, h * D:(h + 1) * D]

        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_mask:
            scores = scores + mask_ref[...]
        w = jax.nn.softmax(scores, axis=-1)  # [TB, L, M] fp32
        wc = w.astype(ct)

        # dV = W^T g
        dv = jax.lax.dot_general(
            wc, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dW = g V^T ; dS = (dW - rowsum(dW * W)) * W
        dw = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = ((dw - jnp.sum(dw * w, axis=-1, keepdims=True)) * w).astype(ct)
        # dQ = dS K * scale ; dK = dS^T Q * scale
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

        dt = dqkv_ref.dtype
        dqkv_ref[:, :, h * D:(h + 1) * D] = dq.astype(dt)
        dqkv_ref[:, :, E + h * D:E + (h + 1) * D] = dk.astype(dt)
        dqkv_ref[:, :, 2 * E + h * D:2 * E + (h + 1) * D] = dv.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def _fused_attention_core(qkv, n_head, mask, interpret, batch_tile):
    return _fused_attention_fwd_impl(qkv, n_head, mask, interpret,
                                     batch_tile)


def _fused_attention_fwd(qkv, n_head, mask, interpret, batch_tile):
    out = _fused_attention_fwd_impl(qkv, n_head, mask, interpret, batch_tile)
    return out, (qkv, mask)


def _fused_attention_bwd(n_head, interpret, batch_tile, residuals, g):
    qkv, mask = residuals
    B, L, three_e = qkv.shape
    E = three_e // 3
    scale = (E // n_head) ** -0.5
    tb = batch_tile or _pick_batch_tile(B, L, three_e, qkv.dtype.itemsize,
                                        io_cols=7 * E)
    pad_b = (-B) % tb
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b

    in_specs = [
        pl.BlockSpec((tb, L, three_e), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qkv, g]
    if mask is not None:
        in_specs.append(pl.BlockSpec((L, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(mask.astype(jnp.float32))

        def body(qkv_ref, g_ref, mask_ref, dqkv_ref):
            _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_head=n_head,
                             scale=scale, has_mask=True, mask_ref=mask_ref)
    else:

        def body(qkv_ref, g_ref, dqkv_ref):
            _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_head=n_head,
                             scale=scale, has_mask=False)

    dqkv = pl.pallas_call(
        body,
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, L, three_e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, three_e), qkv.dtype),
        interpret=interpret,
    )(*inputs)
    if pad_b:
        dqkv = dqkv[:B]
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dqkv, dmask)


_fused_attention_core.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.lru_cache(maxsize=None)
def _pack_mask_np(seq: int, pack: int):
    """Block-diagonal additive mask for ``pack`` rows sharing one score
    tile: 0 inside each row's own ``[seq, seq]`` block, -1e9 across
    rows (softmax then renormalizes each query over its own keys only)."""
    import numpy as np

    m = np.full((pack * seq, pack * seq), -1e9, np.float32)
    for i in range(pack):
        m[i * seq:(i + 1) * seq, i * seq:(i + 1) * seq] = 0.0
    return m


def fused_attention_qkv(qkv, n_head, mask=None, *, interpret=False,
                        batch_tile=None, lane_pack=None):
    """qkv ``[B, L, 3E]`` (post in-projection) -> context ``[B, L, E]``.

    ``mask``: additive fp32 ``[L, L]`` (e.g. causal) or None.
    Differentiable: a custom VJP recomputes the softmax in VMEM and emits
    dqkv in one fused backward kernel.

    ``lane_pack`` (default: tuning table / ``MSCLIP_ATTN_PACK``): for
    maskless sequences short enough that ``pack * L <= 128``, view the
    batch as ``[B/pack, pack*L, 3E]`` (a free, contiguous reshape) and
    run the same kernel with a block-diagonal additive mask. The score
    matrix then fills the 128-wide lane tile that L=50 would otherwise
    pad 2.56x, and the per-head matmul count drops ``pack``x. The
    cross-row score FLOPs this "wastes" were pad slots the MXU burned
    anyway. Sweep: ``experiments/attn_pack_sweep.py`` (VERDICT r4 #3).
    """
    B, L, three_e = qkv.shape
    if lane_pack is None:
        lane_pack = get_tuning().attn_lane_pack
    pack = max(1, int(lane_pack)) if mask is None else 1
    while pack > 1 and (pack * L > 128 or B % pack):
        pack -= 1
    if pack > 1:
        qkv_p = qkv.reshape(B // pack, pack * L, three_e)
        pm = jnp.asarray(_pack_mask_np(L, pack))
        out = _fused_attention_core(qkv_p, n_head, pm, interpret,
                                    batch_tile)
        return out.reshape(B, L, three_e // 3)
    return _fused_attention_core(qkv, n_head, mask, interpret, batch_tile)


def _fused_attention_fwd_impl(qkv, n_head, mask, interpret=False,
                              batch_tile=None):
    B, L, three_e = qkv.shape
    E = three_e // 3
    D = E // n_head
    scale = D ** -0.5

    tb = batch_tile or _pick_batch_tile(B, L, three_e, qkv.dtype.itemsize)
    pad_b = (-B) % tb
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b

    in_specs = [
        pl.BlockSpec((tb, L, three_e), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    inputs = [qkv]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((L, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(mask.astype(jnp.float32))

        def body(qkv_ref, mask_ref, o_ref):
            _attn_kernel(qkv_ref, o_ref, n_head=n_head, scale=scale,
                         has_mask=True, mask_ref=mask_ref)
    else:

        def body(qkv_ref, o_ref):
            _attn_kernel(qkv_ref, o_ref, n_head=n_head, scale=scale,
                         has_mask=False)

    out = pl.pallas_call(
        body,
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, E), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * n_head * L * L * D,
            bytes_accessed=2 * Bp * L * (three_e + E) * qkv.dtype.itemsize,
            transcendentals=Bp * n_head * L * L,
        ),
    )(*inputs)
    return out[:B] if pad_b else out


def fused_attention(q, k, v, mask=None, *, interpret=False):
    """Compatibility wrapper over head-split inputs ``[B, H, L, D]``.

    Re-packs into the native ``[B, L, 3E]`` layout; prefer calling
    ``fused_attention_qkv`` right after the QKV projection to avoid the
    repack. Returns ``[B, H, L, D]``.
    """
    B, H, L, D = q.shape

    def flat(t):
        return t.transpose(0, 2, 1, 3).reshape(B, L, H * D)

    qkv = jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)
    out = fused_attention_qkv(qkv, H, mask, interpret=interpret)
    return out.reshape(B, L, H, D).transpose(0, 2, 1, 3)
