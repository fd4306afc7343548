"""Fused multi-head attention core (Pallas TPU).

Computes ``softmax(q @ k^T * scale + mask) @ v`` for CLIP-scale short
sequences (50 / 197 image tokens, 77 text tokens; SURVEY.md hard part #6):
no flash-style tiling — the whole per-(batch-tile, head) score matrix lives
in VMEM, so the fp32 scores and softmax weights never touch HBM (XLA's
unfused path materializes both: ~2 x B x H x L^2 x 4B per block of HBM
traffic).

Layout: ``[B, H, L, D]`` with L padded to the sublane multiple by the
wrapper; key padding is neutralized with an additive -inf column mask
inside the kernel. The QKV/out projections stay in XLA (large GEMMs it
already schedules well, with LN fused into their prologue).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, l_valid):
    q = q_ref[0].astype(jnp.float32)  # [Lp, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    lp = q.shape[0]

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Lp, Lp]

    if mask_ref is not None:
        scores = scores + mask_ref[...]
    if l_valid < lp:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < l_valid, scores, -jnp.inf)

    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, mask=None, *, interpret=False):
    """softmax(q k^T / sqrt(D) [+ mask]) v.

    q/k/v: ``[B, H, L, D]`` (any float dtype); mask: additive ``[L, L]``
    fp32 or None. Returns ``[B, H, L, D]`` in q's dtype.
    """
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sub)
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    qf = q.reshape(B * H, Lp, D)
    kf = k.reshape(B * H, Lp, D)
    vf = v.reshape(B * H, Lp, D)

    kernel = functools.partial(_attn_kernel, scale=scale, l_valid=L)
    specs = [
        pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    inputs = [qf, kf, vf]
    if mask is not None:
        mask_p = jnp.pad(
            mask.astype(jnp.float32), ((0, Lp - L), (0, Lp - L))
        )
        specs.append(pl.BlockSpec((Lp, Lp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        inputs.append(mask_p)
        body = kernel
    else:
        body = lambda qr, kr, vr, orf: kernel(qr, kr, vr, None, orf)

    out = pl.pallas_call(
        body,
        grid=(B * H,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lp * Lp * D,
            bytes_accessed=4 * B * H * Lp * D * q.dtype.itemsize,
            transcendentals=B * H * Lp * Lp,
        ),
    )(*inputs)
    out = out.reshape(B, H, Lp, D)
    return out[:, :, :L, :]
