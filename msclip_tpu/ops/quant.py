"""Fused quantization kernels for the W8A8 eval mode (Pallas TPU).

The XLA dynamic-quant chain (absmax + scale + round + cast, fp32
materialized) costs ~1.1 ms per [256,197,768] GEMM input on v5e —
more than the entire int8 GEMM saving (experiments/int8_gemm_probe.py
``dyn``). These kernels emit int8 directly from the op that produces
the activation, one VMEM pass, never materializing the fp32 tensor:

* ``ln_quant``    — fp32-island LayerNorm (eps inside sqrt, exactly
  ``layers.layer_norm``) -> per-token absmax -> int8 + fp32 scales.
  Replaces the ln_1 -> qkv and ln_2 -> c_fc quant points.
* ``gelu_quant``  — QuickGELU -> per-token absmax -> int8 + scales.
  Replaces the c_fc -> c_proj quant point (the 4E-wide one).

Both return ``(xq int8 [B, L, E], scales fp32 [B, L])`` with
``x ~= xq * scales[..., None]``. The int8 GEMM + dequant epilogue stays
in XLA (``layers._int8_matmul``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tuning import get_tuning


def _pick_tb(batch, seq, width, in_itemsize):
    # blocks: in (bf16/fp32) + int8 out + fp32 scales, double-buffered
    per_sample = seq * width * (in_itemsize + 1) + seq * 4
    tb = max(1, get_tuning().quant_vmem_budget // (2 * per_sample))
    tb = 1 << (tb.bit_length() - 1)
    while tb > 1 and batch % tb:
        tb //= 2
    return max(tb, 1)


def _quantize_rows(h):
    """fp32 [TB, L, E] -> (int8, fp32 [TB, L, 1] scales), symmetric.

    Scales keep a trailing singleton so the output block's last two dims
    equal the array dims (a Mosaic block-shape requirement — a 2-D
    [TB, L] output block would need L % 128 == 0)."""
    s = jnp.maximum(
        jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, 1e-8
    )  # [TB, L, 1]
    q = jnp.clip(jnp.round(h / s), -127, 127)
    return q.astype(jnp.int8), s


def _ln_quant_kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    # match layers.layer_norm bit-for-bit: normalize in fp32, cast to the
    # compute dtype, THEN apply the affine in compute dtype
    normed = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
    h = g_ref[...].astype(x_ref.dtype) * normed + b_ref[...].astype(
        x_ref.dtype
    )
    q, s = _quantize_rows(h.astype(jnp.float32))
    q_ref[...] = q
    s_ref[...] = s


def _gelu_quant_kernel(x_ref, q_ref, s_ref):
    # QuickGELU with an explicit fp32 sigmoid: Mosaic's bf16 `logistic`
    # lowering emits an invalid f32->bf16 vector.broadcast at this shape,
    # so keep the whole elementwise chain in fp32 (it feeds an fp32
    # absmax/quant anyway; one extra cast, still a single VMEM pass)
    xf = x_ref[...].astype(jnp.float32)
    h = xf / (1.0 + jnp.exp(-1.702 * xf))
    q, s = _quantize_rows(h.astype(jnp.float32))
    q_ref[...] = q
    s_ref[...] = s


def _run(kernel, x, extra_inputs, extra_specs, interpret):
    B, L, E = x.shape
    # _pick_tb halves until tb | B, so no batch padding is ever needed
    tb = _pick_tb(B, L, E, x.dtype.itemsize)
    q, s = pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=(
            pl.BlockSpec((tb, L, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, L, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, E), jnp.int8),
            jax.ShapeDtypeStruct((B, L, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x, *extra_inputs)
    return q, s[..., 0]


def ln_quant(x, ln_p, eps=1e-12, *, interpret=False):
    """LayerNorm (fp32 island) + symmetric per-token int8 quant, fused."""
    E = x.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return _run(
        functools.partial(_ln_quant_kernel, eps=eps),
        x,
        (ln_p["scale"], ln_p["bias"]),
        [full((E,)), full((E,))],
        interpret,
    )


def gelu_quant(x, *, interpret=False):
    """QuickGELU + symmetric per-token int8 quant, fused."""
    return _run(_gelu_quant_kernel, x, (), [], interpret)
