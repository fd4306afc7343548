"""Opt-in W8A8 int8 quantization for the transformer-trunk GEMMs (eval).

v5e's MXU runs int8 at 2x the bf16 rate; measured at the MS-CLIP trunk
shapes (experiments/int8_gemm_probe.py, B=256): 1.2-1.4x end-of-GEMM
speedup at b32 and 1.8-2.3x at b16 including the dequant epilogue. This
module rewrites each transformer block's four GEMM weights (qkv, out
projection, mlp c_fc / c_proj) to symmetric per-output-channel int8;
``layers.linear`` dispatches on the ``w_int8`` key and quantizes the
activations dynamically per token (absmax over the feature dim). The
attention core, LayerNorms, conv path, embeddings and projections stay
in the bf16/fp32 policy.

Enabled by ``TPU.INT8_EVAL`` (zero-shot eval) / ``BENCH_INT8=1``
(bench.py); OFF by default — the reference-parity path is bf16. There is
no reference counterpart (the reference's closest analogue is the fp16
``convert_weights`` cast, ``clip_openai_pe_res_v1.py:3158-3179``).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_linear_weight(w):
    """fp ``[K, N]`` -> (int8 ``[K, N]``, fp32 ``[N]`` per-channel scale)."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def _quantize_block(blk):
    """Quantize one plain trunk block; blocks carrying extension params
    (LoRA / CvT / adapters / gumbel branches) are returned unchanged —
    the experimental zoo keeps full precision."""
    plain = {"ln_1", "ln_2", "attn", "mlp"}
    if not set(blk.keys()) <= plain:
        return blk
    if "attn" in blk and set(blk["attn"].keys()) - {
        "qkv_w", "qkv_b", "out_w", "out_b"
    }:
        return blk
    if "mlp" in blk and set(blk["mlp"].keys()) - {"c_fc", "c_proj"}:
        return blk

    out = dict(blk)
    if "attn" in blk:
        attn = dict(blk["attn"])
        for name in ("qkv_w", "out_w"):
            if name in attn:
                q, s = quantize_linear_weight(attn.pop(name))
                attn[name + "_int8"] = q
                attn[name + "_scale"] = s
        out["attn"] = attn
    if "mlp" in blk:
        mlp = dict(blk["mlp"])
        for name in ("c_fc", "c_proj"):
            lin = dict(mlp[name])
            q, s = quantize_linear_weight(lin.pop("w"))
            lin["w_int8"] = q
            lin["w_scale"] = s
            mlp[name] = lin
        out["mlp"] = mlp
    return out


def quantize_params_for_eval(params, spec):
    """Return a params tree with every owned trunk block (visual AND
    text-owned non-shared blocks) quantized. Shared text blocks resolve
    the quantized visual tensors via ``resolve_text_block``."""
    if getattr(spec, "use_fused_block", False):
        raise ValueError(
            "TPU.INT8_EVAL and TPU.USE_FUSED_BLOCK are mutually exclusive "
            "(the bf16 half-block megakernel reads full-precision weights)"
        )
    if spec.ext.any_active:
        # extension params (LoRA/CvT/adapters/gumbel...) live OUTSIDE the
        # trunk block dicts, so the per-block skip below cannot see them —
        # and extended_attention reads the fp ``qkv_w`` directly. The
        # experimental zoo stays full precision.
        raise ValueError(
            "TPU.INT8_EVAL does not support the experimental extension "
            "zoo (spec.ext is active); disable the CUSTOM extensions or "
            "the int8 mode"
        )
    params = dict(params)
    visual = dict(params["visual"])
    visual["blocks"] = [_quantize_block(b) for b in visual["blocks"]]
    params["visual"] = visual
    text = dict(params["text"])
    text["blocks"] = [
        _quantize_block(b) if ("attn" in b or "mlp" in b) else b
        for b in text["blocks"]
    ]
    params["text"] = text
    return params
