"""W8A8 int8 eval quantization (models/quantize.py, TPU.INT8_EVAL).

No reference counterpart — this is a TPU-serving extension (int8 MXU at
2x bf16 on v5e); the checks pin the quantization math exactly and bound
the model-level drift vs the full-precision path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.models import MSClipModel, MSClipSpec
from msclip_tpu.models import layers as L
from msclip_tpu.models.quantize import (
    quantize_linear_weight,
    quantize_params_for_eval,
)


def _spec(**kw):
    d = dict(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=3,
        vision_patch_size=16, vision_heads=2, text_width=64, text_heads=2,
        text_layers=3, vocab_size=128, context_length=16,
        share_modules=("attn.in_proj_weight", "attn.in_proj_bias",
                       "attn.out_proj", "mlp"),
        share_n_layers=1,
    )
    d.update(kw)
    return MSClipSpec(**d)


def test_int8_linear_exact_math():
    """linear() on a quantized dict == the hand-written W8A8 reference."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 10, 32)).astype(np.float32)
    w = rng.standard_normal((32, 48)).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)

    q, s = quantize_linear_weight(jnp.asarray(w))
    got = L.linear({"w_int8": q, "w_scale": s, "b": jnp.asarray(b)},
                   jnp.asarray(x))

    s_ref = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8)
    q_ref = np.clip(np.round(w / s_ref), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(q), q_ref)
    s_a = np.maximum(np.abs(x).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    x_ref = np.clip(np.round(x / s_a), -127, 127).astype(np.int8)
    want = (x_ref.astype(np.int32) @ q_ref.astype(np.int32)).astype(
        np.float32
    ) * s_a * s_ref + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_int8_model_drift_bounded():
    """Quantized model embeddings stay close to full precision on both
    towers (cosine > 0.995), including shared text blocks resolving the
    quantized visual tensors."""
    spec = _spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    qparams = quantize_params_for_eval(params, spec)

    # the trunk really is int8 now
    blk = qparams["visual"]["blocks"][0]
    assert blk["attn"]["qkv_w_int8"].dtype == jnp.int8
    assert "qkv_w" not in blk["attn"]
    assert blk["mlp"]["c_fc"]["w_int8"].dtype == jnp.int8

    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    tokens = np.zeros((2, 16), np.int32)
    tokens[:, 0] = 126
    tokens[0, 1:5] = rng.integers(1, 120, 4)
    tokens[0, 5] = 127
    tokens[1, 1:3] = rng.integers(1, 120, 2)
    tokens[1, 3] = 127
    tokens = jnp.asarray(tokens)

    for fn, x in ((model.encode_image, images),
                  (model.encode_text, tokens)):
        full = np.asarray(fn(params, x))
        quant = np.asarray(fn(qparams, x))
        cos = (full * quant).sum(-1) / (
            np.linalg.norm(full, axis=-1) * np.linalg.norm(quant, axis=-1)
        )
        assert cos.min() > 0.995, cos


def test_ln_quant_kernel_matches_reference():
    """Fused LN+quant kernel (interpret mode) == layer_norm followed by
    the row-quant reference math, including scale reconstruction."""
    from msclip_tpu.ops.quant import gelu_quant, ln_quant

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 10, 64)).astype(np.float32))
    ln_p = {"scale": jnp.asarray(rng.standard_normal(64, ).astype(
        np.float32)), "bias": jnp.asarray(rng.standard_normal(64).astype(
            np.float32))}

    q, s = ln_quant(x, ln_p, eps=1e-12, interpret=True)
    h = np.asarray(L.layer_norm(ln_p, x, eps=1e-12))
    s_ref = np.maximum(np.abs(h).max(-1) / 127.0, 1e-8)
    q_ref = np.clip(np.round(h / s_ref[..., None]), -127, 127)
    np.testing.assert_array_equal(np.asarray(q), q_ref.astype(np.int8))
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-6)

    g, sg = gelu_quant(x, interpret=True)
    hg = np.asarray(L.quick_gelu(x))
    sg_ref = np.maximum(np.abs(hg).max(-1) / 127.0, 1e-8)
    gg_ref = np.clip(np.round(hg / sg_ref[..., None]), -127, 127)
    np.testing.assert_array_equal(np.asarray(g), gg_ref.astype(np.int8))
    np.testing.assert_allclose(np.asarray(sg), sg_ref, rtol=1e-6)


def test_int8_fused_block_matches_unfused():
    """The fused-quant block (Pallas ln_quant/gelu_quant + int8 GEMMs)
    must match the unfused int8 path (generic dispatch) — same
    quantization points, different fusion."""
    from msclip_tpu.models.quantize import _quantize_block

    rng = np.random.default_rng(4)
    E, H = 64, 2
    blk = L.init_block(jax.random.PRNGKey(5), E)
    qblk = _quantize_block(blk)
    x = jnp.asarray(0.1 * rng.standard_normal((2, 10, E)).astype(
        np.float32))

    want = L.transformer_block(qblk, x, H, eps=1e-12, use_pallas=False)
    got = L._int8_block(qblk, x, H, None, 1e-12, use_pallas=True,
                        pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    # transformer_block threads the interpret flag down to the fused
    # path (L>=96 gate), so INT8_EVAL+USE_PALLAS is CPU-testable too
    x_long = jnp.asarray(0.1 * rng.standard_normal((1, 96, E)).astype(
        np.float32))
    want = L.transformer_block(qblk, x_long, H, eps=1e-12,
                               use_pallas=False)
    got = L.transformer_block(qblk, x_long, H, eps=1e-12, use_pallas=True,
                              pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_int8_skips_unknown_key_blocks():
    """Blocks carrying unexpected params keep full precision (defensive
    guard for future block variants)."""
    spec = _spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    blocks = list(params["visual"]["blocks"])
    blocks[1] = {**blocks[1], "extra": {"w": jnp.zeros((4, 4))}}
    params = {**params, "visual": {**params["visual"], "blocks": blocks}}
    q = quantize_params_for_eval(params, spec)
    assert "qkv_w" in q["visual"]["blocks"][1]["attn"]  # untouched
    assert "qkv_w_int8" in q["visual"]["blocks"][0]["attn"]


def test_int8_rejects_extension_spec():
    """Extension params live OUTSIDE the block dicts (the forward reads
    fp qkv_w directly), so an ext-active spec must refuse to quantize
    instead of crashing at trace time (r2 review finding)."""
    from msclip_tpu.models.extensions import ExtSpec

    spec = _spec(ext=ExtSpec(adapter_flag=True, adapter_dim=4,
                             adapter_layers=(0,)))
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="extension"):
        quantize_params_for_eval(params, spec)
