"""Introspection taps: per-layer features and attention maps.

The JAX analogue of the reference's threading of ``output_layer_fea`` /
``output_last_attnmap`` / ``OUTPUT_ATTN_RAW`` through the forward
(``clip_openai_pe_res_v1.py:2357-2469, 3003-3041``; SURVEY.md §5 tracing).
Runs the same block functions as the production path and additionally
returns stacked per-layer activations and (optionally raw, pre-softmax)
attention maps. Jit-compatible (fixed-size outputs).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from . import layers as L
from . import stem as S
from .msclip import MSClipSpec, resolve_text_block
from .stem import BNState


def attention_maps(p, x, n_head, mask=None, raw=False):
    """Recompute the attention distribution of one block input ``x``
    (post-LN). ``raw=True`` returns pre-softmax scores (OUTPUT_ATTN_RAW)."""
    B, Lq, E = x.shape
    head_dim = E // n_head
    # _proj_params handles both fp and int8-quantized (w_int8) blocks
    qkv = L.linear(L._proj_params(p, "qkv"), x)
    q, k, _ = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, Lq, n_head, head_dim).transpose(0, 2, 1, 3)

    q = heads(q) * jnp.asarray(head_dim ** -0.5, x.dtype)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", q, heads(k), preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    if raw:
        return scores
    return jax.nn.softmax(scores, axis=-1)


def encode_image_with_taps(params, spec: MSClipSpec, images,
                           raw_attn: bool = False):
    """Returns (features, taps) where taps = {'layer_features': [n_blocks,
    B, L, W], 'attn_maps': [n_blocks, B, H, L, L]}."""
    if spec.vision_resnet_layers:
        raise NotImplementedError("taps are for the transformer tower")

    bn = BNState(training=False)
    v = params["visual"]
    x = images.astype(spec.dtype)
    B = x.shape[0]
    W, g = spec.vision_width, spec.grid

    if spec.early_conv:
        if spec.early_conv_res:
            fmap = S.apply_earlyconv_res(
                v["stem"], x, spec.early_conv_strides, bn,
                first_conv_k=spec.early_conv_first_k, path="visual/stem",
            )
        else:
            fmap = S.apply_plain_conv_stem(v["stem"], x, bn,
                                           path="visual/stem")
    else:
        fmap = L.conv2d(v["conv1"], x, stride=spec.vision_patch_size,
                        padding=0)
    tokens = fmap.reshape(B, g * g, W)
    cls_tok = jnp.broadcast_to(
        v["class_embedding"].astype(spec.dtype), (B, 1, W)
    )
    tokens = jnp.concatenate([cls_tok, tokens], axis=1)
    tokens = tokens + v["positional_embedding"].astype(spec.dtype)
    tokens = L.layer_norm(v["ln_pre"], tokens, eps=spec.ln_eps)

    layer_feats, attn_maps = [], []
    parallel_x = None
    block_idx = 0
    start = 1 if spec.stem_in_trunk else 0
    for idx in range(start, spec.effective_vision_layers):
        if spec.parallel and idx in spec.lateral_layers:
            li = spec.lateral_layers.index(idx)
            stage_in = x if li == 0 else parallel_x
            parallel_x = S.apply_parallel_stage(
                v["parallel_stages"][li], stage_in,
                spec.parallel_kernels[li], spec.parallel_strides[li],
                spec.parallel_paddings[li], bn,
                f"visual/parallel_stages/{li}",
            )
            parallel_x, tokens = S.apply_lateral_adapter(
                v["lateral_adapters"][li], parallel_x, tokens, (g, g),
                spec.t2b_kernels[li], spec.t2b_strides[li],
                spec.t2b_paddings[li], bn, f"visual/lateral_adapters/{li}",
                use_cls=spec.t2b_use_cls,
            )
        blk = v["blocks"][block_idx]
        normed = L.layer_norm(blk["ln_1"], tokens, eps=spec.ln_eps)
        attn_maps.append(
            attention_maps(blk["attn"], normed, spec.vision_heads,
                           raw=raw_attn)
        )
        tokens = L.transformer_block(blk, tokens, spec.vision_heads, None,
                                     eps=spec.ln_eps)
        layer_feats.append(tokens)
        block_idx += 1

    pooled = tokens[:, 0, :]
    pooled = L.layer_norm(v["ln_post"], pooled, eps=spec.ln_eps)
    feats = pooled @ v["proj"].astype(spec.dtype)
    feats = L.l2_normalize(feats)
    return feats, {
        "layer_features": jnp.stack(layer_feats),
        "attn_maps": jnp.stack(attn_maps),
    }


def encode_text_with_taps(params, spec: MSClipSpec, tokens,
                          raw_attn: bool = False):
    t = params["text"]
    x = t["token_embedding"][tokens].astype(spec.dtype)
    x = x + t["positional_embedding"].astype(spec.dtype)
    mask = L.build_causal_mask(spec.context_length)

    layer_feats, attn_maps = [], []
    for i in range(spec.text_layers):
        blk = resolve_text_block(params, spec, i)
        normed = L.layer_norm(blk["ln_1"], x, eps=spec.ln_eps)
        attn_maps.append(
            attention_maps(blk["attn"], normed, spec.text_heads, mask,
                           raw=raw_attn)
        )
        x = L.transformer_block(blk, x, spec.text_heads, mask,
                                eps=spec.ln_eps)
        layer_feats.append(x)

    eot_idx = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    pooled = L.layer_norm(t["ln_final"], pooled, eps=spec.ln_eps)
    feats = pooled @ t["text_projection"].astype(spec.dtype)
    feats = L.l2_normalize(feats)
    return feats, {
        "layer_features": jnp.stack(layer_feats),
        "attn_maps": jnp.stack(attn_maps),
    }
