"""CLIP ModifiedResNet vision tower.

TPU-native (NHWC) implementation of the reference's ResNet path
(``clip_openai_pe_res_v1.py:33-201``, selected when ``VISION.LAYERS`` is a
list, ``:2748-2756``): 3-conv stem with avgpool, anti-aliased strided
bottlenecks (avgpool before the strided conv), QKV attention pooling head
with separate q/k/v projections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .stem import BNState


def _avg_pool(x, k):
    """NHWC average pool, kernel = stride = k (torch AvgPool2d(k))."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


# ---------------------------------------------------------------------------
# Bottleneck
# ---------------------------------------------------------------------------

def init_bottleneck(key, inplanes, planes, stride=1, std=0.02):
    expansion = 4
    keys = jax.random.split(key, 4)
    p = {
        "conv1": L.init_conv(keys[0], 1, inplanes, planes, std=std),
        "bn1": L.init_batch_norm(planes),
        "conv2": L.init_conv(keys[1], 3, planes, planes, std=std),
        "bn2": L.init_batch_norm(planes),
        "conv3": L.init_conv(keys[2], 1, planes, planes * expansion, std=std),
        "bn3": L.init_batch_norm(planes * expansion),
    }
    if stride > 1 or inplanes != planes * expansion:
        p["down_conv"] = L.init_conv(
            keys[3], 1, inplanes, planes * expansion, std=std
        )
        p["down_bn"] = L.init_batch_norm(planes * expansion)
    return p


def apply_bottleneck(p, x, stride, bn: BNState, path):
    """All convs stride 1; avgpool after conv2 when stride > 1 (the
    anti-aliasing trick, reference ``:39-76``)."""
    out = jax.nn.relu(bn(p["bn1"], L.conv2d(p["conv1"], x), f"{path}/bn1"))
    out = jax.nn.relu(
        bn(p["bn2"], L.conv2d(p["conv2"], out, padding=1), f"{path}/bn2")
    )
    if stride > 1:
        out = _avg_pool(out, stride)
    out = bn(p["bn3"], L.conv2d(p["conv3"], out), f"{path}/bn3")
    identity = x
    if "down_conv" in p:
        if stride > 1:
            identity = _avg_pool(identity, stride)
        identity = bn(
            p["down_bn"], L.conv2d(p["down_conv"], identity),
            f"{path}/down_bn"
        )
    return jax.nn.relu(out + identity)


# ---------------------------------------------------------------------------
# Attention pooling head
# ---------------------------------------------------------------------------

def init_attention_pool(key, spacial_dim, embed_dim, output_dim, std=0.02):
    keys = jax.random.split(key, 5)
    return {
        "positional_embedding": jax.random.normal(
            keys[0], (spacial_dim ** 2 + 1, embed_dim), jnp.float32
        ) / embed_dim ** 0.5,
        "q_proj": L.init_linear(keys[1], embed_dim, embed_dim, std),
        "k_proj": L.init_linear(keys[2], embed_dim, embed_dim, std),
        "v_proj": L.init_linear(keys[3], embed_dim, embed_dim, std),
        "c_proj": L.init_linear(keys[4], embed_dim, output_dim, std),
    }


def apply_attention_pool(p, x, num_heads):
    """x: [B, H, W, C] -> [B, output_dim].

    Mean token prepended, learned positional embedding, one MHA step with
    separate q/k/v projections; the query row 0 (the mean token) is the
    pooled output (reference ``:91-117``).
    """
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean_tok = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)

    q = L.linear(p["q_proj"], tokens[:, :1, :])  # only the mean token
    k = L.linear(p["k_proj"], tokens)
    v = L.linear(p["v_proj"], tokens)
    head_dim = C // num_heads

    def heads(t):
        return t.reshape(B, t.shape[1], num_heads, head_dim).transpose(
            0, 2, 1, 3
        )

    qh = heads(q) * jnp.asarray(head_dim ** -0.5, q.dtype)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", qh, heads(k),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", weights, heads(v),
                     precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0, :]
    return L.linear(p["c_proj"], out)


# ---------------------------------------------------------------------------
# ModifiedResNet
# ---------------------------------------------------------------------------

def init_modified_resnet(key, layers, output_dim, width=64,
                         input_resolution=224, std=0.02):
    keys = jax.random.split(key, 8)
    p = {
        "conv1": L.init_conv(keys[0], 3, 3, width // 2, std=std),
        "bn1": L.init_batch_norm(width // 2),
        "conv2": L.init_conv(keys[1], 3, width // 2, width // 2, std=std),
        "bn2": L.init_batch_norm(width // 2),
        "conv3": L.init_conv(keys[2], 3, width // 2, width, std=std),
        "bn3": L.init_batch_norm(width),
    }
    inplanes = width
    for stage, (planes_mult, n_blocks, kidx) in enumerate(
        [(1, layers[0], 3), (2, layers[1], 4), (4, layers[2], 5),
         (8, layers[3], 6)]
    ):
        planes = width * planes_mult
        stride = 1 if stage == 0 else 2
        bkeys = jax.random.split(keys[kidx], n_blocks)
        blocks = [init_bottleneck(bkeys[0], inplanes, planes, stride, std)]
        inplanes = planes * 4
        for j in range(1, n_blocks):
            blocks.append(init_bottleneck(bkeys[j], inplanes, planes, 1, std))
        p[f"layer{stage + 1}"] = blocks
    embed_dim = width * 32
    p["attnpool"] = init_attention_pool(
        keys[7], input_resolution // 32, embed_dim, output_dim, std
    )
    return p


def apply_modified_resnet(p, x, layers, num_heads, bn: BNState,
                          path="visual/resnet"):
    """x: [B, H, W, 3] -> [B, output_dim]."""
    for i in (1, 2, 3):
        x = jax.nn.relu(
            bn(
                p[f"bn{i}"],
                L.conv2d(p[f"conv{i}"], x, stride=2 if i == 1 else 1,
                         padding=1),
                f"{path}/bn{i}",
            )
        )
    x = _avg_pool(x, 2)
    for stage in range(4):
        stride = 1 if stage == 0 else 2
        for j, blk in enumerate(p[f"layer{stage + 1}"]):
            s = stride if j == 0 else 1
            x = apply_bottleneck(
                blk, x, s, bn, f"{path}/layer{stage + 1}/{j}"
            )
    return apply_attention_pool(p["attnpool"], x, num_heads)
