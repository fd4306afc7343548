"""Experimental module families from the reference model zoo.

The ~8 config-gated plug-in families that are [off] in all released
MS-CLIP-S configs but present in the reference code (SURVEY.md §2.3) —
capability surface for ablations:

* Houlsby adapters        (``ADAPTER_FLAG``; reference ``:819-833,989-991``)
* CvT depthwise conv      outside the block (``CVT_IN_V``; ``:835-917,
  992-1011``) and inside on q/k/v (``CVT_INSIDE*``; ``:300-314,599-606``)
* Container conv-mixing   (``CONTAINER_IN_V``; ``:324-343,516-533,740-741``)
* ConViT gated positional attention (``CONVIT_IN_V``; ``:316-322,446-459,
  493-514,731-732``)
* LoRA low-rank q/k/v/fc adapters with optional MoE gating
  (``LORA_ATTN_DIM``; ``:345-428,548-581,665-685``)
* Gumbel dual-branch shared/specific blocks (``GUMBEL_SELECT``;
  ``:943-987,2877-2935``)

All are pure functions over the same param-pytree style as the core
layers; ``ExtSpec`` carries the static config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from .stem import BNState


@dataclass(frozen=True)
class ExtSpec:
    """Static switches for the experimental families (CUSTOM.* keys)."""

    # Houlsby adapters
    adapter_flag: bool = False
    adapter_dim: int = 0
    adapter_layers: Tuple[int, ...] = ()

    # CvT
    cvt_in_v: bool = False
    cvt_inside: bool = False
    cvt_layers: Tuple[int, ...] = ()
    cvt_kernel: int = 3
    cvt_stride: int = 1
    cvt_pad: int = 1
    cvt_res: bool = False
    cvt_n_dwc: int = 1  # THREE_DWC_IN_CVT / TWO_DWC_IN_CVT
    cvt_inside_q: bool = False
    cvt_inside_k: bool = False
    cvt_inside_v: bool = False

    # Container
    container_in_v: bool = False
    container_kernel: int = 3
    container_stride: int = 1
    container_pad: int = 1

    # ConViT
    convit_in_v: bool = False
    convit_layers: Tuple[int, ...] = ()
    convit_local_strength: float = 1.0

    # LoRA
    lora_attn_dim: int = 0
    lora_attn_alpha: float = 0.0
    lora_add_where: str = "v0"  # v0: q+v | v1: +k | v2: +k +fc
    lora_moe: int = 0
    lora_moe_act: str = "linear"
    lora_moe_lambda: float = 1.0
    lora_moe_softmax: int = 0
    lora_moe_group: int = 1

    # Gumbel NAS dual branch
    gumbel_select: bool = False
    gumbel_addtwo: bool = False

    def layer_has(self, which: str, modality: str, layer_idx: int) -> bool:
        if which == "adapter":
            if not self.adapter_flag:
                return False
            return not self.adapter_layers or layer_idx in self.adapter_layers
        if which == "cvt":
            if not (self.cvt_in_v and modality == "visual"):
                return False
            return not self.cvt_layers or layer_idx in self.cvt_layers
        if which == "convit":
            if not (self.convit_in_v and modality == "visual"):
                return False
            return not self.convit_layers or layer_idx in self.convit_layers
        if which == "container":
            return self.container_in_v and modality == "visual"
        if which == "lora":
            return self.lora_attn_dim > 0
        raise KeyError(which)

    @property
    def any_active(self) -> bool:
        return (
            self.adapter_flag or self.cvt_in_v or self.container_in_v
            or self.convit_in_v or self.lora_attn_dim > 0
            or self.gumbel_select
        )


def ext_spec_from_custom(custom) -> ExtSpec:
    g = lambda k, d: custom.get(k, d)
    n_dwc = 3 if g("THREE_DWC_IN_CVT", False) else (
        2 if g("TWO_DWC_IN_CVT", False) else 1
    )
    return ExtSpec(
        adapter_flag=g("ADAPTER_FLAG", False),
        adapter_dim=g("ADAPTER_ATTN_DIM", 0),
        adapter_layers=tuple(g("ADAPTER_LAYERS", [])),
        cvt_in_v=g("CVT_IN_V", False),
        cvt_inside=g("CVT_INSIDE", False),
        cvt_layers=tuple(g("CVT_LAYERS", [])),
        cvt_kernel=g("CVT_V_KERNEL", 3) or 3,
        cvt_stride=g("CVT_V_STRIDE", 1) or 1,
        cvt_pad=g("CVT_V_PAD", 1) if g("CVT_V_PAD", 1) is not False else 1,
        cvt_res=g("CVT_V_RES", False),
        cvt_n_dwc=n_dwc,
        cvt_inside_q=g("CVT_INSIDE_Q", False),
        cvt_inside_k=g("CVT_INSIDE_K", False),
        cvt_inside_v=g("CVT_INSIDE_V", False),
        container_in_v=g("CONTAINER_IN_V", False),
        container_kernel=g("CONTAINER_V_KERNEL", 3),
        container_stride=g("CONTAINER_V_STRIDE", 1),
        container_pad=g("CONTAINER_V_PAD", 1),
        convit_in_v=g("CONVIT_IN_V", False),
        convit_layers=tuple(g("CONVIT_LAYERS", [])),
        convit_local_strength=g("CONVIT_LOCAL_STRENGTH", 1),
        lora_attn_dim=g("LORA_ATTN_DIM", 0) if g("LORA_OPEN", False) or
        g("LORA_ATTN_DIM", 0) else 0,
        lora_attn_alpha=g("LORA_ATTN_ALPHA", 0),
        lora_add_where=g("LORA_WHERE_ADD", "v0"),
        lora_moe=g("LORA_MOE", 0),
        lora_moe_act=g("LORA_MOE_ACT", "linear"),
        lora_moe_lambda=g("LORA_MOE_LAMBDA", 1.0),
        lora_moe_softmax=g("LORA_MOE_SOFTMAX", 0),
        lora_moe_group=g("LORA_MOE_GROUP", 1),
        gumbel_select=g("GUMBEL_SELECT", False),
        gumbel_addtwo=g("GUMBEL_ADDTWO", False),
    )


# ---------------------------------------------------------------------------
# token-grid depthwise conv helper (shared by CvT / Container / LoRA-local)
# ---------------------------------------------------------------------------

def grid_dwconv_bn(p, tokens_grid, grid_hw, bn: BNState, path, kernel,
                   stride, pad, n_stages=1):
    """Apply (dwconv + BN) x n to grid tokens ``[B, HW, C]``."""
    B, N, C = tokens_grid.shape
    H, W = grid_hw
    x = tokens_grid.reshape(B, H, W, C)
    for i in range(n_stages):
        suffix = f"_{i + 1}" if n_stages > 1 else ""
        x = L.conv2d(p[f"conv{suffix}"], x, stride=stride, padding=pad,
                     groups=C)
        x = bn(p[f"bn{suffix}"], x, f"{path}/bn{suffix}")
    return x.reshape(B, -1, C)


def tokens_dwconv_keep_cls(p, tokens, grid_hw, bn, path, kernel, stride,
                           pad, n_stages=1):
    """dwconv the grid part of a CLS-first token sequence; CLS unchanged
    (reference ``cvt_dw_forward`` ``:583-590``)."""
    cls_tok = tokens[:, :1, :]
    grid = grid_dwconv_bn(p, tokens[:, 1:, :], grid_hw, bn, path, kernel,
                          stride, pad, n_stages)
    return jnp.concatenate([cls_tok, grid], axis=1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_adapter(key, d_model, adapter_dim, std=0.02):
    k1, k2 = jax.random.split(key)
    return {
        "down_proj": L.init_linear(k1, d_model, adapter_dim, std),
        "up_proj": L.init_linear(k2, adapter_dim, d_model, std),
    }


def init_dwconv_bn(key, dim, kernel, n_stages=1, std=0.02):
    p = {}
    keys = jax.random.split(key, n_stages)
    for i in range(n_stages):
        suffix = f"_{i + 1}" if n_stages > 1 else ""
        p[f"conv{suffix}"] = L.init_conv(keys[i], kernel, dim, dim,
                                         groups=dim, std=std)
        p[f"bn{suffix}"] = L.init_batch_norm(dim)
    return p


def init_lora(key, ext: ExtSpec, dim):
    keys = jax.random.split(key, 8)
    r = ext.lora_attn_dim

    def pair(k1, k2):
        return {
            "a": L.trunc_normal(k1, (dim, r), 0.02),  # normal in torch
            "b": jnp.zeros((r, dim), jnp.float32),
        }

    p = {"q": pair(keys[0], keys[1]), "v": pair(keys[2], keys[3])}
    if ext.lora_add_where in ("v1", "v2"):
        p["k"] = pair(keys[4], keys[5])
    if ext.lora_add_where == "v2":
        p["fc"] = pair(keys[6], keys[7])
    if ext.lora_moe == 1:
        n_expert = r // ext.lora_moe_group
        p["q_moe"] = L.trunc_normal(jax.random.fold_in(key, 101),
                                    (dim, n_expert), 0.02)
        p["v_moe"] = L.trunc_normal(jax.random.fold_in(key, 102),
                                    (dim, n_expert), 0.02)
    return p


def init_convit(num_heads, local_strength=1.0):
    """ConViT positional projection with the locality initialization
    (reference ``convit_local_init`` ``:446-459``)."""
    import numpy as np

    w = np.zeros((3, num_heads), np.float32)  # JAX [in, out] layout
    kernel_size = int(num_heads ** 0.5)
    center = (kernel_size - 1) / 2 if kernel_size % 2 == 0 \
        else kernel_size // 2
    for h1 in range(kernel_size):
        for h2 in range(kernel_size):
            position = h1 + kernel_size * h2
            w[2, position] = -1
            w[1, position] = 2 * (h1 - center)
            w[0, position] = 2 * (h2 - center)
    w *= local_strength
    return {
        "pos_proj": {"w": jnp.asarray(w),
                     "b": jnp.zeros((num_heads,), jnp.float32)},
        "gating": jnp.ones((num_heads,), jnp.float32),
    }


def init_container(key, dim, kernel, std=0.02):
    return {
        "conv": L.init_conv(key, kernel, dim, dim, groups=dim, std=std),
        "bn": L.init_batch_norm(dim),
        "gating": jnp.zeros((1,), jnp.float32),
    }


def init_block_extensions(key, ext: ExtSpec, d_model, num_heads, modality,
                          layer_idx, std=0.02):
    """Extension params for one block; {} when nothing is active here."""
    p = {}
    keys = jax.random.split(key, 6)
    if ext.layer_has("adapter", modality, layer_idx):
        p["adapter_attn"] = init_adapter(keys[0], d_model, ext.adapter_dim,
                                         std)
        p["adapter_ffn"] = init_adapter(keys[1], d_model, ext.adapter_dim,
                                        std)
    if ext.layer_has("cvt", modality, layer_idx) and not ext.cvt_inside:
        p["cvt_dw"] = init_dwconv_bn(keys[2], d_model, ext.cvt_kernel,
                                     ext.cvt_n_dwc, std)
        if ext.cvt_res:
            p["ln_cvt"] = L.init_layer_norm(d_model)
    if ext.layer_has("cvt", modality, layer_idx) and ext.cvt_inside:
        cvt = {}
        for name, on in (("q", ext.cvt_inside_q), ("k", ext.cvt_inside_k),
                         ("v", ext.cvt_inside_v)):
            if on:
                cvt[name] = init_dwconv_bn(
                    jax.random.fold_in(keys[2], hash(name) % 97), d_model,
                    ext.cvt_kernel, 1, std,
                )
        p["cvt_inside"] = cvt
    if ext.layer_has("convit", modality, layer_idx):
        p["convit"] = init_convit(num_heads, ext.convit_local_strength)
    if ext.layer_has("container", modality, layer_idx):
        p["container"] = init_container(keys[3], d_model,
                                        ext.container_kernel, std)
    if ext.layer_has("lora", modality, layer_idx):
        p["lora"] = init_lora(keys[4], ext, d_model)
    if ext.gumbel_select:
        p["specific"] = L.init_block(keys[5], d_model, std)
    return p


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def apply_adapter(p, x):
    """down -> QuickGELU -> up (reference ``:824-833``)."""
    return L.linear(p["up_proj"], L.quick_gelu(L.linear(p["down_proj"], x)))


def lora_delta(ext: ExtSpec, pair, x, moe_w=None):
    """Low-rank delta with optional grouped MoE gating (reference
    ``adapter_forward`` ``:548-581``)."""
    scale = ext.lora_attn_alpha / ext.lora_attn_dim
    result = x @ pair["a"].astype(x.dtype)  # [B, L, r]
    if moe_w is not None:
        g = x @ moe_w.astype(x.dtype)  # [B, L, n_expert]
        if ext.lora_moe_act == "sigmoid":
            g = jax.nn.sigmoid(g)
        elif ext.lora_moe_act == "tanh":
            g = jnp.tanh(g)
        elif ext.lora_moe_act == "relu":
            g = jax.nn.relu(g)
        g = g * ext.lora_moe_lambda
        if ext.lora_moe_softmax == 1:
            g = jax.nn.softmax(g, axis=-1)
        B, Lq, r = result.shape
        grouped = result.reshape(B, Lq, r // ext.lora_moe_group,
                                 ext.lora_moe_group)
        result = (grouped * g[..., None]).reshape(B, Lq, r)
    return (result @ pair["b"].astype(x.dtype)) * scale


def convit_rel_indices(n_patches: int):
    """[N, N, 3] relative-position features (dx, dy, d^2); reference
    ``get_rel_indices`` ``:535-546``."""
    import numpy as np

    img = int(n_patches ** 0.5)
    ind = np.arange(img)[None, :] - np.arange(img)[:, None]  # [img, img]
    indx = np.tile(ind, (img, img))
    indy = np.repeat(np.repeat(ind, img, axis=0), img, axis=1)
    indd = indx ** 2 + indy ** 2
    return jnp.asarray(
        np.stack([indx, indy, indd], axis=-1).astype(np.float32)
    )


def convit_blend(p, weights, grid_hw):
    """Blend content attention with the gated positional attention
    (reference ``convit_forward`` ``:493-514``). weights: [B, H, L, L]
    (post-softmax), L = 1 + H*W."""
    B, n_head, Lq, _ = weights.shape
    N = Lq - 1
    rel = convit_rel_indices(N)  # [N, N, 3]
    pos = rel @ p["pos_proj"]["w"].astype(jnp.float32) \
        + p["pos_proj"]["b"].astype(jnp.float32)  # [N, N, H]
    pos = jax.nn.softmax(pos, axis=1)  # over keys (dim=-1 pre-permute)
    pos = pos.transpose(2, 0, 1)[None]  # [1, H, N, N]
    pos = jnp.pad(pos, ((0, 0), (0, 0), (1, 0), (1, 0)))  # cls row/col = 0
    gate = jax.nn.sigmoid(p["gating"].astype(jnp.float32))[None, :, None,
                                                           None]
    blended = (1.0 - gate) * weights.astype(jnp.float32) + gate * pos
    return blended / blended.sum(axis=-1, keepdims=True)


def container_mix(p, attn_output, v_tokens, grid_hw, bn: BNState, path,
                  stride=1, pad=1):
    """Mix attention output with a depthwise conv of the value tokens
    (reference ``container_forward`` ``:516-533``)."""
    cls_fea = attn_output[:, :1, :]
    conv_out = grid_dwconv_bn(
        p, v_tokens[:, 1:, :], grid_hw, bn, path,
        kernel=None, stride=stride, pad=pad,
    )
    conv_out = jnp.concatenate([cls_fea, conv_out], axis=1)
    gate = jax.nn.sigmoid(p["gating"].astype(attn_output.dtype))
    return gate * attn_output + (1.0 - gate) * conv_out


def extended_attention(p, ext_p, x, n_head, ext: ExtSpec, modality,
                       layer_idx, grid_hw, mask=None,
                       bn: Optional[BNState] = None, path=""):
    """Attention with the config-gated plug-ins, ordered exactly as the
    reference ``Attention_CUST.forward`` (``:592-755``)."""
    if bn is None:
        bn = BNState(training=False)
    B, Lq, E = x.shape
    head_dim = E // n_head

    query = key = value = x
    cvt = ext_p.get("cvt_inside")
    if cvt:
        if "q" in cvt:
            query = tokens_dwconv_keep_cls(
                cvt["q"], query, grid_hw, bn, f"{path}/cvt_q",
                ext.cvt_kernel, ext.cvt_stride, ext.cvt_pad)
        if "k" in cvt:
            key = tokens_dwconv_keep_cls(
                cvt["k"], key, grid_hw, bn, f"{path}/cvt_k",
                ext.cvt_kernel, ext.cvt_stride, ext.cvt_pad)
        if "v" in cvt:
            value = tokens_dwconv_keep_cls(
                cvt["v"], value, grid_hw, bn, f"{path}/cvt_v",
                ext.cvt_kernel, ext.cvt_stride, ext.cvt_pad)

    w_q, w_k, w_v = jnp.split(p["qkv_w"].astype(x.dtype), 3, axis=1)
    b_q, b_k, b_v = jnp.split(p["qkv_b"].astype(x.dtype), 3)
    q = query @ w_q + b_q
    k = key @ w_k + b_k
    v = value @ w_v + b_v

    lora = ext_p.get("lora")
    if lora is not None:
        lora_input = query
        q = q + lora_delta(ext, lora["q"], lora_input, lora.get("q_moe"))
        v = v + lora_delta(ext, lora["v"], lora_input, lora.get("v_moe"))
        if ext.lora_add_where in ("v1", "v2"):
            k = k + lora_delta(ext, lora["k"], lora_input)

    def heads(t):
        return t.reshape(B, Lq, n_head, head_dim).transpose(0, 2, 1, 3)

    qh = heads(q) * jnp.asarray(head_dim ** -0.5, x.dtype)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", qh, heads(k),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1)

    if "convit" in ext_p:
        weights = convit_blend(ext_p["convit"], weights, grid_hw)

    weights = weights.astype(x.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", weights, heads(v),
                     precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)

    if "container" in ext_p:
        out = container_mix(ext_p["container"], out, v, grid_hw, bn,
                            f"{path}/container",
                            stride=ext.container_stride,
                            pad=ext.container_pad)

    fc_delta = None
    if lora is not None and ext.lora_add_where == "v2":
        fc_delta = lora_delta(ext, lora["fc"], out)

    out = L.linear({"w": p["out_w"], "b": p["out_b"]}, out)
    if fc_delta is not None:
        out = out + fc_delta
    return out


def extended_block(blk, ext_p, x, n_head, ext: ExtSpec, modality,
                   layer_idx, grid_hw, mask=None, eps=1e-12,
                   bn: Optional[BNState] = None, path="", action=None):
    """Residual block with the plug-ins, ordered as the reference
    ``ResidualAttentionBlock.forward`` (``:941-1033``)."""
    if bn is None:
        bn = BNState(training=False)

    def attn_fn(params, t):
        return extended_attention(
            params, ext_p, t, n_head, ext, modality, layer_idx, grid_hw,
            mask=mask, bn=bn, path=path,
        )

    if ext.gumbel_select:
        assert action is not None
        spec_blk = ext_p["specific"]

        def shared_path(t):
            t = t + attn_fn(blk["attn"], L.layer_norm(blk["ln_1"], t, eps))
            return t + L.mlp(blk["mlp"], L.layer_norm(blk["ln_2"], t, eps))

        def specific_path(t):
            t = t + extended_attention(
                spec_blk["attn"], {}, L.layer_norm(spec_blk["ln_1"], t, eps),
                n_head, ext, modality, layer_idx, grid_hw, mask=mask, bn=bn,
                path=f"{path}/specific",
            )
            return t + L.mlp(spec_blk["mlp"],
                             L.layer_norm(spec_blk["ln_2"], t, eps))

        a = action.astype(x.dtype)
        if ext.gumbel_addtwo:
            return shared_path(x) * a[0] + specific_path(x) * a[1]
        # hard select (straight-through one-hot action)
        return jnp.where(a[0] > a[1], shared_path(x) * a[0],
                         specific_path(x) * a[1])

    if "adapter_attn" in ext_p:
        x = x + apply_adapter(
            ext_p["adapter_attn"],
            attn_fn(blk["attn"], L.layer_norm(blk["ln_1"], x, eps)),
        )
        x = x + apply_adapter(
            ext_p["adapter_ffn"],
            L.mlp(blk["mlp"], L.layer_norm(blk["ln_2"], x, eps)),
        )
        return x

    if "cvt_dw" in ext_p and modality == "visual":
        if ext.cvt_res:
            conv_tokens = tokens_dwconv_keep_cls(
                ext_p["cvt_dw"], x, grid_hw, bn, f"{path}/cvt_dw",
                ext.cvt_kernel, ext.cvt_stride, ext.cvt_pad, ext.cvt_n_dwc,
            )
            x = L.layer_norm(ext_p["ln_cvt"], x + conv_tokens, eps)
        else:
            x = tokens_dwconv_keep_cls(
                ext_p["cvt_dw"], x, grid_hw, bn, f"{path}/cvt_dw",
                ext.cvt_kernel, ext.cvt_stride, ext.cvt_pad, ext.cvt_n_dwc,
            )

    x = x + attn_fn(blk["attn"], L.layer_norm(blk["ln_1"], x, eps))
    x = x + L.mlp(blk["mlp"], L.layer_norm(blk["ln_2"], x, eps))
    return x
