"""Cross-attention modules ([off] families).

* ``cross_attention_diffdim``   — MHA with separate q/k/v projections and
  different input dims (reference ``CrossAttentionLayer_Diffdim``
  ``:1078-1184``); used by the Perceiver blocks and the bottom2top
  cross-attention lateral path.
* ``residual_cross_block``      — Perceiver-style residual block: query
  tokens attend to a (normed) latent/context set (reference
  ``ResidualCrossAttentionBlock`` ``:1036-1075``).
* ``window_cross_attention``    — windowed top<->bottom lateral fusion with
  relative-position bias and sliding-window unfold (reference
  ``CrossAttentionLayer_Window`` ``:1187-1536``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .stem import BNState


# ---------------------------------------------------------------------------
# Diffdim cross attention
# ---------------------------------------------------------------------------

def init_cross_attention_diffdim(key, input_q_dim, input_k_dim, input_v_dim,
                                 output_qk_dim, output_v_dim, head_dim,
                                 add_linear=False):
    import math

    keys = jax.random.split(key, 4)

    def xavier(k, d_in, d_out):
        limit = math.sqrt(6.0 / (d_in + d_out))
        return jax.random.uniform(k, (d_in, d_out), jnp.float32, -limit,
                                  limit)

    p = {
        "q_w": xavier(keys[0], input_q_dim, output_qk_dim),
        "q_b": jnp.zeros((output_qk_dim,), jnp.float32),
        "k_w": xavier(keys[1], input_k_dim, output_qk_dim),
        "k_b": jnp.zeros((output_qk_dim,), jnp.float32),
        "v_w": xavier(keys[2], input_v_dim, output_v_dim),
        "v_b": jnp.zeros((output_v_dim,), jnp.float32),
    }
    if add_linear:
        p["out"] = L.init_linear(keys[3], output_v_dim, output_v_dim)
    return p


def cross_attention_diffdim(p, query, key, value, head_dim, mask=None):
    """query [B, Lq, Dq], key [B, Lk, Dk], value [B, Lk, Dv] ->
    [B, Lq, output_v_dim]."""
    B, Lq, _ = query.shape
    Lk = key.shape[1]
    q = query @ p["q_w"].astype(query.dtype) + p["q_b"].astype(query.dtype)
    k = key @ p["k_w"].astype(key.dtype) + p["k_b"].astype(key.dtype)
    v = value @ p["v_w"].astype(value.dtype) + p["v_b"].astype(value.dtype)
    n_head = q.shape[-1] // head_dim

    def heads(t, ln):
        return t.reshape(B, ln, n_head, -1).transpose(0, 2, 1, 3)

    qh = heads(q, Lq) * jnp.asarray(head_dim ** -0.5, q.dtype)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", qh, heads(k, Lk),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", weights, heads(v, Lk),
                     precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, -1)
    if "out" in p:
        out = L.linear(p["out"], out)
    return out


# ---------------------------------------------------------------------------
# Perceiver residual cross block
# ---------------------------------------------------------------------------

def init_residual_cross_block(key, d_model, std=0.02):
    p = L.init_block(key, d_model)
    # qkv_w of Attention_CUST is xavier-uniform; reuse the same recipe
    import math

    limit = math.sqrt(6.0 / (d_model + 3 * d_model))
    p["attn"]["qkv_w"] = jax.random.uniform(
        jax.random.fold_in(key, 7), (d_model, 3 * d_model), jnp.float32,
        -limit, limit,
    )
    p["norm_context"] = L.init_layer_norm(d_model)
    return p


def residual_cross_block(p, x, context, n_head, mask=None, eps=1e-12):
    """x attends to ``norm_context(context)`` then MLP (reference
    ``:1071-1075``). Uses the fused qkv weight split into q / kv parts,
    exactly like Attention_CUST's encoder-decoder path (``:614-636``)."""
    B, Lq, E = x.shape
    Lk = context.shape[1]
    head_dim = E // n_head

    query = L.layer_norm(p["ln_1"], x, eps)
    ctx = L.layer_norm(p["norm_context"], context, eps)

    w_q, w_k, w_v = jnp.split(p["attn"]["qkv_w"].astype(x.dtype), 3, axis=1)
    b_q, b_k, b_v = jnp.split(p["attn"]["qkv_b"].astype(x.dtype), 3)
    q = query @ w_q + b_q
    k = ctx @ w_k + b_k
    v = ctx @ w_v + b_v

    def heads(t, ln):
        return t.reshape(B, ln, n_head, head_dim).transpose(0, 2, 1, 3)

    qh = heads(q, Lq) * jnp.asarray(head_dim ** -0.5, x.dtype)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", qh, heads(k, Lk),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", weights, heads(v, Lk),
                     precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
    out = L.linear({"w": p["attn"]["out_w"], "b": p["attn"]["out_b"]}, out)

    x = x + out
    x = x + L.mlp(p["mlp"], L.layer_norm(p["ln_2"], x, eps))
    return x


# ---------------------------------------------------------------------------
# Windowed top<->bottom cross attention (lateral fusion variant)
# ---------------------------------------------------------------------------

def relative_position_index(window_q: int, window_kv: int) -> np.ndarray:
    """Pairwise relative-position index (reference ``:1239-1256``,
    including its exact offset/scale arithmetic)."""
    kv = np.stack(np.meshgrid(np.arange(window_kv), np.arange(window_kv),
                              indexing="ij"))
    kv_flat = kv.reshape(2, -1)
    q = np.stack(np.meshgrid(np.arange(window_q), np.arange(window_q),
                             indexing="ij"))
    q_flat = q.reshape(2, -1)
    rel = q_flat[:, :, None] - kv_flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window_kv - 1
    rel[:, :, 1] += window_kv - 1
    rel[:, :, 0] *= window_kv + window_q - 1
    return rel.sum(-1)


def init_window_cross_attention(key, input_q_dim, input_kv_dim,
                                output_qk_dim, output_v_dim, window_q,
                                window_kv, num_heads, dwconv_kv=True,
                                add_linear=True, output_dim=0,
                                relative_pos=True):
    import math

    keys = jax.random.split(key, 8)
    output_dim = output_dim or output_v_dim
    limit = math.sqrt(6.0 / (input_q_dim + output_qk_dim))
    p = {
        "q_w": jax.random.uniform(keys[0], (input_q_dim, output_qk_dim),
                                  jnp.float32, -limit, limit),
        "q_b": jnp.zeros((output_qk_dim,), jnp.float32),
        "bottom_dw_conv": L.init_conv(keys[1], 3, input_q_dim, input_q_dim,
                                      groups=input_q_dim),
        "bottom_dw_bn": L.init_batch_norm(input_q_dim),
        "ln_adapt": L.init_layer_norm(output_dim),
    }
    if dwconv_kv:
        p["k_dwconv"] = L.init_conv(keys[2], 3, input_kv_dim, input_kv_dim,
                                    groups=input_kv_dim)
        p["k_dwbn"] = L.init_batch_norm(input_kv_dim)
        p["v_dwconv"] = L.init_conv(keys[3], 3, input_kv_dim, input_kv_dim,
                                    groups=input_kv_dim)
        p["v_dwbn"] = L.init_batch_norm(input_kv_dim)
    else:
        lk = math.sqrt(6.0 / (input_kv_dim + output_qk_dim))
        p["k_w"] = jax.random.uniform(keys[2], (input_kv_dim, output_qk_dim),
                                      jnp.float32, -lk, lk)
        p["k_b"] = jnp.zeros((output_qk_dim,), jnp.float32)
        lv = math.sqrt(6.0 / (input_kv_dim + output_v_dim))
        p["v_w"] = jax.random.uniform(keys[3], (input_kv_dim, output_v_dim),
                                      jnp.float32, -lv, lv)
        p["v_b"] = jnp.zeros((output_v_dim,), jnp.float32)
    if add_linear:
        p["out"] = L.init_linear(keys[4], output_v_dim, output_dim)
    if relative_pos:
        table_len = (window_q + window_kv - 1) * (window_q + window_kv - 1)
        p["rel_pos_table"] = L.trunc_normal(
            keys[5], (table_len, num_heads), 0.02
        )
    return p


def _window_partition(x, ws):
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse(x, ws, H, W):
    """[B*nW, ws*ws, C] -> [B, H, W, C]."""
    C = x.shape[-1]
    B = x.shape[0] // ((H // ws) * (W // ws))
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _unfold(x, k, stride, pad):
    """torch.nn.Unfold over NHWC -> [B, nW, k*k, C] (window-major)."""
    B, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out_h = (H + 2 * pad - k) // stride + 1
    out_w = (W + 2 * pad - k) // stride + 1
    rows = (jnp.arange(out_h) * stride)[:, None] + jnp.arange(k)[None, :]
    cols = (jnp.arange(out_w) * stride)[:, None] + jnp.arange(k)[None, :]
    x = x[:, rows]           # [B, out_h, k, W+2p, C]
    x = x[:, :, :, cols]     # [B, out_h, k, out_w, k, C]
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, out_h, out_w, k, k, C]
    return x.reshape(B, out_h * out_w, k * k, C)


def window_cross_attention(p, top, bottom_tokens, grid_hw, *, num_heads,
                           head_qk_dim, head_v_dim, window_q, window_kv,
                           dwconv_kv, slide_window, slide_kernel, slide_pad,
                           slide_stride, rel_pos_table,
                           rel_pos_index, bn: BNState, path,
                           eps=1e-12):
    """Windowed lateral fusion (reference ``forward`` ``:1514-1536`` +
    ``cross_attn`` ``:1369-1512``): bottom grid tokens (queries, 1x1
    windows) attend to aligned windows of the top feature map; fused like
    the plain lateral adapter but with a zeroed CLS injection."""
    B = bottom_tokens.shape[0]
    H, W = grid_hw
    Cq = bottom_tokens.shape[-1]

    cls_tok = bottom_tokens[:, :1, :]
    grid = bottom_tokens[:, 1:, :].reshape(B, H, W, Cq)

    # bottom residual path: dwconv + BN
    bottom_out = L.conv2d(p["bottom_dw_conv"], grid, stride=1, padding=1,
                          groups=Cq)
    bottom_out = bn(p["bottom_dw_bn"], bottom_out, f"{path}/bottom_dw_bn")
    bottom_out = jnp.concatenate(
        [cls_tok, bottom_out.reshape(B, H * W, Cq)], axis=1
    )

    # q: project bottom grid
    q = grid @ p["q_w"].astype(grid.dtype) + p["q_b"].astype(grid.dtype)
    q = q * jnp.asarray(head_qk_dim ** -0.5, q.dtype)  # [B, H, W, Cqk]

    if dwconv_kv:
        k = L.conv2d(p["k_dwconv"], top, stride=1, padding=1,
                     groups=top.shape[-1])
        k = bn(p["k_dwbn"], k, f"{path}/k_dwbn")
        v = L.conv2d(p["v_dwconv"], top, stride=1, padding=1,
                     groups=top.shape[-1])
        v = bn(p["v_dwbn"], v, f"{path}/v_dwbn")
    else:
        k = top @ p["k_w"].astype(top.dtype) + p["k_b"].astype(top.dtype)
        v = top @ p["v_w"].astype(top.dtype) + p["v_b"].astype(top.dtype)

    q_win = _window_partition(q, window_q)  # [B*nW, wq^2, Cqk]
    mask = None
    if slide_window:
        k_win = _unfold(k, slide_kernel, slide_stride, slide_pad)
        v_win = _unfold(v, slide_kernel, slide_stride, slide_pad)
        nW = k_win.shape[1]
        k_win = k_win.reshape(B * nW, window_kv * window_kv, -1)
        v_win = v_win.reshape(B * nW, window_kv * window_kv, -1)
        if slide_pad != 0:
            ones = jnp.ones((1, k.shape[1], k.shape[2], 1), jnp.float32)
            valid = _unfold(ones, slide_kernel, slide_stride, slide_pad)
            valid = valid.reshape(1, nW, 1, window_kv * window_kv)
            mask = jnp.where(valid > 0, 0.0, -jnp.inf)
            mask = jnp.broadcast_to(
                mask, (B, nW, 1, window_kv * window_kv)
            ).reshape(B * nW, 1, window_kv * window_kv)[:, None]
    else:
        k_win = _window_partition(k, window_kv)
        v_win = _window_partition(v, window_kv)

    def heads(t, hd):
        n, l, c = t.shape
        return t.reshape(n, l, num_heads, hd).transpose(0, 2, 1, 3)

    qh = heads(q_win, head_qk_dim)
    kh = heads(k_win, head_qk_dim)
    vh = heads(v_win, head_v_dim)
    scores = jnp.einsum(
        "nhld,nhmd->nhlm", qh, kh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if rel_pos_table is not None:
        bias = rel_pos_table[rel_pos_index.reshape(-1)].reshape(
            window_q * window_q, window_kv * window_kv, num_heads
        )
        scores = scores + bias.transpose(2, 0, 1)[None].astype(scores.dtype)
    if mask is not None:
        scores = scores + mask
    weights = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("nhlm,nhmd->nhld", weights, vh,
                     precision=jax.lax.Precision.HIGHEST)
    # [B*nW, nh, wq^2, hd] -> [B, H, W, nh*hd]
    out = out.transpose(0, 2, 1, 3).reshape(out.shape[0],
                                            window_q * window_q, -1)
    out = _window_reverse(out, window_q, H, W)
    out = out.reshape(B, H * W, -1)
    if "out" in p:
        out = L.linear(p["out"], out)

    t2b = jnp.concatenate([jnp.zeros_like(cls_tok), out], axis=1)
    fused = L.layer_norm(p["ln_adapt"], bottom_out + t2b, eps=eps)
    return top, fused
