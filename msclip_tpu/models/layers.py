"""Core functional layers (pure JAX, NHWC / batch-first).

Numeric-parity-critical semantics replicated from the reference model file
(``/root/reference/lib/models/clip_openai_pe_res_v1.py``):

* ``layer_norm``  — TF-style LN: statistics in fp32, eps *inside* the sqrt,
  default eps 1e-12, normalized value cast back to input dtype before the
  affine (reference ``:204-219``).
* ``quick_gelu``  — ``x * sigmoid(1.702 x)`` (reference ``:222-224``).
* ``attention``   — fused-QKV multi-head attention with ``head_dim**-0.5``
  query scaling and additive float mask (reference ``Attention_CUST.forward``
  ``:592-755``, plain path).
* ``transformer_block`` — pre-LN residual block
  ``x += attn(ln_1(x)); x += mlp(ln_2(x))`` (reference ``:1027-1028``),
  MLP = c_fc(4x) -> QuickGELU -> c_proj (reference ``:794-798``).
* ``batch_norm``  — inference mode folds running stats
  (eval-parity path); training mode computes batch statistics with an
  optional cross-replica ``axis_name`` psum (the TPU-native answer to
  sync-BN).

All params are stored fp32; ``x``'s dtype is the compute dtype (bf16 in
production). Weight layout is JAX-native: linear weights are ``[in, out]``
(``y = x @ W + b``), convs are HWIO.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """timm-style truncated normal: clipped to +-2 (absolute) like
    ``trunc_normal_(std=0.02)`` used throughout the reference."""
    lower, upper = -2.0 / max(std, 1e-12), 2.0 / max(std, 1e-12)
    return std * jax.random.truncated_normal(key, lower, upper, shape, dtype)


def init_linear(key, d_in, d_out, std=0.02, bias=True):
    p = {"w": trunc_normal(key, (d_in, d_out), std)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_layer_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_batch_norm(dim):
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def init_conv(key, k, c_in, c_out, groups=1, std=0.02):
    """HWIO conv kernel; ``c_in`` is the full input channel count."""
    return {"w": trunc_normal(key, (k, k, c_in // groups, c_out), std)}


def init_attention(key, dim, std=0.02):
    k1, k2 = jax.random.split(key)
    return {
        "qkv_w": trunc_normal(k1, (dim, 3 * dim), std),
        "qkv_b": jnp.zeros((3 * dim,), jnp.float32),
        "out_w": trunc_normal(k2, (dim, dim), std),
        "out_b": jnp.zeros((dim,), jnp.float32),
    }


def init_mlp(key, dim, hidden_mult=4, std=0.02):
    k1, k2 = jax.random.split(key)
    return {
        "c_fc": init_linear(k1, dim, dim * hidden_mult, std),
        "c_proj": init_linear(k2, dim * hidden_mult, dim, std),
    }


def init_block(key, dim, std=0.02):
    k1, k2 = jax.random.split(key)
    return {
        "attn": init_attention(k1, dim, std),
        "ln_1": init_layer_norm(dim),
        "mlp": init_mlp(k2, dim, 4, std),
        "ln_2": init_layer_norm(dim),
    }


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------

def layer_norm(p, x, eps=1e-12):
    """fp32-island LayerNorm, eps inside the sqrt (TF-style)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)
    return p["scale"].astype(dtype) * normed + p["bias"].astype(dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def linear(p, x):
    if "w_int8" in p:
        return _int8_linear(p, x)
    # HIGHEST keeps fp32 inputs in true fp32 on the MXU (the TPU default
    # decomposes fp32 matmuls to bf16 passes); bf16 inputs are unaffected.
    y = jnp.dot(x, p["w"].astype(x.dtype),
                precision=jax.lax.Precision.HIGHEST)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _int8_linear(p, x):
    """W8A8 GEMM (``models/quantize.py``): per-output-channel int8
    weights, dynamic per-token symmetric activation quant, int32
    accumulate on the MXU (2x the bf16 rate on v5e), fp32 dequant."""
    xf = x.astype(jnp.float32)
    s_a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_a = jnp.maximum(s_a, 1e-8)
    xq = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["w_int8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * s_a * p["w_scale"]).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def mlp(p, x):
    return linear(p["c_proj"], quick_gelu(linear(p["c_fc"], x)))


def attention(p, x, n_head, mask=None, use_pallas=False,
              pallas_interpret=False):
    """Multi-head self-attention, batch-first ``[B, L, E]``.

    Matches the reference's explicit bmm/softmax/bmm pipeline with the
    query pre-scaled by ``head_dim**-0.5``; logits are accumulated in fp32
    on the MXU via ``preferred_element_type``. With ``use_pallas`` the
    scores/softmax/context core runs as one fused Pallas kernel (scores
    never leave VMEM).
    """
    qkv = linear(_proj_params(p, "qkv"), x)  # [B, L, 3E]
    out = _attention_core(qkv, n_head, mask, use_pallas=use_pallas,
                          pallas_interpret=pallas_interpret)
    return linear(_proj_params(p, "out"), out)


def _attention_core(qkv, n_head, mask, use_pallas=False,
                    pallas_interpret=False):
    """``[B, L, 3E]`` fused-projection output -> ``[B, L, E]`` context."""
    if use_pallas:
        from ..ops.attention import fused_attention_qkv

        return fused_attention_qkv(qkv, n_head, mask,
                                   interpret=pallas_interpret)
    B, L, three_e = qkv.shape
    E = three_e // 3
    head_dim = E // n_head
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # head split WITHOUT transposing to [B, H, L, D]: the einsums
    # contract directly on the [B, L, H, D] layout, letting XLA fold
    # the head dimension into the GEMMs instead of materializing
    # transposed copies in HBM (~17% faster trunk on v5e).
    qh = q.reshape(B, L, n_head, head_dim) \
        * jnp.asarray(head_dim ** -0.5, qkv.dtype)
    kh = k.reshape(B, L, n_head, head_dim)
    vh = v.reshape(B, L, n_head, head_dim)
    scores = jnp.einsum(
        "blhd,bmhd->bhlm", qh, kh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", weights, vh,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, L, E)


def _proj_params(p, name):
    """Attention projection params for ``linear``: fp32/bf16 weight or
    the int8 pair when the block was quantized (models/quantize.py)."""
    if f"{name}_w_int8" in p:
        return {"w_int8": p[f"{name}_w_int8"],
                "w_scale": p[f"{name}_w_scale"], "b": p[f"{name}_b"]}
    return {"w": p[f"{name}_w"], "b": p[f"{name}_b"]}


def drop_path(rng, x, rate):
    """Stochastic depth on a residual branch (timm DropPath semantics:
    per-sample keep mask, output scaled by 1/keep_prob)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def _int8_matmul(xq, s, w_int8, w_scale, b, out_dtype):
    """Pre-quantized activations (int8 + per-token scales) x int8 weights,
    int32 MXU accumulate, fused fp32 dequant epilogue -> ``out_dtype``."""
    y = jax.lax.dot_general(
        xq, w_int8, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * s[..., None] * w_scale).astype(out_dtype)
    if b is not None:
        y = y + b.astype(out_dtype)
    return y


def _int8_block(p, x, n_head, mask, eps, use_pallas, pallas_interpret=False):
    """Pre-LN block over int8-quantized GEMMs with FUSED activation quant:
    ln_quant / gelu_quant (ops/quant.py) emit int8 directly in one VMEM
    pass, so the fp32 activation-quant chain that made the unfused W8A8
    path a wash (PARITY.md) never materializes. Attention core stays
    bf16."""
    from ..ops.quant import gelu_quant, ln_quant

    attn_p, mlp_p = p["attn"], p["mlp"]
    xq, s = ln_quant(x, p["ln_1"], eps, interpret=pallas_interpret)
    qkv = _int8_matmul(xq, s, attn_p["qkv_w_int8"], attn_p["qkv_w_scale"],
                       attn_p["qkv_b"], x.dtype)
    ctx = _attention_core(qkv, n_head, mask, use_pallas=use_pallas,
                          pallas_interpret=pallas_interpret)
    x = x + _int8_linear(
        {"w_int8": attn_p["out_w_int8"], "w_scale": attn_p["out_w_scale"],
         "b": attn_p["out_b"]}, ctx)
    hq, s2 = ln_quant(x, p["ln_2"], eps, interpret=pallas_interpret)
    mid = _int8_matmul(hq, s2, mlp_p["c_fc"]["w_int8"],
                       mlp_p["c_fc"]["w_scale"], mlp_p["c_fc"]["b"],
                       x.dtype)
    mq, s3 = gelu_quant(mid, interpret=pallas_interpret)
    out = _int8_matmul(mq, s3, mlp_p["c_proj"]["w_int8"],
                       mlp_p["c_proj"]["w_scale"], mlp_p["c_proj"]["b"],
                       x.dtype)
    return x + out


def transformer_block(p, x, n_head, mask=None, eps=1e-12, use_pallas=False,
                      drop_path_rate=0.0, rng=None, pallas_interpret=False):
    """Pre-LN residual attention block (reference ``:1027-1028``), with
    optional stochastic depth (``DropPath``; active only in training when
    an rng is supplied). ``pallas_interpret`` runs the fused kernels in
    Pallas interpret mode (CPU testing of the TPU fast paths)."""
    from ..ops.tuning import get_tuning

    if use_pallas and drop_path_rate == 0.0 \
            and "qkv_w_int8" in p.get("attn", {}) \
            and x.shape[1] >= get_tuning().int8_min_seq:
        # quantized eval block (models/quantize.py): fused-quant fast
        # path. Only at long sequence — measured on v5e at B=256: the
        # fused kernels win at L=197 (3,589 vs 3,495 img/s unfused) but
        # lose at L=50 (8,186 vs 9,600), where four extra kernel
        # launches per block outweigh the saved quant passes.
        return _int8_block(p, x, n_head, mask, eps, use_pallas,
                           pallas_interpret=pallas_interpret)
    attn_out = attention(p["attn"], layer_norm(p["ln_1"], x, eps), n_head,
                         mask, use_pallas=use_pallas,
                         pallas_interpret=pallas_interpret)
    if drop_path_rate > 0.0 and rng is not None:
        r1, r2 = jax.random.split(rng)
        x = x + drop_path(r1, attn_out, drop_path_rate)
        x = x + drop_path(r2, mlp(p["mlp"], layer_norm(p["ln_2"], x, eps)),
                          drop_path_rate)
        return x
    x = x + attn_out
    x = x + mlp(p["mlp"], layer_norm(p["ln_2"], x, eps))
    return x


def conv2d(p, x, stride=1, padding=0, groups=1, layout="NHWC"):
    """Conv with symmetric integer padding (torch Conv2d semantics).

    ``layout``: activation layout. NHWC is the default; NCHW wins for the
    low-channel high-resolution stem/branch convs on TPU (W on lanes
    instead of a mostly-empty channel vector).
    """
    pad = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=(layout, "HWIO", layout),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def conv_transpose2d(p, x, stride=1, padding=0, groups=1):
    """NHWC transposed conv matching torch ConvTranspose2d geometry."""
    k = p["w"].shape[0]
    pad_lo = k - 1 - padding
    pad = ((pad_lo, pad_lo), (pad_lo, pad_lo))
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(p["w"], (0, 1)).astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


def batch_norm(p, x, eps=1e-5, training=False, axis_name=None, momentum=0.1,
               layout="NHWC"):
    """BatchNorm (stats per channel; channel axis from ``layout``).

    Inference: folds running stats into a single scale/offset (one fused
    multiply-add on the VPU). Training: batch statistics over the non-
    channel axes, optionally psum-averaged across ``axis_name`` for
    cross-replica BN; returns ``(y, new_stats)``.
    """
    dtype = x.dtype
    c_axis = x.ndim - 1 if layout == "NHWC" else 1
    bshape = [1] * x.ndim
    bshape[c_axis] = -1
    if not training:
        # running stats are buffers, not parameters (torch
        # requires_grad=False): stop_gradient so a differentiated
        # eval-mode forward (SWA.FROZEN_BN training, linear probes)
        # cannot leak phantom grads into them — they would inflate
        # clip_by_global_norm and the grad_norm metric even though the
        # optimizer zeroes their updates
        mean = jax.lax.stop_gradient(p["mean"])
        var = jax.lax.stop_gradient(p["var"])
        scale = p["scale"] * jax.lax.rsqrt(var + eps)
        offset = p["bias"] - mean * scale
        return x * scale.astype(dtype).reshape(bshape) \
            + offset.astype(dtype).reshape(bshape)

    xf = x.astype(jnp.float32)
    axes = tuple(a for a in range(x.ndim) if a != c_axis)
    mean = jnp.mean(xf, axis=axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    y = (xf - mean.reshape(bshape)) * jax.lax.rsqrt(
        var.reshape(bshape) + eps
    )
    y = p["scale"].reshape(bshape) * y + p["bias"].reshape(bshape)
    # torch running_var uses the unbiased estimator
    n = math.prod([x.shape[a] for a in axes])
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y.astype(dtype), new_stats


def build_causal_mask(length: int) -> jnp.ndarray:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference ``build_attention_mask`` ``:2965-2971``)."""
    mask = jnp.full((length, length), -jnp.inf, jnp.float32)
    return jnp.triu(mask, k=1)


def l2_normalize(x, axis=-1, eps=0.0):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)
