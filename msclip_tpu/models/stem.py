"""MS-CLIP-S modality-specific vision modules.

TPU-native implementations (NHWC, XLA conv) of the reference's [ON]
components (SURVEY.md §2.3):

* ``EarlyconvRes``  — the conv stem that replaces patchify: conv3x3 s2
  (3 -> width/16) + BN + ReLU, then 4 single-conv residual stages doubling
  channels, then a 1x1 conv (reference ``clip_openai_pe_res_v1.py:1939-2000``
  with ``ResBasicBlock_v0`` ``:1898-1936``).
* parallel ResNet branch — stage 0 conv+BN+ReLU, stages 1-4 bottleneck
  ``ConvResBlock`` stacks (reference ``:1812-1895``, built at ``:2139-2168``).
* ``Lateral_Adapter`` — top2bottom depthwise+pointwise injection of the
  parallel branch into the trunk token grid, bottom depthwise conv, fused
  via ``ln_adapt(bottom + t2b)`` with CLS pass-through (reference
  ``:1539-1809``, released path ``:1752-1778``).

BatchNorm state is threaded functionally: apply functions take a ``BNState``
context; in training mode it records updated running stats keyed by
parameter path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .layers import (
    batch_norm,
    conv2d,
    init_batch_norm,
    init_conv,
    init_layer_norm,
    layer_norm,
)


@dataclass
class BNState:
    """Functional BatchNorm context.

    ``training=False``: running stats are folded (pure read).
    ``training=True``: batch stats are used and new running stats are
    recorded into ``updates`` under the param path.
    """

    training: bool = False
    axis_name: Optional[str] = None
    updates: dict = field(default_factory=dict)
    layout: str = "NHWC"
    # running-stat blend factor; may be a traced scalar (the SWA BN
    # refresh sweeps it as 1/(k+1) per batch without recompiling)
    momentum: Any = 0.1

    def __call__(self, p, x, path: str, eps: float = 1e-5, layout=None):
        layout = layout or self.layout
        if not self.training:
            return batch_norm(p, x, eps=eps, training=False, layout=layout)
        y, new_stats = batch_norm(
            p, x, eps=eps, training=True, axis_name=self.axis_name,
            layout=layout, momentum=self.momentum,
        )
        self.updates[path] = new_stats
        return y


# ---------------------------------------------------------------------------
# EarlyconvRes stem
# ---------------------------------------------------------------------------

def init_earlyconv_res(key, width, first_conv_k=3, n_stages=4, std=0.02):
    """width/16 -> width over ``n_stages`` channel-doubling residual stages."""
    keys = jax.random.split(key, n_stages * 2 + 2)
    c0 = width // (2 ** n_stages)
    p = {
        "conv1": init_conv(keys[0], first_conv_k, 3, c0, std=std),
        "bn1": init_batch_norm(c0),
        "stages": [],
        "last_conv": init_conv(keys[1], 1, width, width, std=std),
    }
    for i in range(n_stages):
        c_in = width // (2 ** (n_stages - i))
        c_out = c_in * 2
        p["stages"].append(
            {
                "conv1": init_conv(keys[2 + 2 * i], 3, c_in, c_out, std=std),
                "bn1": init_batch_norm(c_out),
                "down_conv": init_conv(keys[3 + 2 * i], 1, c_in, c_out, std=std),
                "down_bn": init_batch_norm(c_out),
            }
        )
    return p


def _bias(x, b, layout):
    if layout == "NCHW":
        return x + b.astype(x.dtype)[None, :, None, None]
    return x + b.astype(x.dtype)


def apply_earlyconv_res(p, x, strides, bn: BNState, first_conv_k=3,
                        path="stem"):
    """x (layout per ``bn.layout``) -> feature map at 1/total_stride."""
    lo = bn.layout
    pad = (first_conv_k - 1) // 2
    if "bn1" not in p:  # BN-folded inference params (folding.py)
        x = jax.nn.relu(_bias(
            conv2d(p["conv1"], x, stride=2, padding=pad, layout=lo),
            p["conv1"]["b"], lo))
        for sp, st in zip(p["stages"], strides):
            x = jax.nn.relu(_bias(
                conv2d(sp, x, stride=st, padding=1, layout=lo),
                sp["b"], lo))
        return conv2d(p["last_conv"], x, stride=1, padding=0, layout=lo)
    x = conv2d(p["conv1"], x, stride=2, padding=pad, layout=lo)
    x = bn(p["bn1"], x, f"{path}/bn1")
    x = jax.nn.relu(x)
    for i, (sp, s) in enumerate(zip(p["stages"], strides)):
        # ResBasicBlock_v0: conv3x3(s) + BN, 1x1-downsample(s) + BN, add, ReLU
        out = conv2d(sp["conv1"], x, stride=s, padding=1, layout=lo)
        out = bn(sp["bn1"], out, f"{path}/stages/{i}/bn1")
        identity = conv2d(sp["down_conv"], x, stride=s, padding=0, layout=lo)
        identity = bn(sp["down_bn"], identity, f"{path}/stages/{i}/down_bn")
        x = jax.nn.relu(out + identity)
    return conv2d(p["last_conv"], x, stride=1, padding=0, layout=lo)


def init_plain_conv_stem(key, width, std=0.02):
    """The non-residual 6-conv stem (EARLY_CONV without EARLY_CONV_RES;
    reference ``build_early_conv_block`` ``:2282-2342``): five conv3x3 s2
    (3 -> w/16 -> w/8 -> w/4 -> w/2 -> w) + BN + ReLU, then 1x1 conv."""
    dims = [3, width // 16, width // 8, width // 4, width // 2, width]
    keys = jax.random.split(key, 6)
    p = {}
    for i in range(5):
        p[f"conv_{i + 1}"] = init_conv(keys[i], 3, dims[i], dims[i + 1],
                                       std=std)
        p[f"bn_{i + 1}"] = init_batch_norm(dims[i + 1])
    p["conv_6"] = init_conv(keys[5], 1, width, width, std=std)
    return p


def apply_plain_conv_stem(p, x, bn: BNState, path="stem"):
    lo = bn.layout
    folded = "bn_1" not in p
    for i in range(1, 6):
        x = conv2d(p[f"conv_{i}"], x, stride=2, padding=1, layout=lo)
        if folded:
            x = jax.nn.relu(_bias(x, p[f"conv_{i}"]["b"], lo))
        else:
            x = jax.nn.relu(bn(p[f"bn_{i}"], x, f"{path}/bn_{i}"))
    return conv2d(p["conv_6"], x, stride=1, padding=0, layout=lo)


# ---------------------------------------------------------------------------
# Parallel (modality-specific) conv branch
# ---------------------------------------------------------------------------

def init_conv_bn_relu(key, c_in, c_out, k, std=0.02):
    return {"conv": init_conv(key, k, c_in, c_out, std=std),
            "bn": init_batch_norm(c_out)}


def init_conv_res_block(key, c_in, c_mid, c_out, k, res_conv, std=0.02):
    keys = jax.random.split(key, 4)
    p = {
        "conv1": init_conv(keys[0], 1, c_in, c_mid, std=std),
        "bn1": init_batch_norm(c_mid),
        "conv2": init_conv(keys[1], k, c_mid, c_mid, std=std),
        "bn2": init_batch_norm(c_mid),
        "conv3": init_conv(keys[2], 1, c_mid, c_out, std=std),
        "bn3": init_batch_norm(c_out),
    }
    if res_conv:
        p["residual_conv"] = init_conv(keys[3], 1, c_in, c_out, std=std)
        p["residual_bn"] = init_batch_norm(c_out)
    return p


def apply_conv_res_block(p, x, k, stride, padding, bn: BNState, path):
    """1x1 -> kxk(stride) -> 1x1 bottleneck with projected residual
    (reference ``ConvResBlock.forward`` ``:1842-1861``; BN eps 1e-6)."""
    lo = bn.layout
    if "bn1" not in p:  # folded
        residual = x
        out = jax.nn.relu(_bias(conv2d(p["conv1"], x, 1, 0, layout=lo),
                                p["conv1"]["b"], lo))
        out = jax.nn.relu(_bias(
            conv2d(p["conv2"], out, stride, padding, layout=lo),
            p["conv2"]["b"], lo))
        out = _bias(conv2d(p["conv3"], out, 1, 0, layout=lo),
                    p["conv3"]["b"], lo)
        if "residual_conv" in p:
            residual = _bias(
                conv2d(p["residual_conv"], x, stride, 0, layout=lo),
                p["residual_conv"]["b"], lo)
        return jax.nn.relu(out + residual)
    residual = x
    out = conv2d(p["conv1"], x, stride=1, padding=0, layout=lo)
    out = jax.nn.relu(bn(p["bn1"], out, f"{path}/bn1", eps=1e-6))
    out = conv2d(p["conv2"], out, stride=stride, padding=padding, layout=lo)
    out = jax.nn.relu(bn(p["bn2"], out, f"{path}/bn2", eps=1e-6))
    out = conv2d(p["conv3"], out, stride=1, padding=0, layout=lo)
    out = bn(p["bn3"], out, f"{path}/bn3", eps=1e-6)
    if "residual_conv" in p:
        residual = conv2d(p["residual_conv"], x, stride=stride, padding=0,
                          layout=lo)
        residual = bn(p["residual_bn"], residual, f"{path}/residual_bn",
                      eps=1e-6)
    return jax.nn.relu(out + residual)


def init_parallel_branch(key, width, n_layers, resnet_layers, kernels, std=0.02):
    """Five stages: [3, w/16, w/8, w/4, w/2] -> [w/16, w/8, w/4, w/2, w]
    (reference ``:2131-2168``). Stage 0 is conv+BN+ReLU; stages with
    ``resnet_layers[i] > 0`` are ``ConvResBlock`` stacks (first block
    carries the strided residual projection)."""
    in_dims = [3, width // 16, width // 8, width // 4, width // 2]
    out_dims = [width // 16, width // 8, width // 4, width // 2, width]
    keys = jax.random.split(key, n_layers)
    stages = []
    for i in range(n_layers):
        if i == 0 or resnet_layers[i] == 0:
            stages.append(
                init_conv_bn_relu(keys[i], in_dims[i], out_dims[i],
                                  kernels[i], std)
            )
        else:
            blocks = []
            bkeys = jax.random.split(keys[i], resnet_layers[i])
            for j in range(resnet_layers[i]):
                c_in = in_dims[i] if j == 0 else out_dims[i]
                blocks.append(
                    init_conv_res_block(
                        bkeys[j], c_in, out_dims[i] // 2, out_dims[i],
                        kernels[i], res_conv=(j == 0), std=std)
                )
            stages.append({"blocks": blocks})
    return stages


def apply_parallel_stage(p, x, k, stride, padding, bn: BNState, path):
    if "blocks" not in p:  # plain conv+BN+ReLU stage
        x = conv2d(p["conv"], x, stride=stride, padding=padding,
                   layout=bn.layout)
        if "bn" not in p:  # folded
            return jax.nn.relu(_bias(x, p["conv"]["b"], bn.layout))
        return jax.nn.relu(bn(p["bn"], x, f"{path}/bn"))
    for j, blk in enumerate(p["blocks"]):
        s = stride if j == 0 else 1
        x = apply_conv_res_block(blk, x, k, s, padding, bn, f"{path}/blocks/{j}")
    return x


# ---------------------------------------------------------------------------
# Lateral adapter (released top2bottom-only path)
# ---------------------------------------------------------------------------

def init_lateral_adapter(key, top_dim, bottom_dim, t2b_kernel, std=0.02,
                         bn_relu=False, bn_ln_relu=False, noln_add=False):
    keys = jax.random.split(key, 3)
    p = {
        "t2b_dw_conv": init_conv(keys[0], t2b_kernel, top_dim, top_dim,
                                 groups=top_dim, std=std),
        "t2b_dw_bn": init_batch_norm(top_dim),
        "t2b_pw_conv": init_conv(keys[1], 1, top_dim, bottom_dim, std=std),
        "bottom_dw_conv": init_conv(keys[2], 3, bottom_dim, bottom_dim,
                                    groups=bottom_dim, std=std),
        "bottom_dw_bn": init_batch_norm(bottom_dim),
    }
    # PRALLEL_T2B_ADD_BN_RELU: BN after the pointwise conv too (:1587-1592)
    if bn_relu:
        p["t2b_pw_bn"] = init_batch_norm(bottom_dim)
    # PRALLEL_T2B_ADD_BN_LN_RELU: LN (token-space) after the pw conv
    # (:1593-1598)
    if bn_ln_relu:
        p["t2b_pw_ln"] = init_layer_norm(bottom_dim)
    if not noln_add:
        p["ln_adapt"] = init_layer_norm(bottom_dim)
    return p


def init_lateral_adapter_b2t(key, top_dim, bottom_dim, b2t_kernel,
                             mode="deconv", std=0.02):
    """bottom2top back-path params (reference ``:1639-1742``):
    mode in {'deconv', 'bilinear', 'crossattn'}."""
    from .crossattn import init_cross_attention_diffdim

    keys = jax.random.split(key, 4)
    p = {
        "top_dw_conv": init_conv(keys[0], 3, top_dim, top_dim,
                                 groups=top_dim, std=std),
        "top_dw_bn": init_batch_norm(top_dim),
    }
    if mode == "deconv":
        p["b2t_dw_deconv"] = init_conv(keys[1], b2t_kernel, bottom_dim,
                                       bottom_dim, groups=bottom_dim,
                                       std=std)
        p["b2t_dw_bn"] = init_batch_norm(bottom_dim)
        p["b2t_pw_conv"] = init_conv(keys[2], 1, bottom_dim, top_dim,
                                     std=std)
        p["b2t_pw_bn"] = init_batch_norm(top_dim)
    elif mode == "bilinear":
        p["b2t_dw_conv"] = init_conv(keys[1], 3, bottom_dim, bottom_dim,
                                     groups=bottom_dim, std=std)
        p["b2t_dw_bn"] = init_batch_norm(bottom_dim)
        p["b2t_pw_conv"] = init_conv(keys[2], 1, bottom_dim, top_dim,
                                     std=std)
        p["b2t_pw_bn"] = init_batch_norm(top_dim)
    elif mode == "crossattn":
        p["b2t_dw_conv"] = init_conv(keys[1], 3, bottom_dim, bottom_dim,
                                     groups=bottom_dim, std=std)
        p["b2t_dw_bn"] = init_batch_norm(bottom_dim)
        p["crossattn"] = init_cross_attention_diffdim(
            keys[2], top_dim, bottom_dim, bottom_dim, top_dim, top_dim,
            head_dim=64,
        )
        p["b2t_ln"] = init_layer_norm(top_dim)
    else:
        raise ValueError(mode)
    return p


def apply_lateral_adapter_b2t(p, top, bottom_grid, cls_tok, grid_hw, mode,
                              b2t_kernel, b2t_stride, b2t_padding,
                              bn: BNState, path, eps=1e-12):
    """Compute the new top feature map from the (pre-fusion) bottom grid
    (reference ``:1780-1808``)."""
    from .crossattn import cross_attention_diffdim
    from .layers import conv_transpose2d

    H, W = grid_hw
    top_dim = top.shape[-1]
    bottom_dim = bottom_grid.shape[-1]
    B = top.shape[0]

    top_out = conv2d(p["top_dw_conv"], top, stride=1, padding=1,
                     groups=top_dim)
    top_out = bn(p["top_dw_bn"], top_out, f"{path}/top_dw_bn")

    if mode == "deconv":
        b2t = conv_transpose2d(p["b2t_dw_deconv"], bottom_grid,
                               stride=b2t_stride, padding=b2t_padding,
                               groups=bottom_dim)
        b2t = bn(p["b2t_dw_bn"], b2t, f"{path}/b2t_dw_bn")
        b2t = conv2d(p["b2t_pw_conv"], b2t, stride=1, padding=0)
        b2t = bn(p["b2t_pw_bn"], b2t, f"{path}/b2t_pw_bn")
        return top_out + b2t
    if mode == "bilinear":
        b2t = conv2d(p["b2t_dw_conv"], bottom_grid, stride=1, padding=1,
                     groups=bottom_dim)
        b2t = bn(p["b2t_dw_bn"], b2t, f"{path}/b2t_dw_bn")
        b2t = conv2d(p["b2t_pw_conv"], b2t, stride=1, padding=0)
        b2t = bn(p["b2t_pw_bn"], b2t, f"{path}/b2t_pw_bn")
        b2t = jax.image.resize(
            b2t, (B, top.shape[1], top.shape[2], top_dim), "bilinear"
        )
        return top_out + b2t
    if mode == "crossattn":
        b2t = conv2d(p["b2t_dw_conv"], bottom_grid, stride=1, padding=1,
                     groups=bottom_dim)
        b2t = bn(p["b2t_dw_bn"], b2t, f"{path}/b2t_dw_bn")
        Ht, Wt = top_out.shape[1], top_out.shape[2]
        top_flat = top_out.reshape(B, Ht * Wt, top_dim)
        b2t_flat = jnp.concatenate(
            [cls_tok, b2t.reshape(B, H * W, bottom_dim)], axis=1
        )
        attn = cross_attention_diffdim(
            p["crossattn"], top_flat, b2t_flat, b2t_flat, head_dim=64
        )
        top_flat = layer_norm(p["b2t_ln"], top_flat + attn, eps=eps)
        return top_flat.reshape(B, Ht, Wt, top_dim)
    raise ValueError(mode)


def apply_lateral_adapter(p, top, bottom_tokens, grid_hw, t2b_kernel,
                          t2b_stride, t2b_padding, bn: BNState, path,
                          use_cls=True, pool_kernel=0, bn_relu=False,
                          bn_ln_relu=False, noln_add=False, eps=1e-12,
                          top_layout="NHWC"):
    """Fuse the parallel-branch feature map into the trunk token sequence.

    top:           [B, Ht, Wt, top_dim]   parallel branch feature map
    bottom_tokens: [B, 1+H*W, bottom]     trunk tokens (CLS first)
    Returns (top unchanged, fused bottom tokens) — reference ``:1752-1778``.

    Note the reference's exact CLS arithmetic: CLS both passes through the
    bottom path *and* is prepended to the t2b injection when
    ``PRALLEL_T2B_USECLS``, so the fused CLS is ``ln(2 * cls)``.
    """
    B = bottom_tokens.shape[0]
    H, W = grid_hw
    bottom_dim = bottom_tokens.shape[-1]
    top_dim = top.shape[1] if top_layout == "NCHW" else top.shape[-1]

    # optional average pooling before the dwconv (PARALLEL_T2B_POOL_SIZE,
    # reference :1561-1566, :1753-1754)
    if pool_kernel:
        wdims = ((1, 1, pool_kernel, pool_kernel)
                 if top_layout == "NCHW"
                 else (1, pool_kernel, pool_kernel, 1))
        top_in = jax.lax.reduce_window(
            top, 0.0, jax.lax.add, wdims, wdims, "VALID",
        ) / float(pool_kernel * pool_kernel)
    else:
        top_in = top

    # top -> bottom: depthwise (stride matches grid) + BN + pointwise 1x1
    t2b = conv2d(p["t2b_dw_conv"], top_in, stride=t2b_stride,
                 padding=t2b_padding, groups=top_dim, layout=top_layout)
    if "t2b_dw_bn" not in p:  # folded
        t2b = _bias(t2b, p["t2b_dw_conv"]["b"], top_layout)
    else:
        t2b = bn(p["t2b_dw_bn"], t2b, f"{path}/t2b_dw_bn",
                 layout=top_layout)
    if bn_relu:
        t2b = jax.nn.relu(t2b)
    t2b = conv2d(p["t2b_pw_conv"], t2b, stride=1, padding=0,
                 layout=top_layout)
    if bn_relu:
        t2b = jax.nn.relu(bn(p["t2b_pw_bn"], t2b, f"{path}/t2b_pw_bn",
                             layout=top_layout))
    if top_layout == "NCHW":
        t2b = t2b.transpose(0, 2, 3, 1)
    t2b = t2b.reshape(B, H * W, bottom_dim)
    if bn_ln_relu:
        t2b = jax.nn.relu(layer_norm(p["t2b_pw_ln"], t2b, eps=eps))

    cls_tok = bottom_tokens[:, :1, :]
    grid = bottom_tokens[:, 1:, :].reshape(B, H, W, bottom_dim)
    grid = conv2d(p["bottom_dw_conv"], grid, stride=1, padding=1,
                  groups=bottom_dim, layout="NHWC")
    if "bottom_dw_bn" not in p:  # folded
        grid = grid + p["bottom_dw_conv"]["b"].astype(grid.dtype)
    else:
        grid = bn(p["bottom_dw_bn"], grid, f"{path}/bottom_dw_bn",
                  layout="NHWC")
    bottom_out = jnp.concatenate(
        [cls_tok, grid.reshape(B, H * W, bottom_dim)], axis=1
    )

    t2b_cls = cls_tok if use_cls else jnp.zeros_like(cls_tok)
    t2b = jnp.concatenate([t2b_cls, t2b], axis=1)
    if noln_add:  # PRALLEL_T2B_NOLN_ADD (:1774-1775)
        fused = bottom_out + t2b
    else:
        fused = layer_norm(p["ln_adapt"], bottom_out + t2b, eps=eps)
    return top, fused
