"""Per-module numeric tests against torch functional oracles (torch-cpu is
the test oracle only; the framework itself is pure JAX)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from msclip_tpu.models import layers as L

RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_layer_norm_tf_style():
    """fp32 stats, eps inside the sqrt, eps=1e-12 (reference LN :204-219)."""
    x = rand(4, 7, 32)
    scale, bias = rand(32), rand(32)
    got = L.layer_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                       jnp.array(x), eps=1e-12)
    xt = torch.tensor(x)
    u = xt.mean(-1, keepdim=True)
    s = (xt - u).pow(2).mean(-1, keepdim=True)
    want = torch.tensor(scale) * ((xt - u) / torch.sqrt(s + 1e-12)) \
        + torch.tensor(bias)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_quick_gelu():
    x = rand(128)
    got = L.quick_gelu(jnp.array(x))
    want = torch.tensor(x) * torch.sigmoid(1.702 * torch.tensor(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_attention_vs_torch_mha():
    """Our fused-QKV attention must match torch's reference MHA kernel
    (the reference Attention_CUST reimplements exactly that math)."""
    E, H, B, Lq = 64, 4, 3, 10
    x = rand(B, Lq, E)
    in_w, in_b = rand(3 * E, E), rand(3 * E)
    out_w, out_b = rand(E, E), rand(E)

    p = {
        "qkv_w": jnp.array(in_w.T),
        "qkv_b": jnp.array(in_b),
        "out_w": jnp.array(out_w.T),
        "out_b": jnp.array(out_b),
    }
    got = L.attention(p, jnp.array(x), n_head=H)

    xt = torch.tensor(x).transpose(0, 1)  # [L, B, E] for torch MHA
    want, _ = F.multi_head_attention_forward(
        xt, xt, xt, E, H,
        torch.tensor(in_w), torch.tensor(in_b),
        None, None, False, 0.0,
        torch.tensor(out_w), torch.tensor(out_b),
        training=False, need_weights=False,
    )
    want = want.transpose(0, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_attention_causal_mask():
    E, H, B, Lq = 32, 2, 2, 9
    x = rand(B, Lq, E)
    in_w, in_b = rand(3 * E, E), rand(3 * E)
    out_w, out_b = rand(E, E), rand(E)
    p = {
        "qkv_w": jnp.array(in_w.T), "qkv_b": jnp.array(in_b),
        "out_w": jnp.array(out_w.T), "out_b": jnp.array(out_b),
    }
    mask = L.build_causal_mask(Lq)
    got = L.attention(p, jnp.array(x), n_head=H, mask=mask)

    xt = torch.tensor(x).transpose(0, 1)
    tmask = torch.full((Lq, Lq), float("-inf")).triu(1)
    want, _ = F.multi_head_attention_forward(
        xt, xt, xt, E, H,
        torch.tensor(in_w), torch.tensor(in_b), None, None, False, 0.0,
        torch.tensor(out_w), torch.tensor(out_b),
        training=False, need_weights=False, attn_mask=tmask,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 1).numpy(), atol=1e-3, rtol=1e-3
    )


def test_conv2d_vs_torch():
    x = rand(2, 16, 16, 6)
    w = rand(8, 6, 3, 3)  # OIHW
    got = L.conv2d({"w": jnp.array(w.transpose(2, 3, 1, 0))},
                   jnp.array(x), stride=2, padding=1)
    want = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
                    stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def test_depthwise_conv_vs_torch():
    C = 8
    x = rand(2, 12, 12, C)
    w = rand(C, 1, 4, 4)  # depthwise OIHW, groups=C
    got = L.conv2d({"w": jnp.array(w.transpose(2, 3, 1, 0))},
                   jnp.array(x), stride=4, padding=0, groups=C)
    want = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
                    stride=4, padding=0, groups=C)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def test_batch_norm_eval_vs_torch():
    C = 5
    x = rand(3, 6, 6, C)
    p = {"scale": jnp.array(rand(C)), "bias": jnp.array(rand(C)),
         "mean": jnp.array(rand(C)), "var": jnp.abs(jnp.array(rand(C))) + 0.5}
    got = L.batch_norm(p, jnp.array(x), eps=1e-5, training=False)
    want = F.batch_norm(
        torch.tensor(x.transpose(0, 3, 1, 2)),
        torch.tensor(np.asarray(p["mean"])),
        torch.tensor(np.asarray(p["var"])),
        torch.tensor(np.asarray(p["scale"])),
        torch.tensor(np.asarray(p["bias"])),
        training=False, eps=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_batch_norm_train_stats():
    C = 4
    x = rand(8, 5, 5, C)
    p = {"scale": jnp.ones(C), "bias": jnp.zeros(C),
         "mean": jnp.zeros(C), "var": jnp.ones(C)}
    y, new_stats = L.batch_norm(p, jnp.array(x), training=True)
    # normalized output: ~zero mean / unit var per channel
    ym = np.asarray(y).reshape(-1, C)
    np.testing.assert_allclose(ym.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(ym.std(0), 1, atol=1e-3)
    # torch-momentum running stats
    xt = x.reshape(-1, C)
    want_mean = 0.1 * xt.mean(0)
    np.testing.assert_allclose(
        np.asarray(new_stats["mean"]), want_mean, atol=1e-5
    )


def test_mlp_shapes():
    key = jax.random.PRNGKey(0)
    p = L.init_mlp(key, 32)
    x = jnp.array(rand(2, 5, 32))
    y = L.mlp(p, x)
    assert y.shape == (2, 5, 32)


def test_block_residual_structure():
    """Zeroed attention+MLP weights make the block the identity."""
    key = jax.random.PRNGKey(0)
    p = L.init_block(key, 32)
    p = jax.tree.map(jnp.zeros_like, p)
    p["ln_1"]["scale"] = jnp.ones(32)
    p["ln_2"]["scale"] = jnp.ones(32)
    x = jnp.array(rand(2, 5, 32))
    y = L.transformer_block(p, x, n_head=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_batch_norm_train_vs_torch():
    """Training-mode BN (batch stats + running-stat update) matches torch."""
    C = 6
    x = rand(4, 5, 5, C)
    scale, bias = rand(C), np.abs(rand(C)) + 0.1
    mean0, var0 = rand(C), np.abs(rand(C)) + 0.5
    p = {"scale": jnp.array(scale), "bias": jnp.array(bias),
         "mean": jnp.array(mean0), "var": jnp.array(var0)}
    y, stats = L.batch_norm(p, jnp.array(x), eps=1e-5, training=True)

    bn = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(scale))
        bn.bias.copy_(torch.tensor(bias))
        bn.running_mean.copy_(torch.tensor(mean0))
        bn.running_var.copy_(torch.tensor(var0))
    bn.train()
    want = bn(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y), want.detach().permute(0, 2, 3, 1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), bn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), bn.running_var.numpy(), atol=1e-4
    )
