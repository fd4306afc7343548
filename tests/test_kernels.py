"""Pallas kernel tests: interpreter-mode allclose against the XLA reference
path (SURVEY.md §4.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.models import layers as L
from msclip_tpu.ops import fused_attention, fused_attention_qkv


def _qkv(B, H, Lq, D, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, Lq, D)).astype(np.float32))
        for _ in range(3)
    )


def _reference(q, k, v, mask=None):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", w, v)


@pytest.mark.parametrize("L_seq", [50, 77, 197])
def test_fused_attention_matches_xla(L_seq):
    q, k, v = _qkv(2, 3, L_seq, 64)
    got = fused_attention(q, k, v, interpret=True)
    want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_causal_mask():
    Lq = 77
    q, k, v = _qkv(2, 2, Lq, 64, seed=1)
    mask = L.build_causal_mask(Lq)
    got = fused_attention(q, k, v, mask, interpret=True)
    want = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_bf16():
    q, k, v = _qkv(2, 2, 50, 64, seed=2)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    got = fused_attention(q, k, v, interpret=True)
    want = _reference(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_layers_attention_pallas_path():
    """layers.attention(use_pallas=True) equals the XLA path."""
    rng = np.random.default_rng(3)
    E, H, B, Lq = 64, 2, 3, 50
    x = jnp.asarray(rng.standard_normal((B, Lq, E)).astype(np.float32))
    p = {
        "qkv_w": jnp.asarray(
            rng.standard_normal((E, 3 * E)).astype(np.float32) * 0.05
        ),
        "qkv_b": jnp.zeros(3 * E),
        "out_w": jnp.asarray(
            rng.standard_normal((E, E)).astype(np.float32) * 0.05
        ),
        "out_b": jnp.zeros(E),
    }
    want = L.attention(p, x, n_head=H)
    got = L.attention(p, x, n_head=H, use_pallas=True,
                      pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_attention_qkv_native_layout():
    """Native-layout kernel vs the XLA reference on the qkv tensor."""
    rng = np.random.default_rng(5)
    B, Lq, H, D = 3, 50, 4, 16
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B, Lq, 3 * E)).astype(np.float32))
    got = fused_attention_qkv(qkv, H, interpret=True)

    q, k, v = jnp.split(qkv, 3, -1)
    qh = q.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
    want = _reference(qh, kh, vh)
    want = want.transpose(0, 2, 1, 3).reshape(B, Lq, E)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_qkv_mask_and_padding():
    """Causal mask + batch not divisible by the tile size."""
    rng = np.random.default_rng(6)
    B, Lq, H, D = 5, 77, 2, 32  # B=5: forces batch padding
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B, Lq, 3 * E)).astype(np.float32))
    mask = L.build_causal_mask(Lq)
    got = fused_attention_qkv(qkv, H, mask, interpret=True, batch_tile=2)

    q, k, v = jnp.split(qkv, 3, -1)
    qh = q.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
    want = _reference(qh, kh, vh, mask)
    want = want.transpose(0, 2, 1, 3).reshape(B, Lq, E)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_qkv_grad_matches_xla():
    """Custom VJP: grads through the fused kernel equal grads through the
    XLA attention core."""
    rng = np.random.default_rng(7)
    B, Lq, H, D = 2, 50, 2, 16
    E = H * D
    qkv = jnp.asarray(
        rng.standard_normal((B, Lq, 3 * E)).astype(np.float32) * 0.3
    )

    def loss_pallas(qkv):
        out = fused_attention_qkv(qkv, H, interpret=True)
        return (out * out).sum()

    def loss_xla(qkv):
        q, k, v = jnp.split(qkv, 3, -1)
        qh = q.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        out = _reference(qh, kh, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return (out * out).sum()

    g1 = jax.grad(loss_pallas)(qkv)
    g2 = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-4, rtol=1e-4)


def test_fused_attention_qkv_grad_with_mask():
    rng = np.random.default_rng(8)
    B, Lq, H, D = 2, 21, 2, 16  # odd L: exercises unaligned shapes
    E = H * D
    qkv = jnp.asarray(
        rng.standard_normal((B, Lq, 3 * E)).astype(np.float32) * 0.3
    )
    mask = L.build_causal_mask(Lq)

    def loss_pallas(qkv):
        return fused_attention_qkv(qkv, H, mask, interpret=True).sum()

    def loss_xla(qkv):
        q, k, v = jnp.split(qkv, 3, -1)
        qh = q.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        out = _reference(qh, kh, vh, mask)
        return out.transpose(0, 2, 1, 3).reshape(B, Lq, E).sum()

    g1 = jax.grad(loss_pallas)(qkv)
    g2 = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-4, rtol=1e-4)


def test_conv_layout_nchw_consistency():
    """NCHW stem/branch path produces the same features as NHWC."""
    import dataclasses

    from msclip_tpu.models import encode_image, init_params
    from test_train import tiny_msclips_spec

    spec = tiny_msclips_spec()
    params = init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    a = encode_image(params, spec, x)
    b = encode_image(
        params, dataclasses.replace(spec, conv_layout="NCHW"), x
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                               rtol=1e-5)


def test_bn_folding_exact():
    """Folded inference params reproduce the unfolded forward exactly
    (fp32) on the full MS-CLIP-S path incl. adapters."""
    from msclip_tpu.models import encode_image, init_params
    from msclip_tpu.models.folding import fold_params_for_eval
    from test_train import tiny_msclips_spec

    spec = tiny_msclips_spec()
    params = init_params(jax.random.PRNGKey(0), spec)
    # randomize BN stats so folding is non-trivial
    rng = np.random.default_rng(1)

    def randomize(tree):
        if isinstance(tree, dict):
            if set(tree) == {"scale", "bias", "mean", "var"}:
                return {
                    "scale": jnp.asarray(
                        rng.uniform(0.5, 1.5, tree["scale"].shape),
                        jnp.float32),
                    "bias": jnp.asarray(
                        rng.normal(0, 0.1, tree["bias"].shape), jnp.float32),
                    "mean": jnp.asarray(
                        rng.normal(0, 0.1, tree["mean"].shape), jnp.float32),
                    "var": jnp.asarray(
                        rng.uniform(0.5, 1.5, tree["var"].shape),
                        jnp.float32),
                }
            return {k: randomize(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [randomize(v) for v in tree]
        return tree

    params = randomize(params)
    folded = fold_params_for_eval(params, spec)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
        jnp.float32,
    )
    a = encode_image(params, spec, x)
    b = encode_image(folded, spec, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                               rtol=1e-4)


def test_fused_block_matches_xla():
    """Inference megakernels (attention + MLP half-blocks) match the XLA
    block, with and without a causal mask, incl. batch padding."""
    from msclip_tpu.ops.block_fused import fused_block

    rng = np.random.default_rng(9)
    E, H, B, Lq = 64, 2, 3, 50
    x = jnp.asarray(rng.standard_normal((B, Lq, E)).astype(np.float32))
    blk = L.init_block(jax.random.PRNGKey(1), E)
    want = L.transformer_block(blk, x, H)
    got = fused_block(x, blk, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    mask = L.build_causal_mask(Lq)
    want = L.transformer_block(blk, x, H, mask)
    got = fused_block(x, blk, H, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_kernel_tuning_table_and_overrides(monkeypatch):
    """Kernel constants are generation-keyed (v5e measured; others
    conservative) and env-overridable, so tile pickers never silently
    mis-tile on a different TPU generation (VERDICT r2 weak #5)."""
    from msclip_tpu.ops import tuning
    from msclip_tpu.ops.attention import _pick_batch_tile

    try:
        tuning.get_tuning.cache_clear()
        base = tuning.get_tuning()
        assert base.attn_vmem_budget >= 8 * 1024 * 1024
        base_tb = _pick_batch_tile(256, 197, 3 * 768, 2)

        # env override shrinks the budget -> smaller tile
        monkeypatch.setenv("MSCLIP_ATTN_VMEM", str(1024 * 1024))
        tuning.get_tuning.cache_clear()
        assert tuning.get_tuning().attn_vmem_budget == 1024 * 1024
        assert _pick_batch_tile(256, 197, 3 * 768, 2) < base_tb

        # a wider-VMEM generation scales the budget up
        monkeypatch.delenv("MSCLIP_ATTN_VMEM")
        monkeypatch.setattr(tuning, "_generation", lambda: "v6e")
        tuning.get_tuning.cache_clear()
        assert tuning.get_tuning().attn_vmem_budget \
            == 2 * tuning._TABLE["v5e"].attn_vmem_budget

        # unknown generation falls back to the conservative default
        monkeypatch.setattr(tuning, "_generation", lambda: "v9z")
        tuning.get_tuning.cache_clear()
        assert tuning.get_tuning() == tuning._DEFAULT

        # int8 gate is table-driven too
        monkeypatch.setenv("MSCLIP_INT8_MIN_SEQ", "5000")
        tuning.get_tuning.cache_clear()
        assert tuning.get_tuning().int8_min_seq == 5000
    finally:
        tuning.get_tuning.cache_clear()


def test_fused_attention_qkv_lane_pack_matches_unpacked():
    """lane_pack=2 (batch rows sharing one block-diagonal score tile)
    must be numerically identical to the unpacked kernel — fwd and grad
    (VERDICT r4 #3 sweep's correctness gate)."""
    rng = np.random.default_rng(11)
    B, Lq, H, D = 4, 50, 4, 16
    E = H * D
    qkv = jnp.asarray(
        rng.standard_normal((B, Lq, 3 * E)).astype(np.float32) * 0.3
    )
    plain = fused_attention_qkv(qkv, H, interpret=True, lane_pack=1)
    packed = fused_attention_qkv(qkv, H, interpret=True, lane_pack=2)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain),
                               atol=2e-5, rtol=1e-5)

    def loss(qkv, pack):
        out = fused_attention_qkv(qkv, H, interpret=True, lane_pack=pack)
        return (out * out).sum()

    g1 = jax.grad(loss)(qkv, 1)
    g2 = jax.grad(loss)(qkv, 2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=2e-4, rtol=1e-4)

    # fallback paths: odd batch, pack*L > 128, and an explicit mask all
    # silently run unpacked (identical results by construction)
    odd = fused_attention_qkv(qkv[:3], H, interpret=True, lane_pack=2)
    np.testing.assert_allclose(np.asarray(odd), np.asarray(plain[:3]),
                               atol=2e-5, rtol=1e-5)
    long_qkv = jnp.asarray(
        rng.standard_normal((2, 77, 3 * E)).astype(np.float32) * 0.3
    )
    a = fused_attention_qkv(long_qkv, H, interpret=True, lane_pack=2)
    b = fused_attention_qkv(long_qkv, H, interpret=True, lane_pack=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)
