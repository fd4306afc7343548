"""Training-feature tests: DropPath, LARC, label smoothing, EMA/SWA,
mixup/cutmix, gumbel arch group."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.models import layers as L


def test_drop_path_eval_identity():
    x = jnp.ones((4, 3, 8))
    blk = L.init_block(jax.random.PRNGKey(0), 8)
    a = L.transformer_block(blk, x, 1, drop_path_rate=0.5, rng=None)
    b = L.transformer_block(blk, x, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_drop_path_statistics():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4000, 1, 1))
    y = L.drop_path(rng, x, rate=0.3)
    vals = np.asarray(y).ravel()
    # kept rows are scaled by 1/0.7, dropped are 0
    uniq = np.unique(np.asarray(vals))
    assert len(uniq) == 2
    np.testing.assert_allclose(sorted(uniq), [0.0, 1 / 0.7], atol=1e-4)
    assert abs(vals.mean() - 1.0) < 0.05


def test_larc_clips_ratio():
    from msclip_tpu.train.optim import larc

    tx = larc(trust_coefficient=0.02)
    params = {"w": jnp.ones((4,)) * 10.0}
    # tiny update -> ratio clipped at 1 (no inflation)
    updates = {"w": jnp.ones((4,)) * 1e-6}
    out, _ = tx.update(updates, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(out["w"]),
                               np.asarray(updates["w"]))
    # huge update -> scaled down to trust ratio
    updates = {"w": jnp.ones((4,)) * 100.0}
    out, _ = tx.update(updates, tx.init(params), params)
    assert np.abs(np.asarray(out["w"])).max() < 100.0


def test_label_smoothing_loss():
    from msclip_tpu.parallel import infonce_loss

    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((8, 16)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = rng.standard_normal((8, 16)).astype(np.float32)
    f2 /= np.linalg.norm(f2, axis=-1, keepdims=True)
    base = float(infonce_loss(jnp.array(f1), jnp.array(f2), jnp.array(1.0)))
    smooth = float(
        infonce_loss(jnp.array(f1), jnp.array(f2), jnp.array(1.0),
                     label_smoothing=0.1)
    )
    assert smooth != base
    assert np.isfinite(smooth)


def test_ema_swa_updates():
    from msclip_tpu.train.averaging import ema_update, swa_update

    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    e = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.1)

    swa = {"w": jnp.zeros(3)}
    n = jnp.asarray(0)
    swa, n = swa_update(swa, {"w": jnp.ones(3) * 2}, n)
    swa, n = swa_update(swa, {"w": jnp.ones(3) * 4}, n)
    np.testing.assert_allclose(np.asarray(swa["w"]), 3.0)
    assert int(n) == 2


def test_mixup_soft_labels():
    from msclip_tpu.data.transforms import mixup_cutmix

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, soft = mixup_cutmix(jax.random.PRNGKey(0), images, labels, 5,
                               mixup_alpha=0.8)
    assert mixed.shape == images.shape
    assert soft.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)


def test_cutmix_region():
    from msclip_tpu.data.transforms import mixup_cutmix

    images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
    labels = jnp.asarray([0, 1])
    mixed, soft = mixup_cutmix(jax.random.PRNGKey(1), images, labels, 2,
                               cutmix_alpha=1.0)
    vals = np.unique(np.asarray(mixed))
    assert set(vals) <= {0.0, 1.0}  # pure region swap, no blending
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)


def test_mixup_cutmix_both_enabled_under_jit():
    """AUG.MIXUP and AUG.MIXCUT both set: the per-batch switch must stay
    traceable (round-1 advisor finding: bool() on a traced bernoulli raised
    TracerBoolConversionError inside the finetune jit step)."""
    from msclip_tpu.data.transforms import mixup_cutmix

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])

    @jax.jit
    def step(key):
        return mixup_cutmix(key, images, labels, 5,
                            mixup_alpha=0.8, cutmix_alpha=1.0,
                            switch_prob=0.5)

    saw_blend = saw_swap = False
    for i in range(8):
        mixed, soft = step(jax.random.PRNGKey(i))
        assert mixed.shape == images.shape
        np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)
        # cutmix output is a pure region swap (every pixel from one of the
        # two source images); mixup blends. Both must occur across keys.
        m = np.asarray(mixed)
        is_swap = bool(
            np.all((np.abs(m - np.asarray(images)) < 1e-6)
                   | (np.abs(m - np.asarray(images)[[3, 0, 1, 2]]) < 1e-6))
        )
        saw_swap |= is_swap
        saw_blend |= not is_swap
    assert saw_swap and saw_blend


def test_bilinear_crop_resize_oracle():
    """Identity crop reproduces the image exactly; bilinear sampling of a
    linear ramp is exact at fractional coordinates."""
    from msclip_tpu.data.transforms import bilinear_crop_resize

    # identity: full-image crop at the same output size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    out = bilinear_crop_resize(img, jnp.asarray(0), jnp.asarray(0),
                               jnp.asarray(16), jnp.asarray(16), 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    # linear ramp, 2x downscale: bilinear interpolation of a linear
    # function is exact -> out[i] = ramp((i + 0.5) * 2 - 0.5)
    ramp = jnp.broadcast_to(
        jnp.arange(32, dtype=jnp.float32)[:, None, None], (32, 32, 1)
    )
    out = bilinear_crop_resize(ramp, jnp.asarray(0), jnp.asarray(0),
                               jnp.asarray(32), jnp.asarray(32), 16)
    expect = np.clip((np.arange(16) + 0.5) * 2 - 0.5, 0, 31)
    np.testing.assert_allclose(
        np.asarray(out)[:, 0, 0], expect.astype(np.float32), atol=1e-5
    )


def test_random_resized_crop_params_semantics():
    """Crop boxes always fit; areas respect the scale range (torchvision
    RandomResizedCrop.get_params)."""
    from msclip_tpu.data.transforms import random_resized_crop_params

    H, W, B = 224, 320, 256
    y0, x0, ch, cw = jax.jit(
        lambda k: random_resized_crop_params(k, B, H, W)
    )(jax.random.PRNGKey(0))
    y0, x0, ch, cw = map(np.asarray, (y0, x0, ch, cw))
    assert (y0 >= 0).all() and (x0 >= 0).all()
    assert (y0 + ch <= H).all() and (x0 + cw <= W).all()
    assert (ch > 0).all() and (cw > 0).all()
    area_frac = (ch.astype(float) * cw) / (H * W)
    # int rounding blurs the edges slightly
    assert area_frac.min() >= 0.06 and area_frac.max() <= 1.01
    aspect = cw.astype(float) / ch
    assert aspect.min() > 0.7 and aspect.max() < 1.45


def test_shared_param_labels_match_resolver():
    """LR_SHARE/WD_SHARE optimizer groups must land on exactly the visual
    blocks that resolve_text_block consumes, under VISUAL_LAYER_MINUS1 and
    the legacy stem placement too (round-1 advisor finding: the offset
    ignored both)."""
    from msclip_tpu.models import MSClipSpec, init_params
    from msclip_tpu.train.optim import param_labels

    for minus1, new_impl in [(False, True), (True, True), (False, False)]:
        spec = MSClipSpec(
            embed_dim=16, image_resolution=64, vision_width=64,
            vision_layers=4, vision_patch_size=16, vision_heads=1,
            text_width=64, text_heads=1, text_layers=4, vocab_size=64,
            context_length=8, early_conv=True,
            early_conv_new_implement=new_impl,
            visual_layer_minus1=minus1,
            share_modules=("attn.in_proj_weight", "attn.in_proj_bias",
                           "attn.out_proj", "mlp"),
            share_n_layers=1,
        )
        params = init_params(jax.random.PRNGKey(0), spec)
        labels = param_labels(params, spec)
        offset = (1 if spec.visual_layer_minus1 else 0) + (
            1 if spec.stem_in_trunk else 0
        )
        want = {
            i - offset for i in range(spec.text_layers)
            if spec.text_layer_is_shared(i)
            and 0 <= i - offset < spec.n_trunk_blocks
        }
        assert want, (minus1, new_impl)  # the case must actually share
        got = {
            j for j, blk in enumerate(labels["visual"]["blocks"])
            if blk["attn"]["qkv_w"] == "shared"
        }
        assert got == want, (minus1, new_impl, got, want)


def test_gumbel_arch_label():
    from msclip_tpu.models import MSClipSpec, init_params
    from msclip_tpu.models.extensions import ExtSpec
    from msclip_tpu.train.optim import param_labels

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=64, context_length=8,
        ext=ExtSpec(gumbel_select=True, gumbel_addtwo=True),
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    assert "gumbel_logit" in params
    labels = param_labels(params, spec)
    assert labels["gumbel_logit"] == "arch"


def test_drop_path_active_in_training_forward():
    """encode_image with rng + drop_path produces stochastic output."""
    import dataclasses

    from msclip_tpu.models import MSClipSpec, encode_image, init_params

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=64, vision_drop_path=0.5,
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)),
        jnp.float32,
    )
    a = encode_image(params, spec, x, rng=jax.random.PRNGKey(1))
    b = encode_image(params, spec, x, rng=jax.random.PRNGKey(2))
    c = encode_image(params, spec, x)  # eval: deterministic
    d = encode_image(params, spec, x)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_gumbel_train_step_updates_arch():
    """Train step with GUMBEL_SELECT: runs, loss finite, gumbel_logit gets
    gradient updates through the straight-through estimator."""
    from msclip_tpu.config import get_default_config
    from msclip_tpu.models import MSClipModel, MSClipSpec
    from msclip_tpu.models.extensions import ExtSpec
    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import init_train_state, make_train_step

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=128, context_length=8,
        ext=ExtSpec(gumbel_select=True, gumbel_addtwo=True),
    )
    model = MSClipModel(spec)
    cfg = get_default_config()
    cfg.CUSTOM.GUMBEL_LR = 1e-2
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    state = init_train_state(model, tx, params=params)
    step = make_train_step(spec, tx, donate=False)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((4, 8), np.int32)
    tokens[:, 0] = 126
    tokens[:, 1] = 5
    tokens[:, 2] = 127
    logit0 = np.asarray(state.params["gumbel_logit"])
    for _ in range(3):
        state, metrics = step(state, images, jnp.asarray(tokens))
    assert np.isfinite(float(metrics["loss"]))
    assert np.abs(
        np.asarray(state.params["gumbel_logit"]) - logit0
    ).max() > 0


def test_gumbel_gradcache_matches_oneshot():
    """GUMBEL_SELECT + TPU.ACCUM_STEPS: the GradCache step samples ONE
    architecture action per step from the one-shot step's key derivation
    (fold_in(rng, 1)), so with drop-path off and no BN the accumulated
    gradients match the one-shot step — the InfoNCE matrix must not mix
    embeddings from different sampled architectures."""
    from msclip_tpu.config import get_default_config
    from msclip_tpu.models import MSClipModel, MSClipSpec
    from msclip_tpu.models.extensions import ExtSpec
    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import init_train_state, make_train_step

    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=128, context_length=8,
        ext=ExtSpec(gumbel_select=True, gumbel_addtwo=True),
    )
    model = MSClipModel(spec)
    cfg = get_default_config()
    params = model.init(jax.random.PRNGKey(4))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((8, 8), np.int32)
    tokens[:, 0] = 126
    tokens[:, 1] = np.arange(8) % 120 + 1
    tokens[:, 2] = 127
    tokens = jnp.asarray(tokens)

    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, donate=False)
    state_a, m_a = step_a(state_a, images, tokens)

    state_b = init_train_state(model, tx, params=params)
    step_b = make_train_step(spec, tx, donate=False, accum_steps=4)
    state_b, m_b = step_b(state_b, images, tokens)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)
