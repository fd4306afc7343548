"""Distributed-path tests on the 8-device virtual CPU mesh (SURVEY.md §4.4):
the sharded / chunked InfoNCE (loss AND grads) must equal the single-device
computation on the same global batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from msclip_tpu.parallel import (
    chunked_sharded_infonce_loss,
    create_mesh,
    infonce_loss,
    ring_infonce_loss,
    sharded_infonce_loss,
)


def _feats(b, e, seed):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((b, e)).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("loss_fn", [sharded_infonce_loss,
                                     chunked_sharded_infonce_loss,
                                     ring_infonce_loss])
def test_sharded_loss_matches_global(loss_fn):
    B, E = 64, 32
    img, txt = _feats(B, E, 0), _feats(B, E, 1)
    scale = jnp.asarray(0.7)
    want = infonce_loss(jnp.array(img), jnp.array(txt), scale)

    mesh = create_mesh(data=8, model=1)
    fn = shard_map(
        lambda i, t, s: loss_fn(i, t, s, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P(),
    )
    got = fn(jnp.array(img), jnp.array(txt), scale)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.parametrize("loss_fn", [sharded_infonce_loss,
                                     chunked_sharded_infonce_loss,
                                     ring_infonce_loss])
def test_sharded_grads_match_global(loss_fn):
    """all_gather's differentiability: grads through the sharded loss equal
    the single-device grads (the property the reference needed a manual
    grad-swap hack for, lib/utils/comm.py:140-154)."""
    B, E = 32, 16
    img, txt = _feats(B, E, 2), _feats(B, E, 3)
    scale = jnp.asarray(0.3)

    want = jax.grad(
        lambda i, t, s: infonce_loss(i, t, s), argnums=(0, 1, 2)
    )(jnp.array(img), jnp.array(txt), scale)

    mesh = create_mesh(data=8, model=1)

    def local_loss(i, t, s):
        return loss_fn(i, t, s, axis_name="data")

    grad_fn = shard_map(
        jax.grad(local_loss, argnums=(0, 1, 2)),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=(P("data"), P("data"), P()),
    )
    got = grad_fn(jnp.array(img), jnp.array(txt), scale)
    for g, w in zip(got[:2], want[:2]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)
    # scale grad is pmean'd per chip; equals the global scale grad
    np.testing.assert_allclose(float(got[2]), float(want[2]), rtol=1e-5)


@pytest.mark.parametrize("loss_fn", [sharded_infonce_loss,
                                     chunked_sharded_infonce_loss,
                                     ring_infonce_loss])
def test_sharded_label_smoothing_matches_global(loss_fn):
    """LOSS.LABEL_SMOOTHING parity: both sharded losses must equal the
    global loss under smoothing (round-1 gap: they dropped the term)."""
    B, E, ls = 48, 16, 0.1
    img, txt = _feats(B, E, 6), _feats(B, E, 7)
    scale = jnp.asarray(0.5)
    want = infonce_loss(jnp.array(img), jnp.array(txt), scale,
                        label_smoothing=ls)
    plain = infonce_loss(jnp.array(img), jnp.array(txt), scale)
    assert abs(float(want) - float(plain)) > 1e-4  # smoothing does bite

    mesh = create_mesh(data=8, model=1)
    kwargs = {"chunk": 20} if loss_fn is chunked_sharded_infonce_loss else {}
    fn = shard_map(
        lambda i, t, s: loss_fn(i, t, s, axis_name="data",
                                label_smoothing=ls, **kwargs),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P(),
    )
    got = fn(jnp.array(img), jnp.array(txt), scale)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_chunked_padding_correct():
    """Chunk size not dividing the global batch still gives the exact loss."""
    B, E = 48, 16
    img, txt = _feats(B, E, 4), _feats(B, E, 5)
    scale = jnp.asarray(0.5)
    want = infonce_loss(jnp.array(img), jnp.array(txt), scale)
    mesh = create_mesh(data=8, model=1)
    fn = shard_map(
        lambda i, t, s: chunked_sharded_infonce_loss(
            i, t, s, axis_name="data", chunk=20
        ),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P(),
    )
    got = fn(jnp.array(img), jnp.array(txt), scale)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_chunked_direction_standalone_matches_global():
    """chunked_direction with axis_name=None (the profile-harness path,
    experiments/profile_train.py) reproduces the global loss exactly when
    fed pre-gathered columns — guards the r2 extraction of the direction
    body out of chunked_sharded_infonce_loss."""
    from msclip_tpu.parallel.infonce import chunked_direction

    B, E, chunk = 48, 16, 20
    img, txt = _feats(B, E, 8), _feats(B, E, 9)
    scale = jnp.asarray(0.5)
    want = infonce_loss(jnp.array(img), jnp.array(txt), scale)

    T = jnp.exp(scale).astype(jnp.float32)
    labels = jnp.arange(B)
    pad = (-B) % chunk
    img_p = jnp.pad(jnp.array(img), ((0, pad), (0, 0)))
    txt_p = jnp.pad(jnp.array(txt), ((0, pad), (0, 0)))
    got = 0.5 * (
        chunked_direction(jnp.array(img), txt_p, T, labels, B, chunk)
        + chunked_direction(jnp.array(txt), img_p, T, labels, B, chunk)
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_param_shardings_tp():
    """TP rules: qkv/c_fc column-split, out/c_proj row-split, rest
    replicated."""
    from msclip_tpu.models import MSClipSpec, init_params
    from msclip_tpu.parallel import param_shardings

    mesh = create_mesh(data=4, model=2)
    spec = MSClipSpec(
        embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
        vision_patch_size=16, vision_heads=1, text_width=64, text_heads=1,
        text_layers=2, vocab_size=128,
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    shardings = param_shardings(mesh, params)
    blk = shardings["visual"]["blocks"][0]
    assert blk["attn"]["qkv_w"].spec == P(None, "model")
    assert blk["attn"]["out_w"].spec == P("model", None)
    assert blk["mlp"]["c_fc"]["w"].spec == P(None, "model")
    assert blk["mlp"]["c_proj"]["w"].spec == P("model", None)
    assert shardings["visual"]["proj"].spec == P()
    # shardable: device_put must succeed
    jax.device_put(params, shardings)


def test_ring_train_step_matches_chunked():
    """TPU.RING_LOSS end-to-end: a mesh train step with the ring loss
    tracks the chunked-loss step numerically (same params after 2 steps),
    through the custom-VJP backward ring pass."""
    from msclip_tpu.config import get_default_config
    from msclip_tpu.models import MSClipModel
    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import init_train_state, make_train_step
    from test_train import _batch, _cfg, tiny_spec

    spec = tiny_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(1))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    images, tokens = _batch(spec, b=16, seed=9)
    mesh = create_mesh(data=8, model=1)

    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, mesh=mesh, donate=False,
                             sharded_loss=True, loss_chunk=8)
    state_b = init_train_state(model, tx, params=params)
    step_b = make_train_step(spec, tx, mesh=mesh, donate=False,
                             sharded_loss=True, ring_loss=True)
    for _ in range(2):
        state_a, m_a = step_a(state_a, images, tokens)
        state_b, m_b = step_b(state_b, images, tokens)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
