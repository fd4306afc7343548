"""Training-step tests: optimizer groups, BN-stat threading, loss descent,
mesh-sharded step equivalence, checkpoint save/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.config import get_default_config
from msclip_tpu.models import MSClipModel, MSClipSpec
from msclip_tpu.train.optim import (
    build_optimizer,
    param_labels,
    timm_cosine_schedule,
    wd_mask,
)
from msclip_tpu.train.trainer import (
    TrainState,
    init_train_state,
    make_train_step,
)


def tiny_spec(**kw):
    defaults = dict(
        embed_dim=16,
        image_resolution=32,
        vision_width=64,
        vision_layers=3,
        vision_patch_size=16,
        vision_heads=1,
        text_width=64,
        text_heads=1,
        text_layers=3,
        vocab_size=128,
        context_length=16,
        share_modules=(
            "attn.in_proj_weight", "attn.in_proj_bias", "attn.out_proj",
            "mlp",
        ),
        share_n_layers=1,
    )
    defaults.update(kw)
    return MSClipSpec(**defaults)


def tiny_msclips_spec():
    """With stem + parallel branch so BN training stats are exercised."""
    return tiny_spec(
        early_conv=True,
        parallel=True,
        lateral_layers=(2,),
        t2b_kernels=(16, 8, 4, 2, 1),
        t2b_paddings=(0, 0, 0, 0, 0),
        t2b_strides=(16, 8, 4, 2, 1),
        t2b_use_cls=True,
        parallel_resnet_layers=(0, 1, 1, 1, 1),
    )


def _cfg():
    cfg = get_default_config()
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.WD = 0.05
    cfg.TRAIN.WITHOUT_WD_LIST = ["bn", "bias", "ln"]
    cfg.TRAIN.END_EPOCH = 4
    cfg.TRAIN.LR_SCHEDULER.merge_from_dict(
        {"METHOD": "timm",
         "ARGS": {"warmup_epochs": 1, "warmup_lr": 1e-6, "min_lr": 1e-5}}
    )
    cfg.CUSTOM.LR_SHARE = 2e-3
    cfg.CUSTOM.WD_SHARE = 0.2
    return cfg


def _batch(spec, b=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal(
        (b, spec.image_resolution, spec.image_resolution, 3)
    ).astype(np.float32)
    tokens = np.zeros((b, spec.context_length), np.int32)
    tokens[:, 0] = spec.vocab_size - 2
    for i in range(b):
        n = int(rng.integers(3, spec.context_length - 1))
        tokens[i, 1:n] = rng.integers(1, spec.vocab_size - 2, n - 1)
        tokens[i, n] = spec.vocab_size - 1
    return jnp.asarray(images), jnp.asarray(tokens)


def test_param_labels():
    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    labels = param_labels(params, spec)
    # BN stats are frozen state
    assert labels["visual"]["stem"]["bn1"]["mean"] == "state"
    assert labels["visual"]["stem"]["bn1"]["scale"] == "regular"
    # shared trunk tensors get the 'shared' group (trunk block 0 = layer 1)
    assert labels["visual"]["blocks"][0]["attn"]["qkv_w"] == "shared"
    assert labels["visual"]["blocks"][0]["mlp"]["c_fc"]["w"] == "shared"
    # LNs inside shared blocks are NOT aliased by SHARE_MODULES
    assert labels["visual"]["blocks"][0]["ln_1"]["scale"] == "regular"
    assert labels["text"]["token_embedding"] == "regular"


def test_wd_mask():
    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    mask = wd_mask(params, ["bn", "bias", "ln"])
    assert mask["visual"]["blocks"][0]["attn"]["qkv_w"] is True
    assert mask["visual"]["blocks"][0]["attn"]["qkv_b"] is False
    assert mask["visual"]["blocks"][0]["ln_1"]["scale"] is False
    assert mask["visual"]["stem"]["bn1"]["scale"] is False
    assert mask["visual"]["positional_embedding"] is False  # no_weight_decay
    assert mask["logit_scale"] is False
    assert mask["visual"]["proj"] is True


def test_schedule_shape():
    sched = timm_cosine_schedule(
        1e-3, steps_per_epoch=10, epochs=10, warmup_epochs=2,
        warmup_lr=1e-6, min_lr=1e-5,
    )
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-2)
    assert float(sched(20)) == pytest.approx(1e-3, rel=1e-2)
    assert float(sched(200)) == pytest.approx(1e-5, rel=1e-2)
    # monotone warmup
    assert float(sched(10)) < float(sched(19))


def test_train_step_descends_and_updates_bn():
    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    state = init_train_state(model, tx, params=params)
    step = make_train_step(spec, tx)

    images, tokens = _batch(spec)
    bn_before = np.asarray(state.params["visual"]["stem"]["bn1"]["mean"])
    losses = []
    for i in range(8):
        state, metrics = step(state, images, tokens)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    bn_after = np.asarray(state.params["visual"]["stem"]["bn1"]["mean"])
    assert np.abs(bn_after - bn_before).max() > 1e-6
    assert int(state.step) == 8


def test_train_step_sharded_matches_single():
    """The mesh-sharded step (8-device DP + sharded loss) must track the
    single-device step numerically."""
    from msclip_tpu.parallel import create_mesh

    spec = tiny_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(1))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)

    images, tokens = _batch(spec, b=16, seed=3)

    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, donate=False)
    state_a, m_a = step_a(state_a, images, tokens)

    mesh = create_mesh(data=8, model=1)
    state_b = init_train_state(model, tx, params=params)
    step_b = make_train_step(spec, tx, mesh=mesh, sharded_loss=True,
                             loss_chunk=8, donate=False)
    state_b, m_b = step_b(state_b, images, tokens)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-4)
    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_train_step_zero1_matches_unsharded():
    """TPU.ZERO1 (AdamW moments sharded over the data axis — the
    TPU-native DeepSpeed zero_optimization stage 1) must change memory
    placement only: two mesh steps with ZeRO-sharded optimizer state
    track the replicated-state steps numerically, and the moment arrays
    really are distributed."""
    from msclip_tpu.parallel import (
        create_mesh,
        optstate_shardings,
        shard_opt_state,
    )

    spec = tiny_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(1))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    images, tokens = _batch(spec, b=16, seed=4)
    mesh = create_mesh(data=8, model=1)

    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, mesh=mesh, donate=False)

    state_b = init_train_state(model, tx, params=params)
    state_b = state_b._replace(
        opt_state=shard_opt_state(state_b.opt_state, mesh)
    )
    sharded = [
        l for l in jax.tree.leaves(state_b.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded, "no optimizer-state leaf was actually ZeRO-sharded"
    step_b = make_train_step(
        spec, tx, mesh=mesh, donate=False,
        opt_shardings=optstate_shardings(mesh, state_b.opt_state),
    )

    for _ in range(2):
        state_a, m_a = step_a(state_a, images, tokens)
        state_b, m_b = step_b(state_b, images, tokens)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    # the pin must survive the step: sharding propagation is otherwise
    # free to emit replicated opt-state outputs and erase the ZeRO win
    still_sharded = [
        l for l in jax.tree.leaves(state_b.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert still_sharded, "opt_state came back fully replicated after steps"
    # ...and must not leak into the params: the step is
    # sharding-preserving, so updated params keep their input layout
    # (propagation from data-sharded moments once turned every param
    # P('data'), forcing a recompile per step and per-step reshards)
    for leaf in jax.tree.leaves(state_b.params):
        assert leaf.sharding.is_fully_replicated, leaf.sharding
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        # 1e-5: reduction order differs under the distributed layout
        # (measured max divergence 1.1e-6 after two steps)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_fsdp_matches_unsharded():
    """TPU.FSDP (ZeRO-3 analogue: params stored partitioned over the data
    axis, XLA gathers weights at use and reduce-scatters grads into the
    partitioned update) must change memory placement only. Also proves
    the two load-bearing inheritance facts the tools/train.py wiring
    relies on: optax moment init inherits the FSDP leaf shardings, and
    the sharding-preserving step keeps params AND moments partitioned
    across steps without an opt_shardings pin."""
    from msclip_tpu.parallel import create_mesh, shard_params_fsdp

    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(1))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    images, tokens = _batch(spec, b=16, seed=4)
    mesh = create_mesh(data=8, model=1)

    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, mesh=mesh, donate=False)

    # tiny-spec leaves are all below the production 64k-element cutoff;
    # drop it so the test actually exercises partitioned storage
    fsdp_params = shard_params_fsdp(params, mesh, min_size=128)
    n_sharded = sum(
        1 for l in jax.tree.leaves(fsdp_params)
        if not l.sharding.is_fully_replicated
    )
    assert n_sharded > 0, "no param leaf was actually FSDP-sharded"
    tx_b, _ = build_optimizer(cfg, fsdp_params, spec, steps_per_epoch=10)
    state_b = init_train_state(model, tx_b, params=fsdp_params)
    sharded_moments = [
        l for l in jax.tree.leaves(state_b.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded_moments, "optax init did not inherit FSDP shardings"
    step_b = make_train_step(spec, tx_b, mesh=mesh, donate=False)

    for _ in range(2):
        state_a, m_a = step_a(state_a, images, tokens)
        state_b, m_b = step_b(state_b, images, tokens)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    still_sharded = sum(
        1 for l in jax.tree.leaves(state_b.params)
        if not l.sharding.is_fully_replicated
    )
    assert still_sharded == n_sharded, (
        "params did not keep their FSDP layout across steps"
    )
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(state_b.opt_state)
    ), "moments came back replicated after steps"
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from msclip_tpu.train import CheckpointManager, auto_resume

    spec = tiny_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    state = init_train_state(model, tx, params=params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, state.params, state.opt_state, extra={"epoch": 1})
    mgr.wait()

    p2, o2, step, extra = auto_resume(mgr, state.params, state.opt_state)
    assert step == 5
    assert extra["epoch"] == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_swa_anneal_schedule():
    """SWA.LR_RATIO/ANNEAL_EPOCHS/ANNEAL_STRATEGY (torch SWALR semantics:
    anneal from the LR at SWA start to LR*RATIO over ANNEAL_EPOCHS, then
    hold)."""
    from msclip_tpu.train.optim import swa_anneal_wrap

    cfg = _cfg()
    cfg.SWA.ENABLED = True
    cfg.SWA.BEGIN_EPOCH = 2
    cfg.SWA.ANNEAL_EPOCHS = 2
    cfg.SWA.LR_RATIO = 0.5
    base = lambda s: jnp.asarray(1e-3)  # noqa: E731

    sched = swa_anneal_wrap(base, cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(5)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(20)), 1e-3, rtol=1e-6)
    # cos midpoint: alpha=(1-cos(pi/2))/2 = 0.5 -> halfway to swa_lr
    np.testing.assert_allclose(float(sched(30)), 0.75e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(40)), 0.5e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.5e-3, rtol=1e-6)

    cfg.SWA.ANNEAL_STRATEGY = "linear"
    sched = swa_anneal_wrap(base, cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(25)), 0.875e-3, rtol=1e-6)

    cfg.SWA.ENABLED = False
    assert swa_anneal_wrap(base, cfg, 10) is base


def test_swa_anneal_matches_torch_swalr():
    """Oracle: swa_anneal_wrap evaluated at epoch boundaries must equal
    torch.optim.swa_utils.SWALR stepped once per epoch (both strategies,
    several anneal lengths)."""
    import torch
    from torch.optim.swa_utils import SWALR

    from msclip_tpu.train.optim import swa_anneal_wrap

    base_lr, ratio = 1e-3, 0.5
    steps_per_epoch = 7
    for strategy in ("cos", "linear"):
        for anneal_epochs in (1, 3, 5):
            cfg = _cfg()
            cfg.SWA.ENABLED = True
            cfg.SWA.BEGIN_EPOCH = 2
            cfg.SWA.ANNEAL_EPOCHS = anneal_epochs
            cfg.SWA.LR_RATIO = ratio
            cfg.SWA.ANNEAL_STRATEGY = strategy
            cfg.TRAIN.LR = base_lr
            sched = swa_anneal_wrap(lambda s: jnp.asarray(base_lr), cfg,
                                    steps_per_epoch)

            p = torch.nn.Parameter(torch.zeros(1))
            opt = torch.optim.SGD([p], lr=base_lr)
            swalr = SWALR(opt, swa_lr=base_lr * ratio,
                          anneal_epochs=anneal_epochs,
                          anneal_strategy=strategy)
            # torch steps the scheduler once per epoch from SWA start;
            # compare at every epoch boundary from SWA begin onward
            for k in range(anneal_epochs + 3):
                torch_lr = opt.param_groups[0]["lr"]
                ours = float(sched((cfg.SWA.BEGIN_EPOCH + k)
                                   * steps_per_epoch))
                np.testing.assert_allclose(
                    ours, torch_lr, rtol=1e-6,
                    err_msg=f"{strategy} anneal={anneal_epochs} epoch+{k}",
                )
                swalr.step()

    # two groups, scalar swa_lr: torch anneals BOTH to the same swa_lr —
    # our shared-trunk group (scaled schedule) must do the same, so the
    # anneal wraps the composed schedule, not the unscaled base
    cfg = _cfg()
    cfg.SWA.ENABLED = True
    cfg.SWA.BEGIN_EPOCH = 2
    cfg.SWA.ANNEAL_EPOCHS = 3
    cfg.SWA.LR_RATIO = ratio
    cfg.TRAIN.LR = base_lr
    share_scale = 0.1
    share = swa_anneal_wrap(lambda s: jnp.asarray(base_lr) * share_scale,
                            cfg, steps_per_epoch)
    p1 = torch.nn.Parameter(torch.zeros(1))
    p2 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([{"params": [p1], "lr": base_lr},
                           {"params": [p2], "lr": base_lr * share_scale}])
    swalr = SWALR(opt, swa_lr=base_lr * ratio, anneal_epochs=3,
                  anneal_strategy="cos")
    for k in range(6):
        torch_lr = opt.param_groups[1]["lr"]
        ours = float(share((2 + k) * steps_per_epoch))
        np.testing.assert_allclose(ours, torch_lr, rtol=1e-6,
                                   err_msg=f"shared group epoch+{k}")
        swalr.step()


def test_frozen_bn_train_step():
    """SWA.FROZEN_BN: a freeze_bn step must use (and not touch) the BN
    running stats; the default step updates them."""
    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    images, tokens = _batch(spec)

    def bn_stats(p):
        return (np.asarray(p["visual"]["stem"]["bn1"]["mean"]),
                np.asarray(p["visual"]["stem"]["bn1"]["var"]))

    state = init_train_state(model, tx, params=params)
    m0, v0 = bn_stats(state.params)
    frozen = make_train_step(spec, tx, freeze_bn=True, donate=False)
    s1, _ = frozen(state, images, tokens)
    m1, v1 = bn_stats(s1.params)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(v0, v1)

    s2, _ = make_train_step(spec, tx, donate=False)(state, images, tokens)
    m2, v2 = bn_stats(s2.params)
    assert not np.array_equal(m0, m2) and not np.array_equal(v0, v2)

    # the running stats are buffers, not parameters: the frozen fold
    # must not leak gradients into them (torch requires_grad=False) —
    # phantom grads would inflate clip_by_global_norm and grad_norm
    from msclip_tpu.train.trainer import make_loss_fn

    loss_fn = make_loss_fn(spec, freeze_bn=True)
    grads = jax.grad(
        lambda p: loss_fn(p, images, tokens)[0]
    )(state.params)
    g_bn = grads["visual"]["stem"]["bn1"]
    np.testing.assert_array_equal(np.asarray(g_bn["mean"]), 0.0)
    np.testing.assert_array_equal(np.asarray(g_bn["var"]), 0.0)
    # the learnable affine still trains
    assert np.abs(np.asarray(g_bn["scale"])).max() > 0


def test_checkpoint_force_replace_and_shadows(tmp_path):
    """force=True must REPLACE an existing step (orbax's own force flag
    raises StepAlreadyExistsError), and shadow trees (ema/swa) round-trip
    with their own templates."""
    from msclip_tpu.train import CheckpointManager, auto_resume

    spec = tiny_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    state = init_train_state(model, tx, params=params)
    ema = jax.tree.map(lambda x: x + 1.0, params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state.params, state.opt_state, extra={"epoch": 3})
    # same step again, new metadata + shadows, WITHOUT waiting: the
    # first save may still be in flight (not yet in all_steps()), and
    # force=True must wait + replace rather than raise
    # StepAlreadyExistsError
    mgr.save(7, state.params, state.opt_state,
             extra={"epoch": 4, "swa_n": 2}, force=True,
             shadows={"ema": ema, "swa": params})
    mgr.wait()

    p, o, step, extra = auto_resume(
        mgr, state.params, state.opt_state,
        shadow_templates={"ema": params, "swa": params},
    )
    assert step == 7 and extra["epoch"] == 4 and extra["swa_n"] == 2
    got_ema = extra["shadows"]["ema"]
    for a, b in zip(jax.tree.leaves(got_ema), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_swa_refresh_bn():
    """torch update_bn semantics: the refreshed running stats are the
    cumulative average of per-batch statistics — batch 0 fully replaces
    the stale stats (two different initial stat sets converge), and two
    passes over identical data give identical results."""
    from msclip_tpu.train.averaging import swa_refresh_bn

    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = [
        rng.standard_normal(
            (4, spec.image_resolution, spec.image_resolution, 3)
        ).astype(np.float32)
        for _ in range(3)
    ]

    def stats(p):
        return (np.asarray(p["visual"]["stem"]["bn1"]["mean"]),
                np.asarray(p["visual"]["stem"]["bn1"]["var"]))

    refreshed = swa_refresh_bn(params, spec, batches)
    m1, v1 = stats(refreshed)
    assert not np.array_equal(m1, stats(params)[0])

    # batch 0 replaces: corrupt the initial stats -> same result
    corrupted = jax.tree.map(lambda x: x, params)
    corrupted["visual"] = dict(corrupted["visual"])
    corrupted["visual"]["stem"] = dict(corrupted["visual"]["stem"])
    corrupted["visual"]["stem"]["bn1"] = {
        **corrupted["visual"]["stem"]["bn1"],
        "mean": params["visual"]["stem"]["bn1"]["mean"] + 100.0,
        "var": params["visual"]["stem"]["bn1"]["var"] * 50.0,
    }
    m2, v2 = stats(swa_refresh_bn(corrupted, spec, batches))
    np.testing.assert_allclose(m1, m2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)

    # CMA: three identical batches == one batch
    same = [batches[0]] * 3
    m3, _ = stats(swa_refresh_bn(params, spec, same))
    m4, _ = stats(swa_refresh_bn(params, spec, [batches[0]]))
    np.testing.assert_allclose(m3, m4, rtol=1e-5, atol=1e-6)

    # BN-free spec: no-op (and no forward passes)
    plain = tiny_spec()
    pp = MSClipModel(plain).init(jax.random.PRNGKey(0))
    out = swa_refresh_bn(pp, plain, batches)
    assert out is pp


def test_ema_step_with_donation():
    """EMA shadows must be distinct buffers: init aliased them to params,
    and the donated step then donated the same buffer twice
    (Execute() INVALID_ARGUMENT on the very first step). Regression:
    run two donated steps with ema_decay>0 and check the EMA tracks."""
    spec = tiny_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    state = init_train_state(model, tx, params=params, ema_decay=0.9)
    images, tokens = _batch(spec)

    step = make_train_step(spec, tx, ema_decay=0.9)  # donate=True default
    state, _ = step(state, images, tokens)
    state, _ = step(state, images, tokens)
    p_leaves = jax.tree.leaves(state.params)
    e_leaves = jax.tree.leaves(state.ema_params)
    assert any(
        not np.array_equal(np.asarray(p), np.asarray(e))
        for p, e in zip(p_leaves, e_leaves)
    )
    # all leaves finite (the donated buffers were not clobbered)
    for e in e_leaves:
        assert np.isfinite(np.asarray(e)).all()


def test_loader_num_batches_matches_len():
    """num_batches (arithmetic, no sampler draw) == the number of batches
    the loader actually yields, across sampler/shard/drop_last combos —
    resume bookkeeping and __len__ rely on it."""
    from msclip_tpu.data.loader import BatchLoader

    class DS:
        # (path, label) pairs: class_aware reads labels via .samples
        samples = [(f"img{i}", i % 5) for i in range(29)]

        def __len__(self):
            return 29

        def __getitem__(self, i):
            return np.zeros((2, 2, 3), np.float32), i

    for sampler in ("default", "class_aware", "chunk"):
        for world in (1, 2, 3):
            for rank in range(world):
                for drop in (False, True):
                    loader = BatchLoader(DS(), 4, shard=(rank, world),
                                         drop_last=drop, sampler=sampler,
                                         workers=0)
                    yielded = sum(1 for _ in loader)
                    assert loader.num_batches == yielded, (
                        sampler, world, rank, drop)


def test_gradcache_accum_matches_oneshot():
    """TPU.ACCUM_STEPS (GradCache two-pass): with frozen BN the
    accumulated step must reproduce the one-shot step exactly — same
    loss, same grads, same updated params — because InfoNCE is computed
    over the full batch from cached embeddings."""
    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(2))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    images, tokens = _batch(spec, b=8, seed=5)

    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, freeze_bn=True, donate=False)
    state_a, m_a = step_a(state_a, images, tokens)

    state_b = init_train_state(model, tx, params=params)
    step_b = make_train_step(spec, tx, freeze_bn=True, donate=False,
                             accum_steps=4)
    state_b, m_b = step_b(state_b, images, tokens)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_gradcache_accum_bn_training_and_mesh():
    """Accumulation with training-mode BN (per-microbatch statistics,
    averaged running-stat update) descends and moves BN stats; and the
    mesh + sharded-loss + accum combination matches the mesh one-shot
    step when BN is frozen."""
    from msclip_tpu.parallel import create_mesh

    spec = tiny_msclips_spec()
    model = MSClipModel(spec)
    cfg = _cfg()
    params = model.init(jax.random.PRNGKey(3))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    images, tokens = _batch(spec, b=8, seed=7)

    # training BN: runs, descends, stats move
    state = init_train_state(model, tx, params=params)
    step = make_train_step(spec, tx, accum_steps=2, donate=False)
    bn_before = np.asarray(state.params["visual"]["stem"]["bn1"]["mean"])
    losses = []
    for _ in range(4):
        state, metrics = step(state, images, tokens)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    bn_after = np.asarray(state.params["visual"]["stem"]["bn1"]["mean"])
    assert np.abs(bn_after - bn_before).max() > 1e-6

    # mesh path equivalence (frozen BN for exactness)
    mesh = create_mesh(data=8, model=1)
    images, tokens = _batch(spec, b=16, seed=8)
    state_a = init_train_state(model, tx, params=params)
    step_a = make_train_step(spec, tx, mesh=mesh, sharded_loss=True,
                             loss_chunk=8, freeze_bn=True, donate=False)
    state_a, m_a = step_a(state_a, images, tokens)

    state_b = init_train_state(model, tx, params=params)
    step_b = make_train_step(spec, tx, mesh=mesh, sharded_loss=True,
                             loss_chunk=8, freeze_bn=True, donate=False,
                             accum_steps=2)
    state_b, m_b = step_b(state_b, images, tokens)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


@pytest.mark.slow
def test_flagship_composition_fullsize():
    """The composed flagship recipe — TPU.FSDP x TPU.RING_LOSS x
    TPU.ACCUM_STEPS — run as ONE program at full b32 geometry (VERDICT r4
    #4: each flag was proven equal in isolation; this is the exact
    combination a 32k-batch v5e-64 user runs, docs/SCALING.md "the
    flagship recipe"). Asserts over 3 steps: per-step loss equals the
    plain replicated global-loss step, final params match, and the FSDP
    layout (params AND moments partitioned) survives stepping."""
    import os as _os

    from msclip_tpu.config import update_config
    from msclip_tpu.models import spec_from_config
    from msclip_tpu.parallel import create_mesh, shard_params_fsdp

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    cfg = _cfg()
    update_config(
        cfg, _os.path.join(repo, "experiments/model/b32-yfcc-msclips.yaml")
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"  # exact-equality comparison
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(1))
    mesh = create_mesh(data=8, model=1)
    images, tokens = _batch(spec, b=16, seed=11)  # 2/chip over data=8

    # plain oracle: replicated params, global-batch InfoNCE
    tx_a, _ = build_optimizer(cfg, params, spec, steps_per_epoch=10)
    state_a = init_train_state(model, tx_a, params=params)
    step_a = make_train_step(spec, tx_a, mesh=mesh, donate=False,
                             freeze_bn=True)

    # flagship: FSDP storage + ring loss + GradCache accumulation
    fsdp_params = shard_params_fsdp(params, mesh)  # production min_size
    n_sharded = sum(1 for l in jax.tree.leaves(fsdp_params)
                    if not l.sharding.is_fully_replicated)
    assert n_sharded > 0
    tx_b, _ = build_optimizer(cfg, fsdp_params, spec, steps_per_epoch=10)
    state_b = init_train_state(model, tx_b, params=fsdp_params)
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(state_b.opt_state)
    ), "moments did not inherit the FSDP layout"
    step_b = make_train_step(spec, tx_b, mesh=mesh, donate=False,
                             freeze_bn=True, sharded_loss=True,
                             ring_loss=True, accum_steps=2)

    for i in range(3):
        state_a, m_a = step_a(state_a, images, tokens)
        state_b, m_b = step_b(state_b, images, tokens)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5,
            err_msg=f"step {i}: composed loss diverged from replicated")
    assert sum(1 for l in jax.tree.leaves(state_b.params)
               if not l.sharding.is_fully_replicated) == n_sharded, (
        "FSDP param layout did not survive 3 composed steps")
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(state_b.opt_state)
    ), "moments re-replicated after stepping"
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)
