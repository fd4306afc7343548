"""Training step + loop.

The TPU-native reconstruction of the reference's (absent) train driver from
its config surface (SURVEY.md §3.3): global-batch InfoNCE over the data
axis, AdamW param groups, warmup-cosine schedule, grad clipping, EMA,
Orbax checkpointing with AUTO_RESUME.

Parallelism: the step is jit-compiled with explicit shardings over a
``('data','model')`` mesh — batch sharded on ``data``, params replicated
(or TP-sharded on ``model``). Under jit, batch statistics and the InfoNCE
similarity matrix have *global* semantics: XLA inserts the all-gathers /
psums over ICI (the differentiable equivalent of the reference's
``gather_tensors`` hack). For very large global batches, set
``TPU.SHARDED_LOSS`` to switch the loss to the shard_map chunked
online-logsumexp form.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import msclip as MM
from ..models.stem import BNState
from ..parallel import (
    DATA_AXIS,
    chunked_sharded_infonce_loss,
    infonce_loss,
    param_shardings,
)

# CLIP clamps the temperature at ln(100) to keep training stable
MAX_LOGIT_SCALE = 4.6052


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def apply_bn_updates(params, updates: dict):
    """Merge BNState-recorded running stats (path-string keyed) back into
    the param tree, purely."""
    if not updates:
        return params
    params = _copy_containers(params)
    for path, stats in updates.items():
        node = params
        for part in path.split("/")[:-1]:
            node = node[int(part) if part.isdigit() else part]
        leaf = path.split("/")[-1]
        node[leaf] = {**node[leaf], "mean": stats["mean"],
                      "var": stats["var"]}
    return params


def _copy_containers(tree):
    if isinstance(tree, dict):
        return {k: _copy_containers(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_copy_containers(v) for v in tree]
    return tree


def make_encode_fn(spec, freeze_bn: bool = False):
    """encode(params, images, tokens, rng) -> (fi, ft, bn_updates).

    ``rng`` drives the stochastic training-time paths: DropPath in the
    image tower and the Gumbel NAS action when GUMBEL_SELECT.
    ``action_rng`` overrides the Gumbel action's key derivation — the
    GradCache path passes the one-shot step's ``fold_in(rng, 1)`` so all
    microbatches share a single sampled architecture per step.
    ``freeze_bn`` (``SWA.FROZEN_BN``): run BatchNorm in eval mode — fold
    the running stats, record no updates.
    """

    def encode(params, images, tokens, rng, action_rng=None):
        bn = BNState(training=not freeze_bn)
        action = None
        if spec.ext.gumbel_select:
            if action_rng is None:
                action_rng = (None if rng is None
                              else jax.random.fold_in(rng, 1))
            action = MM.gumbel_action(params["gumbel_logit"], action_rng)
        dp_rng = None
        if rng is not None and spec.vision_drop_path > 0.0:
            dp_rng = jax.random.fold_in(rng, 2)
        fi = MM.encode_image(params, spec, images, bn=bn, action=action,
                             rng=dp_rng)
        ft = MM.encode_text(params, spec, tokens, action=action)
        return fi, ft, bn.updates

    return encode


def make_embedding_loss(mesh=None, sharded_loss=False, loss_chunk=4096,
                        label_smoothing=0.0, ring_loss=False):
    """emb_loss(fi, ft, logit_scale) -> scalar — the InfoNCE family over
    already-computed embeddings (the boundary GradCache accumulation
    caches at)."""
    if not sharded_loss:
        return functools.partial(infonce_loss,
                                 label_smoothing=label_smoothing)

    assert mesh is not None
    if ring_loss:
        # TPU.RING_LOSS: ring-rotated shards — O(b·E)/chip embedding
        # memory at any global batch (the beyond-32k configuration)
        from ..parallel import ring_infonce_loss

        inner = functools.partial(
            ring_infonce_loss, axis_name=DATA_AXIS,
            label_smoothing=label_smoothing,
        )
    else:
        inner = functools.partial(
            chunked_sharded_infonce_loss, axis_name=DATA_AXIS,
            chunk=loss_chunk, label_smoothing=label_smoothing,
        )
    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
    )


def make_loss_fn(spec, mesh=None, sharded_loss=False, loss_chunk=4096,
                 label_smoothing=0.0, ring_loss=False,
                 freeze_bn: bool = False):
    """loss_fn(params, images, tokens, rng) -> (loss, bn_updates)."""
    encode = make_encode_fn(spec, freeze_bn)
    emb_loss = make_embedding_loss(mesh, sharded_loss, loss_chunk,
                                   label_smoothing, ring_loss)

    def loss_fn(params, images, tokens, rng=None):
        fi, ft, bn_updates = encode(params, images, tokens, rng)
        loss = emb_loss(fi, ft, params["logit_scale"])
        return loss, bn_updates

    return loss_fn


def _gradcache_value_and_grad(encode, emb_loss, accum_steps, mesh=None):
    """GradCache two-pass gradient for the contrastive loss (Gao et al.
    2021, arXiv 2101.06983): InfoNCE couples the WHOLE batch, so naive
    microbatch accumulation is impossible. Instead:

      pass A  lax.scan over microbatches: embeddings only (no grads —
              peak activation memory is one microbatch);
      loss    full-batch InfoNCE on the cached [B, E] embeddings;
              grads w.r.t. embeddings + logit_scale (tiny);
      pass B  lax.scan again: re-encode each microbatch under jax.vjp
              and pull back its cached embedding gradient, summing
              parameter grads.

    Gradients match the one-shot step (up to float reassociation from
    the scanned schedule — tested to atol 2e-5 on params) when BatchNorm
    is frozen and drop-path is off; the Gumbel NAS action, when enabled,
    is sampled ONCE per step from the one-shot step's key derivation, so
    GUMBEL_SELECT keeps one-shot semantics too. With training-mode BN,
    normalization uses per-microbatch statistics (the reference's
    per-GPU DDP BN semantics rather than our one-shot step's
    global-batch statistics); the recorded running-stat updates are
    averaged over microbatches — one momentum update from the mean of
    the microbatch statistics. Costs one extra forward pass; peak
    activation memory drops ~accum_steps×.

    Mesh path: the batch arrives sharded ``P(data)`` in contiguous
    per-chip stripes, so microbatches are taken INTERLEAVED — microbatch
    ``i`` is every chip's ``i``-th local sub-block, which makes the
    (a, B/a) microbatch layout a chip-local reshape (zero ICI traffic)
    where contiguous B/a blocks would all-to-all the full image tensor
    every step. The inverse reshape restores the ORIGINAL row order, so
    the cached [B, E] embeddings feed the sharded loss bit-identically
    to the one-shot step.
    """

    d = 1 if mesh is None else mesh.shape[DATA_AXIS]

    def to_micro(x, a):
        # (B, ...) P(data) -> (a, B/a, ...): chip-local everywhere.
        m = x.shape[0] // (d * a)
        y = x.reshape(d, a, m, *x.shape[1:])
        return jnp.moveaxis(y, 1, 0).reshape(a, d * m, *x.shape[1:])

    def from_micro(y):
        # inverse of to_micro: (a, B/a, ...) -> (B, ...) original order.
        a, b = y.shape[:2]
        x = y.reshape(a, d, b // d, *y.shape[2:])
        return jnp.moveaxis(x, 1, 0).reshape(a * b, *y.shape[2:])

    def value_and_grad(params, images, tokens, rng):
        a = accum_steps
        b = images.shape[0] // a
        assert images.shape[0] % (a * d) == 0, (
            f"batch {images.shape[0]} not divisible by "
            f"ACCUM_STEPS={a} x data-axis {d}")
        im = to_micro(images, a)
        tk = to_micro(tokens, a)
        if mesh is not None:
            micro_sh = NamedSharding(mesh, P(None, DATA_AXIS))
            im = jax.lax.with_sharding_constraint(im, micro_sh)
            tk = jax.lax.with_sharding_constraint(tk, micro_sh)

        # one Gumbel action per STEP (the one-shot step's derivation);
        # per-microbatch keys drive only drop-path
        arng = None if rng is None else jax.random.fold_in(rng, 1)

        def mrng(i):
            return None if rng is None else jax.random.fold_in(rng, i)

        def fwd(_, mt):
            imgs_i, toks_i, i = mt
            fi, ft, bn_updates = encode(params, imgs_i, toks_i, mrng(i),
                                        action_rng=arng)
            return None, (fi, ft, bn_updates)

        _, (fis, fts, bn_stack) = jax.lax.scan(
            fwd, None, (im, tk, jnp.arange(a)))
        fi = from_micro(fis)
        ft = from_micro(fts)
        # one momentum update from the mean of microbatch statistics
        bn_updates = jax.tree.map(lambda s: s.mean(axis=0), bn_stack)

        loss, (d_fi, d_ft, d_ls) = jax.value_and_grad(
            emb_loss, argnums=(0, 1, 2)
        )(fi, ft, params["logit_scale"])

        d_fis = to_micro(d_fi, a)
        d_fts = to_micro(d_ft, a)

        def bwd(acc, mt):
            imgs_i, toks_i, dfi_i, dft_i, i = mt

            def enc_p(p):
                fi_i, ft_i, _ = encode(p, imgs_i, toks_i, mrng(i),
                                       action_rng=arng)
                return fi_i, ft_i

            _, vjp = jax.vjp(enc_p, params)
            (g,) = vjp((dfi_i, dft_i))
            return jax.tree.map(jnp.add, acc, g), None

        zero = jax.tree.map(jnp.zeros_like, params)
        grads, _ = jax.lax.scan(
            bwd, zero, (im, tk, d_fis, d_fts, jnp.arange(a)))
        grads = {**grads,
                 "logit_scale": grads["logit_scale"] + d_ls}
        return (loss, bn_updates), grads

    return value_and_grad


def make_step_core(spec, tx, mesh=None, sharded_loss=False,
                   loss_chunk=4096, ema_decay: float = 0.0,
                   label_smoothing: float = 0.0, seed: int = 0,
                   ring_loss: bool = False, freeze_bn: bool = False,
                   accum_steps: int = 1):
    """The raw (un-jitted) train step: value_and_grad + optimizer + BN
    replay + EMA. Exposed separately so harnesses (bench.py,
    experiments/profile_train.py) can chain K steps inside one jit/scan —
    over a remote tunnel the per-dispatch RTT would otherwise swamp the
    measurement.

    ``accum_steps`` (``TPU.ACCUM_STEPS``): GradCache two-pass gradient
    accumulation — see :func:`_gradcache_value_and_grad`."""
    encode = make_encode_fn(spec, freeze_bn)
    emb_loss = make_embedding_loss(mesh, sharded_loss, loss_chunk,
                                   label_smoothing, ring_loss)
    if accum_steps > 1:
        vag = _gradcache_value_and_grad(encode, emb_loss, accum_steps,
                                        mesh=mesh)
    else:
        def loss_fn(params, images, tokens, rng=None):
            fi, ft, bn_updates = encode(params, images, tokens, rng)
            return emb_loss(fi, ft, params["logit_scale"]), bn_updates

        vag = jax.value_and_grad(loss_fn, has_aux=True)
    needs_rng = spec.vision_drop_path > 0.0 or spec.ext.gumbel_select

    def step_fn(state: TrainState, images, tokens):
        rng = (jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
               if needs_rng else None)
        (loss, bn_updates), grads = vag(
            state.params, images, tokens, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = apply_bn_updates(params, bn_updates)
        params = {**params, "logit_scale": jnp.minimum(
            params["logit_scale"], MAX_LOGIT_SCALE
        )}
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params
            )
        grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "logit_scale": params["logit_scale"]}
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    return step_fn


def make_train_step(spec, tx, mesh=None, sharded_loss=False,
                    loss_chunk=4096, ema_decay: float = 0.0,
                    donate: bool = True, label_smoothing: float = 0.0,
                    seed: int = 0, opt_shardings=None,
                    ring_loss: bool = False, freeze_bn: bool = False,
                    accum_steps: int = 1, compiler_options=None):
    """Build the jit-compiled train step.

    step(state, images, tokens) -> (state, metrics). The step derives a
    fresh rng from ``seed`` (``TPU.SEED``) and the step counter for the
    stochastic training paths.

    ``opt_shardings``: optional NamedSharding pytree (matching
    ``state.opt_state``) that the updated optimizer state is constrained
    to. Under ZeRO-1 (``TPU.ZERO1``) pass ``optstate_shardings(mesh,
    opt_state)`` — without the pin, sharding propagation is free to emit a
    replicated opt-state output and silently erase the memory saving after
    the first step. Mesh path only.

    ``compiler_options``: optional per-compile XLA options dict
    (``utils.platform.xla_compiler_options``; ``TPU.XLA_VMEM_KIB``) —
    must be None on non-TPU backends.
    """
    step_fn = make_step_core(
        spec, tx, mesh=mesh, sharded_loss=sharded_loss,
        loss_chunk=loss_chunk, ema_decay=ema_decay,
        label_smoothing=label_smoothing, seed=seed, ring_loss=ring_loss,
        freeze_bn=freeze_bn, accum_steps=accum_steps,
    )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)

    # Mesh path: commit the batch to the data axis and pin the output
    # state to the INPUT state's shardings. The step is
    # sharding-preserving by contract: without the pin, propagation from
    # ZeRO-sharded moments leaks P('data') into the updated params (the
    # update add), so step 2 sees different input layouts, recompiles,
    # and the drifted-layout program both reshards every param each step
    # and (observed) crashes the XLA CPU compiler in the 8-device
    # dryrun. Scalars off-mesh (fresh jnp scalars carry a
    # SingleDeviceSharding) are replicated on first call so the whole
    # state has one stable mesh layout.
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    cache: dict = {}

    def jitted(state, images, tokens):
        if "fn" not in cache:
            state = jax.tree.map(
                lambda l: l if isinstance(getattr(l, "sharding", None),
                                          NamedSharding)
                else jax.device_put(l, repl),
                state,
            )
            shardings = jax.tree.map(lambda l: l.sharding, state)
            if opt_shardings is not None:
                shardings = shardings._replace(opt_state=opt_shardings)

            def pinned(st, im, tk):
                new_state, metrics = step_fn(st, im, tk)
                new_state = jax.tree.map(
                    jax.lax.with_sharding_constraint, new_state, shardings
                )
                return new_state, metrics

            cache["fn"] = jax.jit(
                pinned, donate_argnums=(0,) if donate else (),
                compiler_options=compiler_options,
            )
        images = _commit_batch(images, mesh, batch_sh)
        tokens = _commit_batch(tokens, mesh, batch_sh)
        return cache["fn"](state, images, tokens)

    return jitted


def _commit_batch(x, mesh, batch_sh):
    """Commit a host batch to the data axis.

    Single-process: plain ``device_put``. Multi-process: the array in
    hand is this process's STRIPE of the global batch (the loader shards
    by ``(process_index, process_count)``), and a device_put onto a
    sharding spanning non-addressable devices is invalid — assemble the
    global array from the host-local shards instead."""
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P(DATA_AXIS)
        )
    return jax.device_put(x, batch_sh)


def init_train_state(model, tx, key=None, ema_decay: float = 0.0,
                     params=None) -> TrainState:
    if params is None:
        params = model.init(key if key is not None else jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    # jnp.copy, not identity: EMA shadows must be DISTINCT buffers.
    # Aliased leaves + donate=True would donate the same buffer twice
    # (Execute() INVALID_ARGUMENT on the first step).
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema)
