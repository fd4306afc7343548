"""Optimizer + LR schedule construction.

Reconstructs the training recipe the reference's configs describe (the train
driver itself is absent from the release; SURVEY.md §3.3): AdamW with a
no-weight-decay list (``TRAIN.WITHOUT_WD_LIST: ['bn','bias','ln']``,
b32.yaml:48-50), a separate LR_SHARE/WD_SHARE param group for the
modality-shared trunk tensors (``CUSTOM.LR_SHARE/WD_SHARE``,
b32-yfcc-msclips.yaml:13-14), timm-style warmup-cosine schedule
(b32.yaml:39-47), gradient clipping, and optional EMA.

BatchNorm running statistics are *frozen* for the optimizer (label
``state``): they are updated functionally from the forward pass's BNState,
never by gradients.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

NO_WD_NAMES = {
    # reference CLIP.no_weight_decay() (clip_openai_pe_res_v1.py:2950-2956)
    "positional_embedding",
    "class_embedding",
    "token_embedding",
    "logit_scale",
}


def _path_keys(path) -> list:
    return [str(p.key) if hasattr(p, "key") else str(p.idx) for p in path]


def _matches_without_wd(keys, without_wd_list) -> bool:
    leaf = keys[-1]
    # JAX bias leaves: 'b' (linear), '*_b' (attention), 'bias' (LN/BN) —
    # all named '*bias' in the torch reference, matched by 'bias'
    is_bias = leaf == "b" or leaf == "bias" or leaf.endswith("_b")
    for token in without_wd_list:
        if token == "bias":
            if is_bias:
                return True
        elif any(token in k for k in keys):
            return True
    if any(k in NO_WD_NAMES for k in keys):
        return True
    return False


def _is_bn_stat(keys) -> bool:
    return keys[-1] in ("mean", "var")


def _is_shared_param(keys, spec) -> bool:
    """True for visual-trunk tensors consumed by both towers (the aliased
    set in the reference; gets CUSTOM.LR_SHARE / WD_SHARE)."""
    if not spec.share_modules:
        return False
    if keys[:2] != ["visual", "blocks"]:
        return False
    block_i = int(keys[2])
    # visual.blocks[j] feeds text layer j + offset — the exact inverse of
    # resolve_text_block's mapping (stem-in-trunk shifts the params-block
    # index; VISUAL_LAYER_MINUS1 shifts the text layer)
    text_layer = block_i + (1 if spec.stem_in_trunk else 0) \
        + (1 if spec.visual_layer_minus1 else 0)
    if not spec.text_layer_is_shared(text_layer):
        return False
    shared = set(spec.shared_param_keys())
    if "mlp" in keys and "mlp" in shared:
        return True
    if "attn" in keys and f"attn.{keys[-1]}" in shared:
        return True
    return False


def param_labels(params, spec):
    """Pytree of optimizer-group labels: 'regular' | 'shared' | 'state'."""

    def label(path, _):
        keys = _path_keys(path)
        if _is_bn_stat(keys):
            return "state"
        if keys == ["gumbel_logit"]:
            # NAS architecture parameter: separate optimizer group
            # (GUMBEL_LR / the reference's arch_optimizer)
            return "arch"
        if _is_shared_param(keys, spec):
            return "shared"
        return "regular"

    return jax.tree_util.tree_map_with_path(label, params)


def wd_mask(params, without_wd_list):
    def mask(path, _):
        return not _matches_without_wd(_path_keys(path), without_wd_list)

    return jax.tree_util.tree_map_with_path(mask, params)


def timm_cosine_schedule(base_lr: float, steps_per_epoch: int, epochs: int,
                         warmup_epochs: int = 5, warmup_lr: float = 1e-6,
                         min_lr: float = 1e-5, cooldown_epochs: int = 0):
    """timm 'cosine' scheduler semantics: linear warmup from ``warmup_lr``,
    cosine decay to ``min_lr`` over the remaining epochs, then ``min_lr``
    during cooldown."""
    warmup_steps = warmup_epochs * steps_per_epoch
    decay_steps = max((epochs - warmup_epochs - cooldown_epochs)
                      * steps_per_epoch, 1)
    schedules = [
        optax.linear_schedule(warmup_lr, base_lr, max(warmup_steps, 1)),
        optax.cosine_decay_schedule(
            base_lr, decay_steps, alpha=min_lr / max(base_lr, 1e-12)
        ),
        optax.constant_schedule(min_lr),
    ]
    return optax.join_schedules(
        schedules, [warmup_steps, warmup_steps + decay_steps]
    )


def swa_anneal_wrap(base_sched, config, steps_per_epoch: int):
    """``SWA.LR_RATIO`` / ``ANNEAL_EPOCHS`` / ``ANNEAL_STRATEGY``
    (``lib/config/default.py:113-115``) with torch ``SWALR`` semantics:
    once SWA begins (``SWA.BEGIN_EPOCH``), anneal from the base schedule's
    value at that point to ``swa_lr = TRAIN.LR * LR_RATIO`` over
    ``ANNEAL_EPOCHS`` ('cos' or 'linear'), then hold. Wrap each param
    group's fully-composed schedule (incl. the shared-group scale): a
    scalar ``swa_lr`` in torch anneals every group to the SAME value."""
    if not (config.SWA.ENABLED and config.SWA.BEGIN_EPOCH >= 0):
        return base_sched
    begin = config.SWA.BEGIN_EPOCH * steps_per_epoch
    anneal = max(config.SWA.ANNEAL_EPOCHS * steps_per_epoch, 1)
    ratio = config.SWA.LR_RATIO
    strategy = config.SWA.ANNEAL_STRATEGY
    if strategy not in ("cos", "linear"):
        raise ValueError(f"Unknown SWA.ANNEAL_STRATEGY: {strategy}")
    swa_lr = config.TRAIN.LR * ratio

    def sched(step):
        lr0 = base_sched(begin)  # frozen at SWA start (torch stops the
        # base scheduler once SWALR takes over)
        t = jnp.clip((step - begin) / anneal, 0.0, 1.0)
        alpha = (1.0 - jnp.cos(jnp.pi * t)) / 2.0 if strategy == "cos" \
            else t
        annealed = (1.0 - alpha) * lr0 + alpha * swa_lr
        return jnp.where(step < begin, base_sched(step), annealed)

    return sched


def build_schedule(config, steps_per_epoch: int):
    sched_cfg = config.TRAIN.LR_SCHEDULER
    method = sched_cfg.get("METHOD", "timm")
    if method == "timm":
        args = sched_cfg.get("ARGS", {})
        return timm_cosine_schedule(
            base_lr=config.TRAIN.LR,
            steps_per_epoch=steps_per_epoch,
            epochs=config.TRAIN.END_EPOCH,
            warmup_epochs=args.get("warmup_epochs", 5),
            warmup_lr=args.get("warmup_lr", 1e-6),
            min_lr=args.get("min_lr", 1e-5),
            cooldown_epochs=args.get("cooldown_epochs", 0),
        )
    if method == "constant":
        return optax.constant_schedule(config.TRAIN.LR)
    raise ValueError(f"Unknown LR scheduler: {method}")


def larc(trust_coefficient: float = 0.02, eps: float = 1e-8,
         clip: bool = True):
    """LARC: layerwise adaptive rate scaling/clipping applied on top of the
    base optimizer's updates (the ``TRAIN.LARC`` hook,
    ``lib/config/default.py:149``)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(u, p):
            p_norm = jnp.linalg.norm(p.astype(jnp.float32))
            u_norm = jnp.linalg.norm(u.astype(jnp.float32))
            ratio = trust_coefficient * p_norm / (u_norm + eps)
            ratio = jnp.where(p_norm > 0, ratio, 1.0)
            if clip:
                ratio = jnp.minimum(ratio, 1.0)
            return u * ratio.astype(u.dtype)

        return jax.tree.map(scale, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw_group(schedule, wd, params_mask):
    return optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=wd,
        mask=params_mask,
    )


def build_optimizer(config, params, spec, steps_per_epoch: int):
    """Returns (optax transform, labels pytree)."""
    without_wd = list(config.TRAIN.WITHOUT_WD_LIST)
    labels = param_labels(params, spec)
    mask = wd_mask(params, without_wd)

    raw_sched = build_schedule(config, steps_per_epoch)
    lr_share = config.CUSTOM.get("LR_SHARE", 0.0) or config.TRAIN.LR
    share_scale = lr_share / max(config.TRAIN.LR, 1e-12)
    raw_share = lambda step: raw_sched(step) * share_scale
    # SWA anneal wraps each group's COMPOSED schedule: torch SWALR with a
    # scalar swa_lr anneals EVERY param group from its own current LR to
    # the same swa_lr — wrapping before the share scaling would instead
    # send the shared group to share_scale*swa_lr (10x off for the
    # b32-yfcc configs)
    base_sched = swa_anneal_wrap(raw_sched, config, steps_per_epoch)
    share_sched = swa_anneal_wrap(raw_share, config, steps_per_epoch)
    wd_share = config.CUSTOM.get("WD_SHARE", 0.0) or config.TRAIN.WD

    # per-group WD masks must share the group's subtree structure; optax
    # multi_transform updates each group with the full tree, so a callable
    # mask works uniformly
    def mask_fn(p):
        return wd_mask(p, without_wd)

    gumbel_lr = config.CUSTOM.get("GUMBEL_LR", 0.0) or config.TRAIN.LR
    tx = optax.multi_transform(
        {
            "regular": _adamw_group(base_sched, config.TRAIN.WD, mask_fn),
            "shared": _adamw_group(share_sched, wd_share, mask_fn),
            "arch": optax.adamw(gumbel_lr, weight_decay=0.0),
            "state": optax.set_to_zero(),
        },
        labels,
    )
    if config.TRAIN.get("LARC", False):
        tx = optax.chain(tx, larc())
    clip = config.TRAIN.CLIP_GRAD_NORM
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, labels
