"""Weight averaging: EMA and SWA.

``TRAIN.EMA_DECAY`` / the ``SWA.*`` config tree (``lib/config/default.py:
109-116,146``); the reference stores ``ema_shadow_states`` / ``swa_states``
in its training checkpoints (``lib/utils/utils.py:157-201``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


def swa_update(swa_params, params, n_averaged):
    """Running equal-weight average: swa += (p - swa) / (n + 1)."""
    n = n_averaged.astype(jnp.float32)
    new = jax.tree.map(
        lambda s, p: s + (p - s) / (n + 1.0), swa_params, params
    )
    return new, n_averaged + 1


def swa_should_update(epoch: int, config) -> bool:
    return (
        config.SWA.ENABLED
        and config.SWA.BEGIN_EPOCH >= 0
        and epoch >= config.SWA.BEGIN_EPOCH
    )


def _has_batch_norm(tree) -> bool:
    if isinstance(tree, dict):
        if "mean" in tree and "var" in tree:
            return True
        return any(_has_batch_norm(v) for v in tree.values())
    if isinstance(tree, (list, tuple)):
        return any(_has_batch_norm(v) for v in tree)
    return False


def make_bn_refresh_step(spec):
    """One jitted BN-refresh step: forward the image tower in training-BN
    mode and blend the recorded batch stats into the params at ``momentum``
    (a traced scalar, so sweeping momentum=1/(k+1) does not recompile)."""
    from ..models import msclip as MM
    from ..models.stem import BNState

    @jax.jit
    def step(params, images, momentum):
        bn = BNState(training=True, momentum=momentum)
        MM.encode_image(params, spec, images, bn=bn, normalize=False)
        from .trainer import apply_bn_updates

        return apply_bn_updates(params, bn.updates)

    return step


def swa_refresh_bn(params, spec, batches):
    """torch ``optim.swa_utils.update_bn`` semantics for the averaged
    weights (the post-SWA pass the reference implies when ``SWA.FROZEN_BN``
    is off): discard the running stats and recompute them as the cumulative
    moving average of per-batch statistics — batch k (0-based) blends at
    momentum ``1/(k+1)``, so k=0 fully replaces the stale stats.

    ``batches``: iterable of image arrays ``[B, H, W, 3]`` (the training
    view of the data). Only the image tower runs — text has no BN. Returns
    params with refreshed ``mean``/``var`` leaves (unchanged params, and
    no forward passes, for BN-free specs).

    Single-process only: the step consumes host-local batches and blends
    stripe-local statistics (no cross-replica psum) — under multi-process
    training the driver skips it (use ``SWA.FROZEN_BN`` at scale).
    """
    if not _has_batch_norm(params):
        return params
    step = make_bn_refresh_step(spec)
    for k, images in enumerate(batches):
        params = step(params, jnp.asarray(images),
                      jnp.asarray(1.0 / (k + 1), jnp.float32))
    return params
