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
