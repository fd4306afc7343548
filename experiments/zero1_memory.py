"""Measure the ZeRO-1 and FSDP (ZeRO-3 analogue) memory claims.

Compiles the mesh train step with TPU.ZERO1 / TPU.FSDP on a forced
8-device CPU mesh and reports the literal per-device bytes of params and
optimizer state before and after a real step. If XLA re-gathered the
moments (or, under FSDP, re-replicated the params) every step, the
post-step numbers would erase the win — this prints the evidence either
way.

    python experiments/zero1_memory.py [n_devices]
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={sys.argv[1] if len(sys.argv) > 1 else 8}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.utils.platform import enable_compile_cache

# full-geometry fp32 CPU train-step compiles are multi-minute on a
# 1-vCPU host; the persistent cache makes re-runs warm
enable_compile_cache()

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.models import MSClipModel, spec_from_config
from msclip_tpu.parallel import (
    create_mesh,
    optstate_shardings,
    shard_params,
)
from msclip_tpu.train.optim import build_optimizer
from msclip_tpu.train.trainer import init_train_state, make_train_step


def tree_device_bytes(tree) -> int:
    """Per-device bytes actually held for a sharded pytree (sum of one
    addressable shard per leaf)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        shard = leaf.addressable_shards[0]
        total += shard.data.size * shard.data.dtype.itemsize
    return total


def build(mode: str, mesh, model, cfg, spec, batch=16):
    params = model.init(jax.random.PRNGKey(0))
    if mode == "fsdp":
        from msclip_tpu.parallel import shard_params_fsdp

        params = shard_params_fsdp(params, mesh)
    else:
        params = shard_params(params, mesh)
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=100)
    state = init_train_state(model, tx, params=params)
    opt_sh = None
    if mode == "zero1":
        opt_sh = optstate_shardings(mesh, state.opt_state)
        state = state._replace(
            opt_state=jax.device_put(state.opt_state, opt_sh)
        )
    step = make_train_step(spec, tx, mesh=mesh, donate=False,
                           opt_shardings=opt_sh)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, spec.image_resolution,
                             spec.image_resolution, 3)).astype(np.float32)
    )
    tokens = jnp.zeros((batch, spec.context_length), jnp.int32)
    tokens = tokens.at[:, 0].set(spec.vocab_size - 2)
    tokens = tokens.at[:, 1].set(spec.vocab_size - 1)
    # one real call (compiles + lets us inspect the post-step state)
    state2, metrics = step(state, images, tokens)
    float(metrics["loss"])
    return state, state2


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_config()
    update_config(cfg, os.path.join(root,
                                    "experiments/model/b32-yfcc-msclips.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_PALLAS = False
    cfg.TRAIN.LR = 1e-3
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    mesh = create_mesh(data=jax.device_count(), model=1)
    n = jax.device_count()
    print(f"mesh: data={n}, model=1; full b32-yfcc-msclips geometry")

    for mode in ("replicated", "zero1", "fsdp"):
        state, state2 = build(mode, mesh, model, cfg, spec)
        pb = tree_device_bytes(state.params)
        pb2 = tree_device_bytes(state2.params)
        ob = tree_device_bytes(state.opt_state)
        ob2 = tree_device_bytes(state2.opt_state)
        print(
            f"{mode:10s}: params {pb / 1e6:.1f} MB/dev (after step: "
            f"{pb2 / 1e6:.1f}), opt_state {ob / 1e6:.1f} MB/dev "
            f"(after step: {ob2 / 1e6:.1f})"
        )


if __name__ == "__main__":
    main()
