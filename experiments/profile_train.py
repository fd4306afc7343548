"""TPU profile of the contrastive train step (BASELINE configs #4/#5).

Chains K full train steps (fwd + bwd + AdamW + BN replay) inside ONE jit
via ``lax.scan`` — the tunnel's ~28 ms dispatch RTT is paid once, so the
number is the steady-state step time, matching how tools/train.py runs
(the host loop keeps the device queue full).

Usage: python experiments/profile_train.py [B] [K]
Env knobs:
  PROF_MODEL   model yaml stem (default b32-yfcc-msclips)
  PROF_PALLAS  0 disables the fused attention fwd+bwd kernels
  PROF_REMAT   1 enables jax.checkpoint on trunk blocks
  PROF_EMA     1 enables the EMA shadow update
  PROF_MODE    step (default) | loss  — ``loss`` times one chip's share
               of the 32k-batch chunked sharded InfoNCE (config #5):
               local batch 512 = 32768/64 chips, embed 512.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jax.tree.leaves(out)[0].sum())  # true fetch barrier over tunnels
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        times.append(time.perf_counter() - t0)
    return min(times)


def profile_loss(K: int):
    """Config #5: one chip's share of the 32k-global-batch sharded loss —
    local 512 rows x 32768 gathered global columns, both directions,
    fwd + bwd (the exact per-chip compute of chunked_sharded_infonce_loss
    on a 64-chip v5e, minus the ICI all-gathers)."""
    from msclip_tpu.parallel.infonce import chunked_direction

    B_local, B_global, E, CHUNK = 512, 32768, 512, 4096
    fi = jax.random.normal(jax.random.PRNGKey(0), (B_local, E), jnp.float32)
    ft = jax.random.normal(jax.random.PRNGKey(1), (B_global, E), jnp.float32)
    fi = fi / jnp.linalg.norm(fi, axis=-1, keepdims=True)
    ft = ft / jnp.linalg.norm(ft, axis=-1, keepdims=True)
    T = jnp.exp(jnp.asarray(2.659))
    labels = jnp.arange(B_local)  # rank 0's diagonal slice

    def one(rows, cols):
        # both directions, as the sharded loss computes per chip
        return 0.5 * (
            chunked_direction(rows, cols, T, labels, B_global, CHUNK)
            + chunked_direction(cols[:B_local], jnp.concatenate(
                [rows, cols[B_local:]]), T, labels, B_global, CHUNK)
        )

    grad = jax.grad(one, argnums=(0, 1))

    @jax.jit
    def run(fi, ft):
        def body(c, i):
            gi, gt = grad(fi + i * 1e-8, ft)
            return c + gi.sum() + gt.sum(), None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
        return tot

    t = timed(run, fi, ft) / K
    print(f"sharded-loss per-chip share (local {B_local} rows x "
          f"{B_global} global cols, E={E}, both dirs, fwd+bwd): "
          f"{t * 1e3:.2f} ms/step")


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("PROF_MODE", "step") == "loss":
        profile_loss(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
        return

    from msclip_tpu.models import MSClipModel, spec_from_config
    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import init_train_state, make_step_core

    cfg = get_default_config()
    model_yaml = os.environ.get("PROF_MODEL", "b32-yfcc-msclips")
    update_config(cfg, os.path.join(root,
                                    f"experiments/model/{model_yaml}.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS = os.environ.get("PROF_PALLAS", "1") != "0"
    cfg.TPU.REMAT = os.environ.get("PROF_REMAT", "0") != "0"
    cfg.TPU.CONV_LAYOUT = os.environ.get("PROF_CONV_LAYOUT", "NHWC")
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ema = 0.999 if os.environ.get("PROF_EMA", "0") != "0" else 0.0

    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=1000)
    state = init_train_state(model, tx, params=params, ema_decay=ema)
    step = make_step_core(spec, tx, ema_decay=ema)

    images = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                               jnp.bfloat16)
    tokens = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406)
    tokens = tokens.at[:, 1].set(320).at[:, 2].set(49407)

    @jax.jit
    def run(state, images, tokens):
        def body(st, i):
            st2, m = step(st, images + i.astype(images.dtype) * 1e-6, tokens)
            return st2, m["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(K))
        return losses.sum()

    t0 = time.perf_counter()
    float(run(state, images, tokens))
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, images, tokens))
        times.append(time.perf_counter() - t0)
    per_step = min(times) / K
    print(f"{model_yaml} train step B={B} "
          f"(pallas={int(spec.use_pallas)} remat={int(spec.remat)} "
          f"ema={ema}): {per_step * 1e3:.1f} ms/step, "
          f"{B / per_step:,.0f} samples/s/chip")


if __name__ == "__main__":
    main()
