"""Train-step segment budget on real TPU (VERDICT r3 item 6).

Splits the b32 contrastive train step into measurable segments, each
chained K times inside one jit'd lax.scan (tunnel RTT paid once):

  fwd            loss value only (image tower + text tower + InfoNCE)
  fwd_img        image tower forward alone
  fwd_txt        text tower forward alone
  fwd+bwd        value_and_grad, no optimizer
  step           full step (fwd + bwd + AdamW + BN replay)

Derived: bwd = (fwd+bwd) - fwd; optimizer = step - (fwd+bwd).

Usage: python experiments/profile_train_segments.py [B] [K]
Env: PROF_MODEL, PROF_PALLAS (as profile_train.py), PROF_CONV_LAYOUT,
PROF_SEGMENTS (comma subset, e.g. "fwd_img,fb_img").
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config


def scan_timed(name, fn, init_carry, args, K, iters=3):
    """fn(args, carry, i) -> (carry, scalar); times K chained steps.

    ``args`` (params/images/tokens) are real jit arguments — closing
    over them would inline ~500 MB of weights and batch data as
    constants into the serialized HLO and blow the remote compile
    service's request-size limit (observed HTTP 413)."""

    @jax.jit
    def run(args, carry):
        c, outs = jax.lax.scan(
            lambda c, i: fn(args, c, i), carry, jnp.arange(K)
        )
        return outs.sum()

    t0 = time.perf_counter()
    float(run(args, init_carry))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(args, init_carry))
        times.append(time.perf_counter() - t0)
    ms = min(times) / K * 1e3
    print(f"{name:10s} {ms:8.2f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
    return ms


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from msclip_tpu.models import MSClipModel, spec_from_config
    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import (
        init_train_state,
        make_loss_fn,
        make_step_core,
    )

    cfg = get_default_config()
    model_yaml = os.environ.get("PROF_MODEL", "b32-yfcc-msclips")
    update_config(cfg, os.path.join(root,
                                    f"experiments/model/{model_yaml}.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS = os.environ.get("PROF_PALLAS", "1") != "0"
    cfg.TPU.CONV_LAYOUT = os.environ.get("PROF_CONV_LAYOUT", "NHWC")
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=1000)
    state = init_train_state(model, tx, params=params)
    loss_fn = make_loss_fn(spec)
    step = make_step_core(spec, tx)

    images = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                               jnp.bfloat16)
    tokens = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406)
    tokens = tokens.at[:, 1].set(320).at[:, 2].set(49407)
    print(f"{model_yaml} B={B} K={K} pallas={int(spec.use_pallas)}",
          flush=True)

    from msclip_tpu.models import msclip as MM
    from msclip_tpu.models.stem import BNState

    A = (params, images, tokens)

    def fwd_img(a, c, i):
        p, im, tk = a
        f = MM.encode_image(p, spec, im + i.astype(im.dtype) * 1e-6,
                            bn=BNState(training=True))
        return c, f.astype(jnp.float32).sum()

    def fwd_txt(a, c, i):
        p, im, tk = a
        # roll the batch per step: integer inputs can't take the +i*eps
        # perturbation, and a loop-INVARIANT encode_text gets hoisted out
        # of the scan by XLA (observed: 7 ms "text fwd" that was really
        # the hoisted residue), so the input must actually change
        f = MM.encode_text(p, spec, jnp.roll(tk, i, axis=0))
        return c, f.astype(jnp.float32).sum()

    def fwd(a, c, i):
        p, im, tk = a
        loss, _ = loss_fn(p, im + i.astype(im.dtype) * 1e-6,
                          jnp.roll(tk, i, axis=0))
        return c, loss

    def fwd_bwd(a, c, i):
        p, im, tk = a
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, im + i.astype(im.dtype) * 1e-6, jnp.roll(tk, i, axis=0)
        )
        gs = jax.tree.reduce(
            lambda acc, g: acc + g.astype(jnp.float32).sum(), grads, 0.0
        )
        return c, loss + gs * 0.0

    def full(a, st, i):
        _, im, tk = a
        st2, m = step(st, im + i.astype(im.dtype) * 1e-6,
                      jnp.roll(tk, i, axis=0))
        return st2, m["loss"]

    def fwd_bwd_img(a, c, i):
        p, im, tk = a

        def f(p):
            out = MM.encode_image(p, spec, im + i.astype(im.dtype) * 1e-6,
                                  bn=BNState(training=True))
            return out.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(f)(p)
        gs = jax.tree.reduce(
            lambda acc, g: acc + g.astype(jnp.float32).sum(), grads, 0.0
        )
        return c, loss + gs * 0.0

    def fwd_bwd_txt(a, c, i):
        p, im, tk = a

        def f(p):
            out = MM.encode_text(p, spec, jnp.roll(tk, i, axis=0))
            return out.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(f)(p)
        gs = jax.tree.reduce(
            lambda acc, g: acc + g.astype(jnp.float32).sum(), grads, 0.0
        )
        return c, loss + gs * 0.0

    # PROF_SEGMENTS="fwd_img,fb_img" runs a subset (each segment is its
    # own multi-minute TPU compile; layout/tile A-B comparisons only
    # need the towers). Default: all.
    want = os.environ.get("PROF_SEGMENTS", "")
    sel = set(s.strip() for s in want.split(",") if s.strip())

    def maybe(name, fn, carry):
        if sel and name not in sel:
            return None
        return scan_timed(name, fn, carry, A, K)

    t_img = maybe("fwd_img", fwd_img, jnp.zeros(()))
    t_txt = maybe("fwd_txt", fwd_txt, jnp.zeros(()))
    t_fwd = maybe("fwd", fwd, jnp.zeros(()))
    t_fb = maybe("fwd+bwd", fwd_bwd, jnp.zeros(()))
    t_fb_img = maybe("fb_img", fwd_bwd_img, jnp.zeros(()))
    t_fb_txt = maybe("fb_txt", fwd_bwd_txt, jnp.zeros(()))
    t_full = maybe("step", full, state)
    if any(t is None for t in
           (t_img, t_txt, t_fwd, t_fb, t_fb_img, t_fb_txt, t_full)):
        # PROF_SEGMENTS deselected something the derived summary needs;
        # a selection that happens to cover every segment still gets it.
        return
    print(f"per-tower bwd: img {t_fb_img - t_img:.2f} ms "
          f"({(t_fb_img - t_img) / t_img:.1f}x its fwd), "
          f"txt {t_fb_txt - t_txt:.2f} ms "
          f"({(t_fb_txt - t_txt) / max(t_txt, 1e-9):.1f}x its fwd)")
    print(f"derived: bwd {t_fb - t_fwd:.2f} ms, "
          f"optimizer+BN {t_full - t_fb:.2f} ms, "
          f"loss-only {t_fwd - t_img - t_txt:.2f} ms (fwd - towers)")
    print(f"throughput: {B / (t_full / 1e3):,.0f} samples/s/chip")


if __name__ == "__main__":
    main()
