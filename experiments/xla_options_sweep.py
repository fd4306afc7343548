"""Sweep XLA TPU compiler options on the hot jits (train step / eval fwd).

The measured ceilings (PARITY.md "Train-step ceiling") put every segment
at a uniform ~55% MFU with no schedulable hot spot left — the remaining
lever class is XLA's own fusion/scheduling heuristics.  Flags set via the
client ``XLA_FLAGS`` env do NOT reach the tunnel-side compiler, but
per-compile ``compiler_options`` passed through the PJRT AOT API do, so
this sweep uses ``jax.jit(f).lower(...).compile(compiler_options=...)``.

Candidates (unknown option names fail the compile — caught and reported
per-entry, so the sweep survives backend version drift):
  * ``xla_tpu_scoped_vmem_limit_kib`` — the scoped-VMEM budget that caps
    XLA's fusion sizes; raising it lets larger fusions form (risk: steals
    VMEM from our Pallas kernels / spills).
  * latency-hiding-scheduler toggles (mostly collective-oriented; single
    chip is a control).

Usage: python experiments/xla_options_sweep.py [B] [K]
Env: PROF_MODEL (default b32-yfcc-msclips), SWEEP_MODE=train|eval,
     SWEEP_SET=name1,name2 (subset).

Reference context being tuned: the training forward of
``/root/reference/lib/models/clip_openai_pe_res_v1.py`` (class CLIP) —
here as msclip_tpu.train.trainer.make_step_core on TPU.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config

CANDIDATES = [
    ("baseline", None),
    ("vmem24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("vmem48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("no_lhs", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("aggr_fusion", {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                     "true"}),
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from msclip_tpu.models import MSClipModel, spec_from_config
    from msclip_tpu.train.optim import build_optimizer
    from msclip_tpu.train.trainer import init_train_state, make_step_core

    cfg = get_default_config()
    model_yaml = os.environ.get("PROF_MODEL", "b32-yfcc-msclips")
    update_config(cfg, os.path.join(root,
                                    f"experiments/model/{model_yaml}.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    mode = os.environ.get("SWEEP_MODE", "train")

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                               jnp.bfloat16)
    tokens = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406)
    tokens = tokens.at[:, 1].set(320).at[:, 2].set(49407)

    if mode == "train":
        tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=1000)
        state = init_train_state(model, tx, params=params, ema_decay=0.0)
        step = make_step_core(spec, tx, ema_decay=0.0)

        def run(state, images, tokens):
            def body(st, i):
                st2, m = step(st, images + i.astype(images.dtype) * 1e-6,
                              tokens)
                return st2, m["loss"]

            _, losses = jax.lax.scan(body, state, jnp.arange(K))
            return losses.sum()

        args = (state, images, tokens)
    else:
        from msclip_tpu.models.folding import fold_params_for_eval
        eval_params = fold_params_for_eval(params, spec)

        def run(params, images):
            def body(c, i):
                f = model.encode_image(
                    params, images + i.astype(images.dtype) * 1e-6)
                return c + f.astype(jnp.float32).sum(), None

            tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return tot

        args = (eval_params, images)

    sel = set(s for s in os.environ.get("SWEEP_SET", "").split(",") if s)
    lowered = jax.jit(run).lower(*args)
    results = {}
    for name, opts in CANDIDATES:
        if sel and name not in sel:
            continue
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts)
            ct = time.perf_counter() - t0
            float(jax.tree.leaves(compiled(*args))[0].sum())  # warm + barrier
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = compiled(*args)
                float(jax.tree.leaves(out)[0].sum())
                times.append(time.perf_counter() - t0)
            ms = min(times) / K * 1e3
            results[name] = ms
            print(f"{name:14s} {ms:8.2f} ms/step  "
                  f"({B / (ms / 1e3):,.0f} samples/s)  compile {ct:.0f}s",
                  flush=True)
        except Exception as e:  # unknown flag, OOM, tunnel outage
            print(f"{name:14s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
    if "baseline" in results:
        base = results["baseline"]
        for name, ms in results.items():
            if name != "baseline":
                print(f"  {name}: {base / ms:.3f}x vs baseline")


if __name__ == "__main__":
    main()
