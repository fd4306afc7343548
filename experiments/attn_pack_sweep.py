"""Lane-packed short-sequence attention sweep (VERDICT r4 #3).

L=50 (b32 visual trunk) score tiles pad 128 lanes 2.56x; PARITY.md's
train-ceiling analysis quantified "~0.3 ms of MXU FLOPs stretched to
~8 ms" across the short-seq attention cores. ``lane_pack=p`` reshapes
``[B, L, 3E] -> [B/p, p*L, 3E]`` (free, contiguous) and adds a
block-diagonal mask so the pad lanes do real softmax work
(``ops/attention.py:fused_attention_qkv``).

This sweep times fwd and joint fwd+bwd at the production shapes for
pack in {1, 2} (and {1,2,4} where 4*L <= 128), standalone. Confirm any
winner in-graph with bench.py (eval) / profile_train.py (train) before
flipping the ops/tuning.py default — the r3 tile lesson (standalone
winners can lose in-context) applies.

Usage: python experiments/attn_pack_sweep.py [L] [B] [--gemm]
       (--gemm: qkv produced by an in-graph projection GEMM, exposing
       any reshape-relayout cost the fresh-array mode hides)
Env:   SWEEP_E, SWEEP_H, SWEEP_DTYPE=bf16|fp32
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.ops.attention import fused_attention_qkv


def time_it(qkv, H, pack, bwd, K, w=None):
    """``w`` (--gemm): produce qkv from an in-graph GEMM first, so the
    kernel's input carries the layout a real block's QKV projection
    hands it (tests whether the [B,L,3E]->[B/2,2L,3E] reshape costs a
    relayout there that the fresh-array standalone sweep never sees)."""
    def one(qkv, i):
        def f(q):
            if w is not None:
                q = jnp.einsum("ble,ef->blf", q, w)
            return fused_attention_qkv(
                q + i.astype(q.dtype) * 1e-6, H, None, lane_pack=pack,
            ).astype(jnp.float32).sum()

        return (jax.grad(f)(qkv).astype(jnp.float32).sum()
                if bwd else f(qkv))

    @jax.jit
    def run(qkv):
        tot, _ = jax.lax.scan(lambda c, i: (c + one(qkv, i), None),
                              jnp.zeros(()), jnp.arange(K))
        return tot

    float(run(qkv))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(qkv))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    L = int(pos[0]) if len(pos) > 0 else 50
    B = int(pos[1]) if len(pos) > 1 else 256
    E = int(os.environ.get("SWEEP_E", 768))
    H = int(os.environ.get("SWEEP_H", 12))
    dt = jnp.bfloat16 if os.environ.get("SWEEP_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    gemm = "--gemm" in sys.argv
    if gemm:
        qkv = jax.random.normal(jax.random.PRNGKey(0), (B, L, E), dt)
        w = jax.random.normal(jax.random.PRNGKey(1), (E, 3 * E), dt) * 0.02
    else:
        qkv = jax.random.normal(jax.random.PRNGKey(0), (B, L, 3 * E), dt)
        w = None
    packs = [p for p in (1, 2, 4) if p * L <= 128 and B % p == 0]
    print(f"L={L} B={B} E={E} H={H} dtype={dt.__name__} packs={packs} "
          f"gemm={gemm}")
    for bwd in (False, True):
        base = None
        for p in packs:
            try:
                ms = time_it(qkv, H, p, bwd, 16 if bwd else 32, w=w)
            except Exception as e:
                print(f"  {'fwd+bwd' if bwd else 'fwd    '} pack={p}: "
                      f"FAIL {type(e).__name__}: {str(e)[:100]}")
                continue
            if base is None:
                base = ms
            print(f"  {'fwd+bwd' if bwd else 'fwd    '} pack={p}: "
                  f"{ms:7.3f} ms  ({base / ms:5.2f}x vs pack=1)",
                  flush=True)


if __name__ == "__main__":
    main()
