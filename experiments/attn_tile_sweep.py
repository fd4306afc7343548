"""Attention-core batch-tile sweep at arbitrary sequence length (TPU).

Times `fused_attention_qkv` alone — fwd, and optionally joint fwd+bwd —
across explicit `batch_tile` overrides, next to the footprint picker's
automatic choice. This is how the r2 L=197 and r3 L=77/50 findings in
PARITY.md were produced; rerun on a new TPU generation before trusting
`ops/tuning.py`'s table there.

CAVEAT from r3: a tile that wins here can still lose in-graph (text fwd
L=77: tb=16 is 18% faster standalone, neutral-to-worse inside the full
block schedule — VMEM pressure vs grid amortization). Confirm any
change end-to-end with experiments/profile_train.py / profile_text.py.

Usage: python experiments/attn_tile_sweep.py [L] [B] [--bwd] [--masked]
Env:   SWEEP_TILES="2,4,8,16" (default "4,8,16,32"), SWEEP_E, SWEEP_H.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.models.layers import build_causal_mask
from msclip_tpu.ops.attention import _pick_batch_tile, fused_attention_qkv


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    L = int(pos[0]) if len(pos) > 0 else 77
    B = int(pos[1]) if len(pos) > 1 else 256
    bwd = "--bwd" in sys.argv
    masked = "--masked" in sys.argv or L == 77
    E = int(os.environ.get("SWEEP_E", 768))
    H = int(os.environ.get("SWEEP_H", 12))
    tiles = [int(t) for t in
             os.environ.get("SWEEP_TILES", "4,8,16,32").split(",")]
    K = 16 if bwd else 32

    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, L, 3 * E),
                            jnp.bfloat16)
    mask = build_causal_mask(L) if masked else None
    auto_fwd = _pick_batch_tile(B, L, 3 * E, 2)
    auto_bwd = _pick_batch_tile(B, L, 3 * E, 2, io_cols=7 * E)
    print(f"L={L} B={B} E={E} H={H} masked={masked} bwd={bwd} "
          f"picker: fwd={auto_fwd} bwd={auto_bwd}")

    for tb in tiles:
        try:
            def one(qkv, i):
                def f(q):
                    return fused_attention_qkv(
                        q + i.astype(q.dtype) * 1e-6, H, mask,
                        batch_tile=tb,
                    ).astype(jnp.float32).sum()

                return jax.grad(f)(qkv).astype(jnp.float32).sum() \
                    if bwd else f(qkv)

            @jax.jit
            def run(qkv):
                tot, _ = jax.lax.scan(
                    lambda c, i: (c + one(qkv, i), None),
                    jnp.zeros(()), jnp.arange(K))
                return tot

            float(run(qkv))  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(qkv))
                ts.append(time.perf_counter() - t0)
            print(f"  tb={tb:3d}: {min(ts) / K * 1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"  tb={tb:3d}: FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
