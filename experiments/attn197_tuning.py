"""Attention-core tile sweep at the ViT-B/16 shape (L=197) on real TPU.

The round-1 tile picker (_pick_batch_tile) was tuned at L=50 (b32);
VERDICT r1 #2 asks for the 197-token path to be profiled explicitly.
Sweeps the batch-tile of ``fused_attention_qkv`` and compares against the
XLA einsum path, 12 chained trunk-attention calls per measurement
(scan-amortized single dispatch, scalar fetch barrier).

Run: python experiments/attn197_tuning.py [B] [L]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from msclip_tpu.models import layers as ML
from msclip_tpu.ops.attention import _pick_batch_tile, fused_attention_qkv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
Lq = int(sys.argv[2]) if len(sys.argv) > 2 else 197
E, H = 768, 12
NLAYER, K = 12, 16

qkv0 = jax.random.normal(jax.random.PRNGKey(0), (B, Lq, 3 * E),
                         jnp.bfloat16)


def bench(name, core):
    """core: [B,L,3E] -> [B,L,E]; NLAYER chained calls x K scan iters."""

    @jax.jit
    def run(qkv):
        def step(c, i):
            x = qkv + i.astype(qkv.dtype) * 1e-6
            for _ in range(NLAYER):
                x = jnp.concatenate([core(x), x[:, :, E:]], axis=-1)
            return c + x.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(K))
        return tot

    try:
        float(run(qkv0))
    except Exception as e:
        print(f"{name:26s} FAILED: {repr(e)[:120]}", flush=True)
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(qkv0))
        times.append(time.perf_counter() - t0)
    ms = min(times) / K * 1e3
    print(f"{name:26s} {ms:7.2f} ms / {NLAYER} layers "
          f"({B * K / min(times):,.0f} img/s attn-core-only)", flush=True)


def xla_core(qkv):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    D = E // H
    qh = q.reshape(B, Lq, H, D) * jnp.asarray(D ** -0.5, qkv.dtype)
    kh = k.reshape(B, Lq, H, D)
    vh = v.reshape(B, Lq, H, D)
    s = jnp.einsum("blhd,bmhd->bhlm", qh, kh,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", w, vh).reshape(B, Lq, E)


def main():
    print(f"# B={B} L={Lq} E={E} H={H}, default tile="
          f"{_pick_batch_tile(B, Lq, 3 * E, 2)}", flush=True)
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    print(f"# health: tiny dispatch {time.perf_counter() - t0:.3f}s",
          flush=True)

    bench("xla_einsum", xla_core)
    bench("pallas_default", lambda x: fused_attention_qkv(x, H))
    for tb in (1, 2, 4, 8, 16):
        if B % tb == 0:
            bench(f"pallas_tb{tb}",
                  lambda x, tb=tb: fused_attention_qkv(x, H, batch_tile=tb))


if __name__ == "__main__":
    main()
