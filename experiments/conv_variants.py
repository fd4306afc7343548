"""Measure XLA-level reformulations of the branch's hot ConvResBlock
(stage1: 112px, 48->96ch, one bottleneck block, folded eval form).

Variants:
  a) baseline NHWC convs (current apply_conv_res_block folded path)
  b) NCHW convs
  c) im2col patches + GEMM for the 3x3 s2 conv
  d) space-to-depth(2) input + dense 2x2 conv (all convs become s1)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 32
C_IN, C_MID, C_OUT, HW = 48, 48, 96, 112

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
W1 = jax.random.normal(ks[0], (1, 1, C_IN, C_MID), jnp.bfloat16) * 0.05
b1 = jax.random.normal(ks[1], (C_MID,), jnp.bfloat16) * 0.01
W2 = jax.random.normal(ks[2], (3, 3, C_MID, C_MID), jnp.bfloat16) * 0.05
b2 = jax.random.normal(ks[3], (C_MID,), jnp.bfloat16) * 0.01
W3 = jax.random.normal(ks[4], (1, 1, C_MID, C_OUT), jnp.bfloat16) * 0.05
b3 = jax.random.normal(ks[5], (C_OUT,), jnp.bfloat16) * 0.01
WR = jax.random.normal(ks[6], (1, 1, C_IN, C_OUT), jnp.bfloat16) * 0.05
bR = jax.random.normal(ks[7], (C_OUT,), jnp.bfloat16) * 0.01

x0 = jax.random.normal(jax.random.PRNGKey(9), (B, HW, HW, C_IN), jnp.bfloat16)


def conv(w, x, stride=1, padding=0, layout="NHWC"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=(layout, "HWIO", layout),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def block_nhwc(x):
    out = jax.nn.relu(conv(W1, x) + b1)
    out = jax.nn.relu(conv(W2, out, 2, 1) + b2)
    out = conv(W3, out) + b3
    res = conv(WR, x, 2, 0) + bR
    return jax.nn.relu(out + res)


def block_nchw(x):
    x = x.transpose(0, 3, 1, 2)

    def c(w, y, s=1, p=0):
        r = conv(w, y, s, p, "NCHW")
        return r

    def bias(y, b):
        return y + b[None, :, None, None]

    out = jax.nn.relu(bias(c(W1, x), b1))
    out = jax.nn.relu(bias(c(W2, out, 2, 1), b2))
    out = bias(c(W3, out), b3)
    res = bias(c(WR, x, 2, 0), bR)
    return jax.nn.relu(out + res).transpose(0, 2, 3, 1)


def block_im2col(x):
    out = jax.nn.relu(conv(W1, x) + b1)
    # 3x3 s2 via patches + GEMM
    xp = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(xp[:, dy:dy + HW:2, dx:dx + HW:2, :])
    patches = jnp.concatenate(taps, axis=-1)  # [B, 56, 56, 9*C]
    w2 = W2.transpose(0, 1, 2, 3).reshape(9 * C_MID, C_MID)
    out = jax.nn.relu(
        jnp.einsum("bhwk,kc->bhwc", patches, w2,
                   precision=jax.lax.Precision.HIGHEST) + b2)
    out = conv(W3, out) + b3
    res = conv(WR, x, 2, 0) + bR
    return jax.nn.relu(out + res)


def block_s2d(x):
    out = jax.nn.relu(conv(W1, x) + b1)  # [B,112,112,48]
    # space-to-depth(2): [B,56,56,4*48]; 3x3 s2 conv == 2x2 s1 conv on s2d
    H2 = HW // 2
    s2d = out.reshape(B, H2, 2, H2, 2, C_MID).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(B, H2, H2, 4 * C_MID)
    # build the equivalent 2x2 kernel over (p,q,c) channels:
    # out[i,j] = sum_{dy,dx} x[2i+dy-1, 2j+dx-1] W2[dy,dx]
    # x[2i+dy-1] = s2d[i + (dy-1+?)//2, parity p=(dy-1)%2]
    w2e = jnp.zeros((2, 2, 4 * C_MID, C_MID), jnp.bfloat16)
    for dy in range(3):
        for dx in range(3):
            ry, py = divmod(dy - 1, 2)   # row offset in s2d grid, parity
            rx, px = divmod(dx - 1, 2)
            # s2d channel index block for (py, px)
            cblk = (py * 2 + px) * C_MID
            w2e = w2e.at[ry + 1, rx + 1, cblk:cblk + C_MID, :].set(
                W2[dy, dx])
    out = jax.nn.relu(conv(w2e, s2d, 1, 1)[:, 1:, 1:, :] + b2)
    out = conv(W3, out) + b3
    res = conv(WR, x, 2, 0) + bR
    return jax.nn.relu(out + res)


def bench(name, fn):
    @jax.jit
    def run(x):
        def step(c, i):
            y = fn(x + i * 1e-6)
            return c + y.astype(jnp.float32).sum(), None

        t, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            jnp.arange(K).astype(jnp.bfloat16))
        return t

    float(run(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} {min(ts) / K * 1e3 - 28.0 / K:7.3f} ms", flush=True)


ref = block_nhwc(x0)
for name, fn in [("nhwc", block_nhwc), ("nchw", block_nchw),
                 ("im2col", block_im2col), ("s2d", block_s2d)]:
    err = float(jnp.abs(fn(x0).astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(f"# {name} maxerr {err:.2e}")
    bench(name, fn)
