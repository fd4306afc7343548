"""Global-batch InfoNCE losses.

Two implementations of the contrastive objective implied by the reference's
training forward (``clip_openai_pe_res_v1.py:3126-3155``: all-gather both
embedding sets, ``logits = exp(logit_scale) * img_all @ txt_all.T``, CE in
both directions):

* ``infonce_loss``          — single-device / pjit-global: the full
  ``[B, B]`` similarity matrix. Fine up to a few-thousand global batch.
* ``sharded_infonce_loss``  — for shard_map over the ``data`` axis:
  each chip holds only its ``[B_local, B_global]`` logit block (both
  directions), with stable fp32 log-softmax; the full ``[B_global,
  B_global]`` matrix is never materialized per chip. This is the
  memory-efficient 32k-batch pattern (SURVEY.md §5 long-context note,
  BASELINE config #5). ``jax.lax.all_gather`` is natively differentiable —
  no grad-preserving hack needed (reference ``lib/utils/comm.py:140-154``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pvary(x, axis_name):
    """Mark ``x`` as varying over ``axis_name`` (scan carries that mix in
    shard-local data must enter the scan already axis-varying).

    ``jax.lax.pvary`` is deprecated in favour of ``pcast(..., to=
    'varying')`` (JAX >= 0.9); prefer the supported spelling, keep the
    old one as a fallback for older JAX."""
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axes, to="varying")
    return jax.lax.pvary(x, axes)


def _ce(logits, labels, label_smoothing=0.0):
    """Cross-entropy with fp32 log-softmax and optional label smoothing
    (``LOSS.LABEL_SMOOTHING``)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    loss = logz - gold
    if label_smoothing > 0.0:
        smooth = logz - logits.mean(axis=-1)
        loss = (1.0 - label_smoothing) * loss + label_smoothing * smooth
    return loss.mean()


def infonce_loss(feats_img, feats_txt, logit_scale, label_smoothing=0.0):
    """Symmetric InfoNCE over the (global) batch. Inputs L2-normalized
    ``[B, E]``; returns scalar fp32 loss."""
    T = jnp.exp(logit_scale).astype(jnp.float32)
    logits = T * jnp.dot(
        feats_img.astype(jnp.float32), feats_txt.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    labels = jnp.arange(logits.shape[0])
    return 0.5 * (_ce(logits, labels, label_smoothing)
                  + _ce(logits.T, labels, label_smoothing))


def sharded_infonce_loss(feats_img, feats_txt, logit_scale, axis_name="data",
                         label_smoothing=0.0):
    """InfoNCE inside shard_map: per-chip ``[b, B_global]`` logit blocks.

    feats_img/feats_txt: this chip's ``[b, E]`` shard (L2-normalized).
    """
    T = jnp.exp(logit_scale).astype(jnp.float32)
    b = feats_img.shape[0]
    rank = jax.lax.axis_index(axis_name)
    labels = rank * b + jnp.arange(b)

    img_all = jax.lax.all_gather(feats_img, axis_name, tiled=True)
    txt_all = jax.lax.all_gather(feats_txt, axis_name, tiled=True)

    # image -> text: rows local, columns global
    logits_i2t = T * jnp.dot(
        feats_img.astype(jnp.float32), txt_all.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    # text -> image
    logits_t2i = T * jnp.dot(
        feats_txt.astype(jnp.float32), img_all.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    loss = 0.5 * (_ce(logits_i2t, labels, label_smoothing)
                  + _ce(logits_t2i, labels, label_smoothing))
    # each chip's mean is over its own rows; global loss = mean over chips
    return jax.lax.pmean(loss, axis_name)


def chunked_sharded_infonce_loss(feats_img, feats_txt, logit_scale,
                                 axis_name="data", chunk: int = 4096,
                                 label_smoothing=0.0):
    """Like ``sharded_infonce_loss`` but streams the global columns in
    ``chunk``-sized blocks with an online logsumexp, bounding per-chip LOGIT
    memory at ``2 * b * chunk`` regardless of global batch (the 32k-batch
    configuration).

    Honest scope: both full ``[B_global, E]`` embedding sets are still
    all-gathered per chip — only the ``[B, B]`` similarity matrix is
    chunked away. At E=512 / B=32k that is 64 MB/chip in fp32 (fine);
    gathered-embedding memory grows linearly with global batch — far
    beyond that scale use ``ring_infonce_loss`` (``TPU.RING_LOSS``)."""
    T = jnp.exp(logit_scale).astype(jnp.float32)
    b = feats_img.shape[0]
    rank = jax.lax.axis_index(axis_name)
    labels = rank * b + jnp.arange(b)

    img_all = jax.lax.all_gather(feats_img, axis_name, tiled=True)
    txt_all = jax.lax.all_gather(feats_txt, axis_name, tiled=True)
    B = img_all.shape[0]
    chunk = min(chunk, B)
    n_chunks = (B + chunk - 1) // chunk
    pad = n_chunks * chunk - B
    if pad:
        img_all = jnp.pad(img_all, ((0, pad), (0, 0)))
        txt_all = jnp.pad(txt_all, ((0, pad), (0, 0)))

    loss = 0.5 * (
        chunked_direction(feats_img, txt_all, T, labels, B, chunk,
                          label_smoothing, axis_name=axis_name)
        + chunked_direction(feats_txt, img_all, T, labels, B, chunk,
                            label_smoothing, axis_name=axis_name)
    )
    return jax.lax.pmean(loss, axis_name)


def _ring_perm(n):
    # shard held by chip j moves to chip (j-1)%n, so at step t chip i
    # holds the shard of rank (i+t)%n; after n rotations it is home again
    return [(j, (j - 1) % n) for j in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_direction(rows, cols, logit_scale, axis_name, label_smoothing):
    """One InfoNCE direction with ring-rotated column shards.

    ``rows``/``cols``: this chip's ``[b, E]`` shards. Instead of
    all-gathering the full ``[B_global, E]`` column set (the declared
    scaling limit of ``chunked_sharded_infonce_loss``), the column shard
    rotates around the ring via ``ppermute`` while an online logsumexp
    accumulates — per-chip embedding memory stays O(b·E) at ANY global
    batch, and each rotation's ICI transfer overlaps the ``[b, b]`` logit
    block's matmul. The backward is a custom second ring pass (the
    standard CE gradient from the saved per-row normalizers): naive AD
    through the rotation scan would checkpoint every rotated shard and
    silently re-materialize the all-gather footprint.
    """
    loss, _ = _ring_direction_fwd(rows, cols, logit_scale, axis_name,
                                  label_smoothing)
    return loss


def _ring_direction_fwd(rows, cols, logit_scale, axis_name,
                        label_smoothing):
    n = jax.lax.axis_size(axis_name)
    b = rows.shape[0]
    B = n * b
    rank = jax.lax.axis_index(axis_name)
    labels = rank * b + jnp.arange(b)
    T = jnp.exp(logit_scale).astype(jnp.float32)
    rows32 = rows.astype(jnp.float32)
    perm = _ring_perm(n)

    def body(carry, t):
        m, s, gold, tot, cur = carry
        src = (rank + t) % n
        logits = T * jnp.dot(rows32, cur.astype(jnp.float32).T,
                             precision=jax.lax.Precision.HIGHEST)
        col_ids = src * b + jnp.arange(b)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(
            logits - m_new[:, None]
        ).sum(axis=-1)
        hit = col_ids[None, :] == labels[:, None]
        gold = gold + jnp.where(hit, logits, 0.0).sum(axis=-1)
        tot = tot + logits.sum(axis=-1)
        cur = jax.lax.ppermute(cur, axis_name, perm)
        return (m_new, s, gold, tot, cur), None

    m0 = jnp.full((b,), -jnp.inf, jnp.float32)
    zeros = jnp.zeros((b,), jnp.float32)
    m0, s0, g0, t0 = _pvary((m0, zeros, zeros, zeros), (axis_name,))
    (m, s, gold, tot, _), _ = jax.lax.scan(
        body, (m0, s0, g0, t0, cols), jnp.arange(n)
    )
    logz = m + jnp.log(s)
    target = (1.0 - label_smoothing) * gold + label_smoothing * (tot / B)
    loss = (logz - target).mean()
    return loss, (rows, cols, logit_scale, logz)


def _ring_direction_bwd(axis_name, label_smoothing, res, g):
    rows, cols, logit_scale, logz = res
    n = jax.lax.axis_size(axis_name)
    b = rows.shape[0]
    B = n * b
    rank = jax.lax.axis_index(axis_name)
    labels = rank * b + jnp.arange(b)
    T = jnp.exp(logit_scale).astype(jnp.float32)
    rows32 = rows.astype(jnp.float32)
    perm = _ring_perm(n)
    scale = g / b  # d mean / d per-row

    def body(carry, t):
        cur, dcols_acc, drows, dls = carry
        src = (rank + t) % n
        cur32 = cur.astype(jnp.float32)
        logits = T * jnp.dot(rows32, cur32.T,
                             precision=jax.lax.Precision.HIGHEST)
        probs = jnp.exp(logits - logz[:, None])
        col_ids = src * b + jnp.arange(b)
        tgt = ((1.0 - label_smoothing)
               * (col_ids[None, :] == labels[:, None])
               + label_smoothing / B)
        dlogits = (probs - tgt) * scale  # [b, b]
        drows = drows + T * jnp.dot(
            dlogits, cur32, precision=jax.lax.Precision.HIGHEST
        )
        dcols_acc = dcols_acc + T * jnp.dot(
            dlogits.T, rows32, precision=jax.lax.Precision.HIGHEST
        )
        # d loss / d logit_scale: dL/d ls = logits (since logits = e^ls·sim)
        dls = dls + (dlogits * logits).sum()
        cur, dcols_acc = jax.lax.ppermute((cur, dcols_acc), axis_name, perm)
        return (cur, dcols_acc, drows, dls), None

    z2, drows0, dls0 = _pvary(
        (jnp.zeros((b, cols.shape[1]), jnp.float32),
         jnp.zeros((b, rows.shape[1]), jnp.float32),
         jnp.zeros((), jnp.float32)),
        (axis_name,),
    )
    # the accumulator rotates WITH its shard, so after n rotations each
    # shard's gradient has collected every chip's contribution and is home
    (_, dcols, drows, dls), _ = jax.lax.scan(
        body, (cols, z2, drows0, dls0), jnp.arange(n)
    )
    # logit_scale is replicated (P()) into shard_map: its cotangent must
    # come back replicated, i.e. summed over chips here (exactly once)
    dls = jax.lax.psum(dls, axis_name)
    return (drows.astype(rows.dtype), dcols.astype(cols.dtype),
            dls.astype(logit_scale.dtype))


_ring_direction.defvjp(_ring_direction_fwd, _ring_direction_bwd)


def ring_infonce_loss(feats_img, feats_txt, logit_scale, axis_name="data",
                      label_smoothing=0.0):
    """Symmetric InfoNCE with ring-rotated shards (``TPU.RING_LOSS``):
    per-chip memory O(b·E + b²) at any global batch — the beyond-32k
    configuration ``chunked_sharded_infonce_loss``'s docstring declares
    out of its scope. Use inside shard_map over ``axis_name``."""
    loss = 0.5 * (
        _ring_direction(feats_img, feats_txt, logit_scale, axis_name,
                        label_smoothing)
        + _ring_direction(feats_txt, feats_img, logit_scale, axis_name,
                          label_smoothing)
    )
    return jax.lax.pmean(loss, axis_name)


def chunked_direction(rows, cols_all, T, labels, B, chunk,
                      label_smoothing=0.0, axis_name=None):
    """One direction of the chunked loss: local ``[b, E]`` rows against
    pre-gathered ``[ceil(B/chunk)*chunk, E]`` columns, online logsumexp.

    Standalone (``axis_name=None``) it is the exact per-chip compute of a
    ``chunked_sharded_infonce_loss`` direction minus the ICI gathers —
    used by experiments/profile_train.py to put a real-hardware number on
    BASELINE config #5's per-chip work with one chip."""
    b = rows.shape[0]
    rows32 = rows.astype(jnp.float32)
    tail = cols_all.shape[0] % chunk
    if tail:  # standalone callers may pass unpadded columns
        cols_all = jnp.pad(cols_all, ((0, chunk - tail), (0, 0)))

    def body(carry, c):
        m, s, gold, tot = carry
        block = jax.lax.dynamic_slice(
            cols_all, (c * chunk, 0), (chunk, cols_all.shape[1])
        ).astype(jnp.float32)
        logits = T * jnp.dot(rows32, block.T,
                             precision=jax.lax.Precision.HIGHEST)
        col_ids = c * chunk + jnp.arange(chunk)
        valid = (col_ids < B)[None, :]
        logits = jnp.where(valid, logits, -jnp.inf)
        # online logsumexp
        m_new = jnp.maximum(m, logits.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(
            logits - m_new[:, None]
        ).sum(axis=-1)
        # gold logit if this chunk holds the diagonal column
        hit = col_ids[None, :] == labels[:, None]
        gold = gold + jnp.where(hit, logits, 0.0).sum(axis=-1)
        # running sum of valid logits (label-smoothing mean term)
        tot = tot + jnp.where(valid, logits, 0.0).sum(axis=-1)
        return (m_new, s, gold, tot), None

    m0 = jnp.full((b,), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((b,), jnp.float32)
    g0 = jnp.zeros((b,), jnp.float32)
    t0 = jnp.zeros((b,), jnp.float32)
    if axis_name is not None:
        # mark the carry as varying over the mapped axis (the body mixes
        # in shard-local data, so the output carry is axis-varying)
        m0, s0, g0, t0 = _pvary((m0, s0, g0, t0), (axis_name,))
    n_chunks = cols_all.shape[0] // chunk
    (m, s, gold, tot), _ = jax.lax.scan(
        body, (m0, s0, g0, t0), jnp.arange(n_chunks)
    )
    logz = m + jnp.log(s)
    # (1-ls)*(logz - gold) + ls*(logz - mean) with mean = tot / B —
    # identical decomposition to _ce's smoothing term
    target = (1.0 - label_smoothing) * gold + label_smoothing * (tot / B)
    return (logz - target).mean()
