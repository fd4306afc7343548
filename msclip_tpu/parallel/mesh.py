"""Device mesh + sharding rules.

The TPU-native replacement for the reference's NCCL/DDP layer
(``lib/utils/comm.py``, ``lib/utils/utils.py:61-73``): a 2-D
``jax.sharding.Mesh`` with axes ``('data', 'model')``; the batch is sharded
on ``data`` (pure DP reproduces the reference's only strategy, SURVEY.md
§2.6), and an optional ``model`` axis tensor-parallelizes the trunk's
attention/MLP weights. XLA inserts all collectives.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int = -1, model: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(config, devices=None) -> Mesh:
    return create_mesh(config.TPU.MESH_DATA, config.TPU.MESH_MODEL, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_pspec(path_keys, leaf) -> P:
    """Tensor-parallel partition spec for one parameter.

    Megatron-style column/row split of each transformer block:
      qkv_w [E, 3E]  -> split output dim   (column)
      out_w [E, E]   -> split input dim    (row)
      c_fc  [E, 4E]  -> split output dim   (column)
      c_proj[4E, E]  -> split input dim    (row)
    Biases of column-split layers split likewise; everything else
    (stems, convs, LNs, embeddings) is replicated — they are tiny.
    """
    keys = [str(k) for k in path_keys]
    path = "/".join(keys)
    if "attn" in keys:
        leafname = keys[-1]
        if leafname in ("qkv_w", "qkv_b"):
            return P(None, MODEL_AXIS) if leaf.ndim == 2 else P(MODEL_AXIS)
        if leafname == "out_w":
            return P(MODEL_AXIS, None)
        return P()  # out_b replicated
    if "mlp" in keys:
        if "c_fc" in keys:
            return P(None, MODEL_AXIS) if leaf.ndim == 2 else P(MODEL_AXIS)
        if "c_proj" in keys and keys[-1] == "w":
            return P(MODEL_AXIS, None)
        return P()
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for the full param tree."""

    def one(path, leaf):
        spec = _param_pspec([p.key if hasattr(p, "key") else p.idx
                             for p in path], leaf)
        if mesh.shape[MODEL_AXIS] == 1:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(mesh, params)
    return jax.device_put(params, shardings)


def fsdp_param_shardings(mesh: Mesh, params, min_size: int = 65536):
    """ZeRO-3 / FSDP analogue: shard every large parameter over ``data``.

    The SPMD formulation of fully-sharded data parallelism (the
    scaling-book recipe; DeepSpeed stage 3 is the reference-world
    counterpart of its exported ``zero_optimization`` stub): parameters
    are STORED partitioned over the data axis, XLA all-gathers each
    weight right before its fwd/bwd use (the gather rides ICI and
    overlaps with compute under the latency-hiding scheduler) and
    reduce-scatters the gradient into the partitioned update. Because
    optax moment init inherits leaf shardings (``zeros_like``), the
    AdamW state is partitioned identically for free — ZeRO-1 is subsumed.
    Per-device train-state memory for an N-chip data axis drops from
    ``4x params`` fp32 (weights + 2 moments + grads) to ``~4x/N`` for
    every sharded leaf.

    Layout rule per leaf: keep the tensor-parallel dims from
    ``_param_pspec`` when ``model > 1``, then shard the LARGEST still-free
    dim that divides evenly by the data-axis size; leaves smaller than
    ``min_size`` elements (LN scales, biases, BN stats, small conv stems)
    stay replicated — gathering them costs more latency than the bytes
    saved. The train step preserves whatever layout the input state
    carries (trainer.py sharding-preserving contract), so FSDP needs no
    trainer change: shard the initial state and every step keeps it
    partitioned."""
    n_data = mesh.shape[DATA_AXIS]

    def one(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0 or leaf.size < max(min_size, n_data):
            return NamedSharding(mesh, P())
        keys = [p.key if hasattr(p, "key") else p.idx for p in path]
        spec = (_param_pspec(keys, leaf) if mesh.shape[MODEL_AXIS] > 1
                else P())
        dims = list(spec) + [None] * (ndim - len(spec))
        best = None
        for d in range(ndim):
            if (dims[d] is None and leaf.shape[d] >= n_data
                    and leaf.shape[d] % n_data == 0):
                if best is None or leaf.shape[d] > leaf.shape[best]:
                    best = d
        if best is not None:
            dims[best] = DATA_AXIS
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 65536):
    """Apply FSDP shardings (``TPU.FSDP``) to a param pytree."""
    return jax.device_put(params, fsdp_param_shardings(mesh, params,
                                                       min_size))


def optstate_shardings(mesh: Mesh, opt_state):
    """ZeRO-1 shardings: optimizer-state arrays split over the data axis.

    The TPU-native analogue of DeepSpeed's ``zero_optimization`` stage 1
    (the reference exports a DEEPSPEED config stub but the release never
    runs it): AdamW's first/second moments are the dominant train-state
    memory (2x params in fp32), and under pure DP they are replicated on
    every chip. Sharding them over ``data`` cuts that to 2x/N; XLA
    inserts the gather for the update and keeps the weight update itself
    partitioned (sharding propagation through ``tx.update``).

    Rules: leaves already non-replicated (TP-sharded moments when
    ``MESH_MODEL > 1``) keep their sharding; otherwise arrays whose
    leading dim divides evenly get ``P('data')``; scalars (step counts)
    and indivisible leaves stay replicated.
    """
    n_data = mesh.shape[DATA_AXIS]

    def one(leaf):
        cur = getattr(leaf, "sharding", None)
        if cur is not None and hasattr(cur, "is_fully_replicated") \
                and not cur.is_fully_replicated:
            return cur
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] >= n_data and leaf.shape[0] % n_data == 0):
            return NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (leaf.ndim - 1)))
            )
        return NamedSharding(mesh, P())

    return jax.tree.map(one, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Apply ZeRO-1 shardings (``TPU.ZERO1``) to an optax state tree."""
    return jax.device_put(opt_state, optstate_shardings(mesh, opt_state))
