"""Worker for the 2-process multi-host test (``test_multihost.py``).

Run as: python multihost_worker.py <process_id> <num_processes> <port>
Initializes jax.distributed over localhost with a 2-CPU-device platform
per process, exercises the utils/comm.py surface at a REAL process
boundary, and prints CHECK lines the parent asserts on.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.utils.comm import (
    all_gather_object,
    comm,
    gather_arrays,
    reduce_dict,
)

assert comm.rank == pid and comm.world_size == nproc
assert comm.is_main_process() == (pid == 0)
assert jax.device_count() == 2 * nproc  # global devices across processes
comm.synchronize()

# object gather: different-sized payloads per process
objs = all_gather_object({"rank": pid, "payload": "x" * (10 + 100 * pid)})
assert [o["rank"] for o in objs] == list(range(nproc)), objs
assert len(objs[1]["payload"]) == 110

# array gather: EQUAL shapes
arr = np.full((3, 4), pid, np.float32)
out = gather_arrays(arr)
assert out.shape == (3 * nproc, 4), out.shape
assert (out[:3] == 0).all() and (out[3:6] == 1).all()

# array gather: UNEQUAL leading dims (eval stripes differ by one batch
# when the dataset size is not divisible by world size)
uneq = np.full((2 + pid, 4), pid, np.float32)
out = gather_arrays(uneq)
assert out.shape == (2 * nproc + nproc * (nproc - 1) // 2, 4), out.shape
assert (out[:2] == 0).all() and (out[2:5] == 1).all()

# metric reduction
red = reduce_dict({"loss": float(pid + 1), "n": 10.0}, average=False)
assert red["loss"] == sum(range(1, nproc + 1)) and red["n"] == 10.0 * nproc
avg = reduce_dict({"loss": float(pid + 1)}, average=True)
assert abs(avg["loss"] - (nproc + 1) / 2) < 1e-6

# a real cross-process collective: global-batch psum over the 4-device
# mesh (data-parallel loss semantics across process boundaries)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
local = np.full((2, 8), float(pid + 1), np.float32)  # one row per local dev
from jax.experimental import multihost_utils

garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data")
)


@jax.jit
def global_mean(x):
    return x.mean()


gm = float(global_mean(garr))
want = np.mean([p + 1 for p in range(nproc) for _ in range(2)])
assert abs(gm - want) < 1e-6, (gm, want)

# ---- end-to-end striped zero-shot eval across the two processes ----
# Each process evaluates its stripe (order[rank::world]); the merged
# metric must EQUAL the single-process run on the full dataset. 18
# samples / 2 processes -> unequal per-batch tails exercise the padded
# gather. Covers both merge branches (accuracy reduce_dict; multilabel
# logits gather_arrays).
from msclip_tpu.config import get_default_config
from msclip_tpu.eval.zero_shot import run_zero_shot
from msclip_tpu.data.datasets import SyntheticImageDataset

cfg = get_default_config()
cfg.merge_from_dict({
    "DATASET": {"DATASET": "synthetic", "NUM_SAMPLES": 18,
                "NUM_CLASSES": 10},
    "TRAIN": {"IMAGE_SIZE": [32, 32]},
    "TEST": {"IMAGE_SIZE": [32, 32], "BATCH_SIZE_PER_GPU": 2,
             "SUBSET_CLASSES": 10},
    "MODEL": {"SPEC": {
        "EMBED_DIM": 16,
        "VISION": {"WIDTH": 64, "LAYERS": 2, "PATCH_SIZE": 16},
        "TEXT": {"WIDTH": 64, "HEADS": 2, "LAYERS": 2},
    }},
    "WORKERS": 2,
})
value, stats = run_zero_shot(cfg, prompt_dataset="imagenet")
# single-process truth computed identically on rank 0's full view:
# re-run with a world-of-one by monkeypatching the comm rank/world
import msclip_tpu.utils.comm as C

single = {}
if pid == 0:
    class _Solo:
        rank = 0
        world_size = 1

        @staticmethod
        def is_main_process():
            return True

        @staticmethod
        def synchronize():
            pass

    orig = C.comm
    try:
        # run_zero_shot re-imports utils.comm.comm at call time, so
        # patching the module attribute gives it a world of one
        C.comm = _Solo()
        solo_value, _ = run_zero_shot(cfg, prompt_dataset="imagenet")
    finally:
        C.comm = orig
    assert abs(value - solo_value) < 1e-6, (value, solo_value)
comm.synchronize()
assert stats["n_images"] == 9

# same, through the gathered-logits merge branch (mean-per-class): the
# striped run's gathered logits/labels must reproduce the solo metric
cfg.TEST.METRIC = "mean-per-class"
value_mpc, _ = run_zero_shot(cfg, prompt_dataset="imagenet")
if pid == 0:
    try:
        C.comm = _Solo()
        solo_mpc, _ = run_zero_shot(cfg, prompt_dataset="imagenet")
    finally:
        C.comm = orig
    assert abs(value_mpc - solo_mpc) < 1e-6, (value_mpc, solo_mpc)
comm.synchronize()

# ---- multi-process TRAINING: global-batch InfoNCE across processes ----
# Each process feeds its stripe of a fixed global batch; the mesh spans
# all 4 devices across both processes. The loss must equal the
# single-process computation on the assembled global batch (the
# property the reference gets from its gather_tensors hack).
from msclip_tpu.models import MSClipModel, MSClipSpec
from msclip_tpu.parallel import create_mesh, infonce_loss, shard_params
from msclip_tpu.train.optim import build_optimizer
from msclip_tpu.train.trainer import init_train_state, make_train_step

spec = MSClipSpec(
    embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
    vision_patch_size=16, vision_heads=2, text_width=64, text_heads=2,
    text_layers=2, vocab_size=128, context_length=16,
)
model = MSClipModel(spec)
tcfg = get_default_config()
tcfg.TRAIN.LR = 1e-3
params = model.init(jax.random.PRNGKey(0))

mesh = create_mesh(data=jax.device_count(), model=1)
params = shard_params(params, mesh)
tx, _ = build_optimizer(tcfg, params, spec, steps_per_epoch=10)
state = init_train_state(model, tx, params=params)
step = make_train_step(spec, tx, mesh=mesh, sharded_loss=True,
                       loss_chunk=4, donate=False)

rng = np.random.default_rng(42)  # same on both ranks: shared fixture
g_images = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
g_tokens = np.zeros((8, 16), np.int32)
g_tokens[:, 0] = 126
g_tokens[:, 1:4] = rng.integers(1, 126, (8, 3))
g_tokens[:, 4] = 127
# this process's stripe: contiguous block (host_local -> global assembles
# blocks in process order along the data axis)
lo, hi = pid * 4, (pid + 1) * 4
state2, metrics = step(state, g_images[lo:hi], g_tokens[lo:hi])
loss = float(metrics["loss"])
assert np.isfinite(loss)
# single-process truth: unsharded InfoNCE on the full global batch with
# the same (replicated) params
fi = model.encode_image(
    jax.tree.map(lambda l: np.asarray(l), params), jnp.asarray(g_images)
)
ft = model.encode_text(
    jax.tree.map(lambda l: np.asarray(l), params), jnp.asarray(g_tokens)
)
want = float(infonce_loss(fi, ft, jnp.asarray(np.asarray(
    params["logit_scale"]))))
assert abs(loss - want) < 1e-4, (loss, want)
# and one more step runs (the pinned-sharding cache path, multi-process)
state3, metrics2 = step(state2, g_images[lo:hi], g_tokens[lo:hi])
assert np.isfinite(float(metrics2["loss"]))
comm.synchronize()

print(f"CHECK rank={pid} ok", flush=True)
