"""Contrastive pretraining driver.

The training entry point the reference release omits, reconstructed from
its config surface (SURVEY.md §3.3) and built TPU-first: mesh-sharded jit
train step, global-batch InfoNCE over the data axis, warmup-cosine AdamW
with shared-param LR/WD group, Orbax checkpointing with AUTO_RESUME.

    python tools/train.py --cfg experiments/model/b32-yfcc-msclips.yaml \
        [DATASET.DATASET synthetic TRAIN.END_EPOCH 1 ...]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.data.loader import BatchLoader
from msclip_tpu.data.pairs import make_train_dataset
from msclip_tpu.models import build_model
from msclip_tpu.parallel import mesh_from_config, shard_params
from msclip_tpu.train import CheckpointManager, auto_resume
from msclip_tpu.train.averaging import swa_should_update, swa_update
from msclip_tpu.train.optim import build_optimizer
from msclip_tpu.train.trainer import init_train_state, make_train_step
from msclip_tpu.utils.logging import create_logger
from msclip_tpu.utils.platform import xla_compiler_options


def parse_args():
    p = argparse.ArgumentParser(description="Train an MS-CLIP model.")
    p.add_argument("--cfg", required=True, help="model config yaml")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    config = get_default_config()
    update_config(config, args.cfg, opts=args.opts,
                  world_size=jax.process_count())

    out_dir = create_logger(config, args.cfg, "train")
    logging.info(f"=> devices: {jax.devices()}")

    if config.TRAIN.DETECT_ANOMALY:
        # reference lib/config/default.py:151 (torch autograd anomaly
        # mode); the JAX analogue re-runs NaN-producing jit computations
        # de-optimized and raises at the faulting primitive
        from msclip_tpu.utils.summary import debug_nans

        debug_nans(True)
        logging.info("=> TRAIN.DETECT_ANOMALY: jax_debug_nans enabled")

    model = build_model(config)
    spec = model.spec
    dataset = make_train_dataset(config)
    n_devices = jax.device_count()
    global_batch = config.TRAIN.BATCH_SIZE_PER_GPU * n_devices
    per_process_batch = global_batch // jax.process_count()
    loader = BatchLoaderPairs(
        dataset, per_process_batch, workers=config.WORKERS,
        shuffle=config.TRAIN.SHUFFLE, sampler=config.DATASET.SAMPLER,
        seed=config.TPU.SEED,
    )
    steps_per_epoch = max(len(dataset) // global_batch, 1)

    mesh = mesh_from_config(config)
    params = model.init(jax.random.PRNGKey(config.TPU.SEED))
    if config.TPU.FSDP:
        # ZeRO-3/FSDP analogue: params stored partitioned over 'data';
        # optax moment init inherits the leaf shardings, so the whole
        # train state is partitioned and the sharding-preserving step
        # keeps it that way (no opt_shardings pin needed).
        from msclip_tpu.parallel import shard_params_fsdp

        params = shard_params_fsdp(params, mesh)
    else:
        params = shard_params(params, mesh)
    tx, _ = build_optimizer(config, params, spec, steps_per_epoch)
    state = init_train_state(model, tx, params=params,
                             ema_decay=config.TRAIN.EMA_DECAY)
    opt_shardings = None
    if config.TPU.ZERO1 and not config.TPU.FSDP:
        # ZeRO-1: AdamW moments sharded over the data axis (the TPU
        # analogue of the reference's DEEPSPEED zero_optimization stub)
        from msclip_tpu.parallel import optstate_shardings

        opt_shardings = optstate_shardings(mesh, state.opt_state)
        state = state._replace(
            opt_state=jax.device_put(state.opt_state, opt_shardings)
        )

    ckpt_mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    begin_epoch = config.TRAIN.BEGIN_EPOCH
    resume_skip = 0
    swa_params, swa_n = None, jnp.asarray(0)
    # the loader's per-epoch batch count, computed arithmetically —
    # len(loader) would rerun the full O(n) sampler draw at corpus scale
    n_batches = max(loader.num_batches, 1)
    if config.TRAIN.AUTO_RESUME:
        p, o, step, extra = auto_resume(
            ckpt_mgr, state.params, state.opt_state,
            shadow_templates={"ema": state.ema_params,
                              "swa": state.params},
        )
        if step:
            state = state._replace(
                params=p, opt_state=o, step=jnp.asarray(step, jnp.int32)
            )
            begin_epoch = extra.get("epoch", begin_epoch)
            # restore the EMA/SWA shadows too — leaving them at their
            # init values would silently anchor the EMA to random
            # weights and discard prior SWA accumulation
            shadows = extra.get("shadows", {})
            if state.ema_params is not None:
                if "ema" in shadows:
                    state = state._replace(ema_params=shadows["ema"])
                else:
                    # checkpoint carries no shadow (written pre-shadow or
                    # metadata was unreadable): re-anchor to the RESTORED
                    # weights — the pre-resume shadow is a copy of the
                    # random init and would dominate the EMA for
                    # thousands of steps
                    logging.info("=> no EMA shadow in checkpoint; "
                                 "re-anchoring EMA to restored weights")
                    state = state._replace(
                        ema_params=jax.tree.map(jnp.copy, state.params)
                    )
            if "swa" in shadows:
                swa_params = shadows["swa"]
                swa_n = jnp.asarray(int(extra.get("swa_n", 0)))
            # Mid-epoch resume: fast-forward past the batches the restored
            # step already consumed so the data position matches the
            # step/LR schedule instead of replaying the epoch from batch 0.
            resume_skip = int(step) % n_batches
            if resume_skip:
                logging.info(
                    f"=> resume fast-forward: skipping {resume_skip} "
                    f"already-seen batches of epoch {begin_epoch}"
                )

    def _make_step(freeze_bn=False):
        return make_train_step(
            spec, tx, mesh=mesh,
            sharded_loss=config.TPU.SHARDED_LOSS,
            loss_chunk=config.TPU.LOSS_CHUNK,
            ring_loss=config.TPU.RING_LOSS,
            ema_decay=config.TRAIN.EMA_DECAY,
            label_smoothing=config.LOSS.LABEL_SMOOTHING,
            seed=config.TPU.SEED,
            opt_shardings=opt_shardings,
            freeze_bn=freeze_bn,
            accum_steps=int(config.TPU.get("ACCUM_STEPS", 1)),
            compiler_options=xla_compiler_options(
                int(config.TPU.get("XLA_VMEM_KIB", 0))
            ),
        )

    step_fn = _make_step()
    frozen_step_fn = None

    logging.info(
        f"=> training: {steps_per_epoch} steps/epoch x "
        f"{config.TRAIN.END_EPOCH} epochs, global batch {global_batch}"
    )
    save_every = config.TRAIN.SAVE_EVERY_STEPS
    global_step = int(state.step)  # host-side mirror: no device sync/step
    # MSCLIP_TRACE=<dir>: xprof trace of steady-state steps 4-7 of the
    # first epoch (past compile + warmup), rank 0 only — the CLI hook for
    # utils/summary.profile_trace (SURVEY.md §5 tracing)
    trace_dir = os.environ.get("MSCLIP_TRACE")
    tracing = False
    for epoch in range(begin_epoch, config.TRAIN.END_EPOCH):
        loader.set_epoch(epoch)  # fresh shuffle/sampler draws per epoch
        if resume_skip and epoch == begin_epoch:
            loader.fast_forward(resume_skip)
        epoch_step_fn = step_fn
        if config.SWA.FROZEN_BN and swa_should_update(epoch, config):
            # SWA.FROZEN_BN (lib/config/default.py:116): once averaging
            # starts, BatchNorm runs in eval mode — fold running stats,
            # stop updating them (compiled once, lazily)
            if frozen_step_fn is None:
                frozen_step_fn = _make_step(freeze_bn=True)
            epoch_step_fn = frozen_step_fn
        t0 = time.time()
        seen = 0
        for i, batch in enumerate(loader):
            # raw numpy straight into the step — the mesh wrapper commits
            # it (device_put / host_local assembly); a jnp.asarray here
            # would add a redundant host->device->host->device round trip
            # on the multi-process path
            if (trace_dir and not tracing and epoch == begin_epoch
                    and i == 3 and jax.process_index() == 0):
                jax.profiler.start_trace(trace_dir)
                tracing = True
            state, metrics = epoch_step_fn(state, batch["image"],
                                           batch["tokens"])
            if tracing and i >= 6:
                float(metrics["loss"])  # barrier: flush the traced steps
                jax.profiler.stop_trace()
                tracing = False
                trace_dir = None
                logging.info("xprof trace written (MSCLIP_TRACE)")
            global_step += 1
            seen += batch["image"].shape[0]
            if (save_every and global_step % save_every == 0
                    and global_step % n_batches != 0):
                # mid-epoch checkpoint: epoch NOT advanced (resume
                # re-enters this epoch and fast-forwards the loader).
                # Skipped when it coincides with the epoch's last step:
                # the epoch-end save must own that step so a kill in
                # between cannot leave epoch-E metadata at an
                # epoch-boundary step (which would replay the epoch).
                ckpt_mgr.save(global_step, state.params, state.opt_state,
                              extra={"epoch": epoch,
                                     "swa_n": int(swa_n)},
                              shadows={"ema": state.ema_params,
                                       "swa": swa_params})
            if (i + 1) % config.PRINT_FREQ == 0:
                loss = float(metrics["loss"])
                ips = seen / (time.time() - t0)
                logging.info(
                    f"Epoch[{epoch}] Step[{i + 1}/{steps_per_epoch}] "
                    f"loss {loss:.4f} ({ips:.0f} samples/s)"
                )
        if tracing:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            tracing = False
            trace_dir = None
        if swa_should_update(epoch, config):
            if swa_params is None:
                # first snapshot counts as one averaged model (torch
                # AveragedModel semantics: n=0 means "replace on next
                # update" — leaving n at 0 here would discard this epoch).
                # jnp.copy: the snapshot must not alias state.params —
                # the next donated step would invalidate shared buffers.
                swa_params = jax.tree.map(jnp.copy, state.params)
                swa_n = jnp.asarray(1)
            else:
                swa_params, swa_n = swa_update(swa_params, state.params,
                                               swa_n)
        # force: an epoch that yields zero batches (stripe smaller than
        # the per-process batch) leaves global_step unchanged — the
        # second epoch-end save at the same step must replace, not raise
        ckpt_mgr.save(global_step, state.params, state.opt_state,
                      extra={"epoch": epoch + 1, "swa_n": int(swa_n)},
                      shadows={"ema": state.ema_params,
                               "swa": swa_params},
                      force=True)
        if state.ema_params is not None or swa_params is not None:
            # EMA/SWA shadows: the reference's ema_shadow_states /
            # swa_states checkpoint fields (lib/utils/utils.py:157-201)
            from msclip_tpu.train import save_params

            if state.ema_params is not None:
                save_params(os.path.join(out_dir, "checkpoints", "ema"),
                            state.ema_params)
            if swa_params is not None:
                save_params(os.path.join(out_dir, "checkpoints", "swa"),
                            swa_params)
        logging.info(f"=> epoch {epoch} done in {time.time() - t0:.1f}s")
    if swa_params is not None and not config.SWA.FROZEN_BN:
        if jax.process_count() > 1:
            # the refresh step is single-process (host-local batches,
            # stripe-local statistics); divergent per-host stats would
            # corrupt the collective export. Use SWA.FROZEN_BN at scale.
            logging.warning(
                "=> SWA BN refresh skipped under multi-process training "
                "(single-process only); exported SWA weights keep the "
                "last model's BN stats — prefer SWA.FROZEN_BN=True"
            )
        else:
            # torch update_bn semantics: the averaged weights' BN running
            # stats are stale (they belong to the LAST model, not the
            # average) — recompute them as the cumulative average over one
            # pass of the training data, then overwrite the exported shadow
            from msclip_tpu.train import save_params
            from msclip_tpu.train.averaging import swa_refresh_bn

            logging.info("=> SWA: refreshing BN statistics over one epoch")
            swa_params = swa_refresh_bn(
                swa_params, spec, (b["image"] for b in loader)
            )
            save_params(os.path.join(out_dir, "checkpoints", "swa"),
                        swa_params)
    ckpt_mgr.wait()
    ckpt_mgr.close()
    logging.info("=> training complete")


class BatchLoaderPairs(BatchLoader):
    """BatchLoader yielding {'image','tokens'} with drop_last semantics for
    fixed global-batch training; each host process loads its stripe of the
    dataset (multi-host data parallelism)."""

    def __init__(self, dataset, batch_size, workers=8, shuffle=True, seed=0,
                 sampler="default"):
        super().__init__(dataset, batch_size, workers=workers,
                         shuffle=shuffle, seed=seed, drop_last=True,
                         shard=(jax.process_index(), jax.process_count()),
                         sampler=sampler,
                         # all ranks MUST agree on batches/epoch: unequal
                         # stripes deadlock the mesh collectives and skew
                         # the resume modulus (see BatchLoader.equal_shards)
                         equal_shards=True)

    def __iter__(self):
        for batch in super().__iter__():
            yield {"image": batch["image"], "tokens": batch["label"]}


if __name__ == "__main__":
    main()
