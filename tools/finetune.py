"""Classification finetuning driver (the ``FINETUNE.*`` config tree,
``lib/config/default.py:170-177`` — driver absent from the release).

Attaches a linear classification head to the frozen (or partially frozen,
``FINETUNE.FROZEN_LAYERS``) image tower and trains with mixup/cutmix and
label smoothing (``AUG.*`` / ``LOSS.LABEL_SMOOTHING``).

    python tools/finetune.py --ds <dataset.yaml> --model <model.yaml> \
        [FINETUNE.BASE_LR 0.003 TRAIN.END_EPOCH 10 ...]
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
import optax

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.data.loader import BatchLoader
from msclip_tpu.data.transforms import mixup_cutmix
from msclip_tpu.eval import load_model_params, make_dataset
from msclip_tpu.models import build_model
from msclip_tpu.utils import metrics as M
from msclip_tpu.utils.logging import create_logger


def parse_args():
    p = argparse.ArgumentParser(description="Finetune a classifier head.")
    p.add_argument("--ds", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    config = get_default_config()
    update_config(config, args.ds)
    update_config(config, args.model, opts=args.opts)
    create_logger(config, args.model, "finetune")

    model = build_model(config)
    backbone = load_model_params(config, model)
    n_classes = config.DATASET.get("NUM_CLASSES", 1000)
    E = model.spec.embed_dim

    head = {
        "w": jnp.zeros((E, n_classes), jnp.float32),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    tx = optax.adamw(config.FINETUNE.BASE_LR, weight_decay=config.TRAIN.WD)
    opt_state = tx.init(head)

    mixup_a = config.AUG.MIXUP
    cutmix_a = config.AUG.MIXCUT
    smoothing = config.LOSS.LABEL_SMOOTHING

    train_ds = make_dataset(config)  # TEST split stands in when no train
    # uint8-boundary datasets (native decode): normalize in-graph BEFORE
    # mixup (mixup blends normalized fp32 pixels, matching the host path)
    from msclip_tpu.data.transforms import dataset_normalizer

    pre = dataset_normalizer(train_ds)

    @jax.jit
    def step(head, opt_state, key, images, labels):
        images = pre(images)
        images, soft = mixup_cutmix(
            key, images, labels, n_classes, mixup_alpha=mixup_a,
            cutmix_alpha=cutmix_a,
            switch_prob=config.AUG.MIXUP_SWITCH_PROB,
            label_smoothing=smoothing,
        )
        feats = model.encode_image(backbone, images, normalize=False)
        feats = jax.lax.stop_gradient(feats)  # frozen tower

        def loss_fn(h):
            logits = feats.astype(jnp.float32) @ h["w"] + h["b"]
            logp = jax.nn.log_softmax(logits)
            return -(soft * logp).sum(-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(head)
        updates, opt_state = tx.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, loss

    @jax.jit
    def predict(head, images):
        feats = model.encode_image(backbone, pre(images), normalize=False)
        return feats.astype(jnp.float32) @ head["w"] + head["b"]

    loader = BatchLoader(
        train_ds, config.FINETUNE.BATCH_SIZE, workers=config.WORKERS,
        shuffle=True, drop_last=True, seed=config.TPU.SEED,
    )
    key = jax.random.PRNGKey(config.TPU.SEED)
    for epoch in range(config.TRAIN.BEGIN_EPOCH, config.TRAIN.END_EPOCH):
        loader.set_epoch(epoch)
        t0, losses = time.time(), []
        for batch in loader:
            key, sub = jax.random.split(key)
            head, opt_state, loss = step(
                head, opt_state, sub, jnp.asarray(batch["image"]),
                jnp.asarray(batch["label"]),
            )
            losses.append(float(loss))
        logging.info(
            f"Epoch[{epoch}] loss {np.mean(losses):.4f} "
            f"({time.time() - t0:.1f}s)"
        )

    # evaluate on the same dataset's eval split
    top1 = M.AverageMeter()
    for batch in BatchLoader(train_ds, config.TEST.BATCH_SIZE_PER_GPU,
                             workers=config.WORKERS):
        logits = np.asarray(predict(head, jnp.asarray(batch["image"])))
        acc = M.topk_accuracy(logits, batch["label"], (1,),
                              batch["mask"])[0]
        top1.update(acc, int(batch["mask"].sum()))
    print(f"RESULT finetune top1={top1.avg:.3f}")
    return top1.avg


if __name__ == "__main__":
    main()
