"""Feature extraction + linear probing.

The reference's model-zoo table reports "linear probing" averages over a
24-dataset suite (``README.md:24-28``); the probe runner is not in the
release. We implement the standard CLIP protocol: extract frozen
``encode_image`` features, then fit a linear classifier. Two backends:

* ``probe="sklearn"`` — logistic regression (L-BFGS), the protocol of the
  CLIP paper; runs on host.
* ``probe="jax"``     — jit-compiled multinomial logistic regression with
  AdamW on device; scales to large feature sets without leaving the TPU.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import BatchLoader
from ..models import MSClipModel


def extract_features(model: MSClipModel, params, dataset, batch_size=256,
                     workers=8, normalize=True) -> Tuple[np.ndarray, np.ndarray]:
    """Run the frozen image tower over a dataset -> (features, labels).

    ``batch_size`` is per chip; the loop shards each batch over all
    local devices (``eval/device.py``)."""
    from .device import local_batch_sharding
    from ..data.transforms import dataset_normalizer

    n_local, sharding = local_batch_sharding()
    # uint8-boundary datasets (native decode) normalize in-graph
    pre = dataset_normalizer(dataset)
    encode = jax.jit(
        lambda p, x: model.encode_image(p, pre(x), normalize=normalize)
    )
    loader = BatchLoader(dataset, batch_size * n_local, workers=workers)
    feats, labels = [], []
    for batch in loader:
        # one sharded host->chips transfer, straight from numpy
        images = (jax.device_put(batch["image"], sharding)
                  if sharding is not None
                  else jnp.asarray(batch["image"]))
        f = np.asarray(encode(params, images))
        mask = batch["mask"]
        feats.append(f[mask])
        labels.append(np.asarray(batch["label"])[mask])
    return np.concatenate(feats), np.concatenate(labels)


def fit_linear_probe_sklearn(train_x, train_y, test_x, test_y,
                             C: float = 3.16, max_iter: int = 1000,
                             sweep_c: bool = False, seed: int = 0):
    """Logistic-regression probe. With ``sweep_c`` (the CLIP-paper
    protocol, arXiv 2103.00020 A.3): hold out 10% of train as
    validation, run a coarse log-spaced sweep over C in [1e-6, 1e6]
    followed by iterative halving around the peak (~12 fits total),
    then refit on the full train split with the winner."""
    from sklearn.linear_model import LogisticRegression

    def fit_score(c, x, y, vx, vy):
        clf = LogisticRegression(C=c, max_iter=max_iter, verbose=0)
        clf.fit(x, y)
        return clf.score(vx, vy)

    if sweep_c:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(train_x))
        n_val = max(1, len(order) // 10)
        va, tr = order[:n_val], order[n_val:]
        tx_, ty_ = train_x[tr], train_y[tr]
        vx_, vy_ = train_x[va], train_y[va]
        # coarse grid in log10(C), then 3 halving refinements
        grid = [-6.0, -4.0, -2.0, 0.0, 2.0, 4.0, 6.0]
        scores = {g: fit_score(10.0 ** g, tx_, ty_, vx_, vy_)
                  for g in grid}
        span = 2.0
        for _ in range(3):
            best = max(scores, key=lambda g: (scores[g], -abs(g)))
            span /= 2.0
            for g in (best - span, best + span):
                if g not in scores:
                    scores[g] = fit_score(10.0 ** g, tx_, ty_, vx_, vy_)
        best = max(scores, key=lambda g: (scores[g], -abs(g)))
        C = 10.0 ** best
        logging.info(f"=> C sweep: best C={C:.4g} "
                     f"(val acc {100 * scores[best]:.2f}%, "
                     f"{len(scores)} fits)")

    clf = LogisticRegression(C=C, max_iter=max_iter, verbose=0)
    clf.fit(train_x, train_y)
    return 100.0 * clf.score(test_x, test_y)


def fit_linear_probe_jax(train_x, train_y, test_x, test_y,
                         n_classes: Optional[int] = None, epochs: int = 100,
                         lr: float = 1e-3, wd: float = 1e-4,
                         batch_size: int = 1024, seed: int = 0):
    """Device-resident multinomial logistic regression."""
    import optax

    n_classes = n_classes or int(train_y.max()) + 1
    d = train_x.shape[1]
    params = {
        "w": jnp.zeros((d, n_classes), jnp.float32),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    tx = optax.adamw(lr, weight_decay=wd)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = train_x.shape[0]
    rng = np.random.default_rng(seed)
    x_dev = jnp.asarray(train_x)
    y_dev = jnp.asarray(train_y)
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = jnp.asarray(order[i : i + batch_size])
            params, opt_state, loss = step(
                params, opt_state, x_dev[idx], y_dev[idx]
            )

    logits = np.asarray(jnp.asarray(test_x) @ params["w"] + params["b"])
    return 100.0 * (logits.argmax(-1) == test_y).mean()


def run_linear_probe(config, train_dataset, test_dataset,
                     probe: str = "sklearn", **probe_kw):
    """Full probe: load model, extract features for both splits, fit."""
    from ..models import build_model
    from .checkpoint_load import load_model_params

    model = build_model(config)
    params = load_model_params(config, model)
    t0 = time.time()
    train_x, train_y = extract_features(
        model, params, train_dataset,
        batch_size=config.TEST.BATCH_SIZE_PER_GPU, workers=config.WORKERS,
    )
    test_x, test_y = extract_features(
        model, params, test_dataset,
        batch_size=config.TEST.BATCH_SIZE_PER_GPU, workers=config.WORKERS,
    )
    logging.info(
        f"=> extracted {len(train_x)}+{len(test_x)} features "
        f"in {time.time() - t0:.1f}s"
    )
    if probe == "sklearn":
        acc = fit_linear_probe_sklearn(train_x, train_y, test_x, test_y,
                                       **probe_kw)
    else:
        acc = fit_linear_probe_jax(train_x, train_y, test_x, test_y,
                                   **probe_kw)
    logging.info(f"=> linear probe accuracy: {acc:.3f}%")
    return acc
