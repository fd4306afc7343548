"""Training-gradient parity against torch autograd through the reference.

The forward-parity tests (test_model_parity.py) prove the towers agree;
this module proves the *training step's gradients* do. It builds the
reference ``CLIP`` module (every [ON] component active, including the
setattr-aliased shared text layers), converts the weights, computes the
exact training loss (symmetric InfoNCE over normalized embeddings,
``trainer.make_loss_fn`` semantics, BatchNorm in training mode) on both
sides, backprops with torch autograd and ``jax.grad``, and requires every
parameter's gradient to agree after exporting ours back to the reference
layout (``utils/convert.py:export_torch_state_dict``).

This is the strongest training-fidelity proxy available without the
released checkpoints: it covers QuickGELU/LN/BN-batch-stat backward
semantics, the Pallas-vs-autograd boundary (CPU runs the pure-XLA path;
the kernel's own VJP is covered by tests/test_kernels.py), and — via the
aliased layers — that gradient *accumulation* into shared trunk weights
matches torch's aliased-parameter accumulation.

Reference loss form: ``CLIP.forward``'s contrastive logits
(/root/reference/lib/models/clip_openai_pe_res_v1.py:3126-3155) consumed
by a symmetric cross-entropy, the standard CLIP training objective.
"""

import numpy as np
import pytest

import jax

from msclip_tpu.models import build_model
from msclip_tpu.train.trainer import make_loss_fn
from msclip_tpu.utils import convert_torch_state_dict, export_torch_state_dict

from reference_oracle import (
    load_reference_model_module,
    reference_available,
    tiny_msclips_config,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def tiny_pair():
    import torch

    ref_mod = load_reference_model_module()
    cfg = tiny_msclips_config()
    torch.manual_seed(0)
    ref = ref_mod.get_clip_model(cfg)
    # randomized running stats: irrelevant to train-mode grads (batch
    # stats are used) but keeps the converted tree non-degenerate
    torch.manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    model = build_model(cfg)
    params = convert_torch_state_dict(ref.state_dict(), model.spec)
    return ref, model, params


def _rand_batch(batch=4, img=64, vocab=512):
    rng = np.random.default_rng(7)
    images = rng.standard_normal((batch, 3, img, img)).astype(np.float32)
    tokens = np.zeros((batch, 77), dtype=np.int64)
    for i in range(batch):
        n = int(rng.integers(5, 20))
        tokens[i, 0] = vocab - 2  # sot
        tokens[i, 1:n] = rng.integers(1, vocab - 2, n - 1)
        tokens[i, n] = vocab - 1  # eot (highest id -> argmax pooling)
    return images, tokens


def _torch_loss(ref, images, tokens, label_smoothing=0.0):
    """The exact loss ``trainer.make_loss_fn`` computes, in torch."""
    import torch
    import torch.nn.functional as F

    fi = ref.encode_image(torch.tensor(images))
    ft = ref.encode_text(torch.tensor(tokens))
    T = ref.logit_scale.exp().float()
    logits = T * (fi.float() @ ft.float().t())
    labels = torch.arange(logits.shape[0])
    return 0.5 * (
        F.cross_entropy(logits, labels, label_smoothing=label_smoothing)
        + F.cross_entropy(logits.t(), labels,
                          label_smoothing=label_smoothing)
    )


def _grad_pair(tiny_pair, label_smoothing):
    """(torch name->grad, our exported name->grad, losses)."""
    import torch

    ref, model, params = tiny_pair
    images, tokens = _rand_batch()

    ref.train()
    ref.zero_grad(set_to_none=True)
    # keep the module fixture's running stats untouched for other tests
    saved = {
        k: v.clone() for k, v in ref.state_dict().items()
        if "running_" in k or "num_batches" in k
    }
    loss_t = _torch_loss(ref, images, tokens, label_smoothing)
    loss_t.backward()
    # every torch parameter must participate in the loss — a param with
    # grad=None silently dropping out of `want` would hide a JAX-side
    # wiring difference in EITHER direction (advisor r3); no exceptions
    # are expected for this fully-wired tiny spec
    ungradded = [n for n, p in ref.named_parameters() if p.grad is None]
    assert not ungradded, f"torch params got no gradient: {ungradded[:5]}"
    want = {
        name: p.grad.detach().numpy()
        for name, p in ref.named_parameters()
    }
    ref.eval()
    with torch.no_grad():
        for k, v in saved.items():
            ref.state_dict()[k].copy_(v)

    loss_fn = make_loss_fn(model.spec, label_smoothing=label_smoothing)
    imgs_j = jax.numpy.array(images.transpose(0, 2, 3, 1))
    toks_j = jax.numpy.array(tokens)
    loss_j, grads = jax.jit(
        lambda p: jax.value_and_grad(
            lambda q: loss_fn(q, imgs_j, toks_j)[0]
        )(p)
    )(params)
    got = export_torch_state_dict(jax.device_get(grads), model.spec)
    return want, got, float(loss_t.item()), float(loss_j)


@pytest.mark.parametrize("label_smoothing", [0.0, 0.1])
def test_training_gradients_match_torch_autograd(tiny_pair, label_smoothing):
    want, got, loss_t, loss_j = _grad_pair(tiny_pair, label_smoothing)
    assert abs(loss_t - loss_j) < 5e-5, (loss_t, loss_j)

    # key-set equivalence in BOTH directions (advisor r3: the forward
    # check alone could never fire because the exporter emits every
    # key-map entry): every torch param grad must be exported, and every
    # exported key must name a real torch state_dict entry (params OR the
    # BN-stat buffers the converter also carries) — a renamed/stale
    # converter key shows up here
    missing = [n for n in want if n not in got]
    assert not missing, f"exported grad tree lacks {missing[:5]}"
    ref = tiny_pair[0]
    sd_keys = set(ref.state_dict().keys())
    alien = [n for n in got if n not in sd_keys]
    assert not alien, f"exporter emitted keys torch doesn't have: {alien[:5]}"

    bad = []
    for name, g_ref in want.items():
        g_ours = np.asarray(got[name], np.float32)
        denom = max(float(np.abs(g_ref).max()), 1e-6)
        rel = float(np.abs(g_ours - g_ref).max()) / denom
        if rel > 3e-3:
            bad.append((name, rel))
    assert not bad, f"gradient mismatch on {len(bad)} tensors: {bad[:8]}"


def test_bn_running_stats_get_no_loss_gradient(tiny_pair):
    """Training-mode BN uses batch stats, so the loss gradient w.r.t. the
    stored running stats must be exactly zero (they are optimizer-frozen
    buffers — train/optim.py labels them; this proves the loss itself
    never consumes them in training mode)."""
    _, model, params = tiny_pair
    images, tokens = _rand_batch(batch=2)
    loss_fn = make_loss_fn(model.spec)
    grads = jax.grad(
        lambda p: loss_fn(p, jax.numpy.array(images.transpose(0, 2, 3, 1)),
                          jax.numpy.array(tokens))[0]
    )(params)

    found = []

    def walk(node, path):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                found.append(path)
                assert float(np.abs(np.asarray(node["mean"])).max()) == 0.0, path
                assert float(np.abs(np.asarray(node["var"])).max()) == 0.0, path
            for k, v in node.items():
                walk(v, f"{path}/{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")

    walk(jax.device_get(grads), "")
    assert found, "no BN stat leaves found — tiny config should have BN"
