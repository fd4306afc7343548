"""Model summary + profiling + debug utilities.

TPU-native replacements for the reference's observability hooks
(SURVEY.md §5):

* ``model_summary``      — parameter counts per subtree + analytical FLOPs
  via jit cost analysis (replaces tensorwatch ``model_stats``,
  ``lib/utils/utils.py:82-104``).
* ``profile_trace``      — context manager around ``jax.profiler`` for
  xprof traces.
* ``debug_nans`` / ``deterministic`` — the ``TRAIN.DETECT_ANOMALY`` /
  ``CUDNN.DETERMINISTIC`` analogues.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import numpy as np


def param_tree_summary(params, depth: int = 2) -> Dict[str, int]:
    """Parameter counts grouped by path prefix."""
    counts: Dict[str, int] = {}

    def visit(path, leaf):
        keys = [str(p.key) if hasattr(p, "key") else str(p.idx)
                for p in path][:depth]
        prefix = "/".join(keys)
        counts[prefix] = counts.get(prefix, 0) + int(np.prod(leaf.shape))

    jax.tree_util.tree_map_with_path(visit, params)
    counts["TOTAL"] = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(params)
    )
    return counts


def flops_estimate(fn, *example_args) -> float:
    """Analytical FLOPs of a jitted function via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", -1.0)) if analysis else -1.0


def model_summary(model, params, image_size=224, context_length=77) -> str:
    """Printable summary: per-tower param counts + forward FLOPs (the
    rank-0 summary the reference dumped via tensorwatch)."""
    import jax.numpy as jnp

    counts = param_tree_summary(params)
    lines = ["Parameter counts:"]
    for k in sorted(counts):
        lines.append(f"  {k:40s} {counts[k]:>14,d}")

    try:
        images = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        img_flops = flops_estimate(
            lambda p, x: model.encode_image(p, x), params, images
        )
        lines.append(f"encode_image GFLOPs/img: {img_flops / 1e9:.2f}")
        tokens = jnp.zeros((1, context_length), jnp.int32)
        txt_flops = flops_estimate(
            lambda p, t: model.encode_text(p, t), params, tokens
        )
        lines.append(f"encode_text GFLOPs/seq: {txt_flops / 1e9:.2f}")
    except Exception as e:  # cost analysis is backend-dependent
        lines.append(f"(FLOPs analysis unavailable: {e})")
    return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/msclip_profile"):
    """Capture an xprof trace around a region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True):
    """NaN checking in every jit computation (TRAIN.DETECT_ANOMALY
    analogue)."""
    jax.config.update("jax_debug_nans", enable)


def deterministic(enable: bool = True):
    """Bit-deterministic reductions (CUDNN.DETERMINISTIC analogue)."""
    import os

    if enable:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_gpu_deterministic" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_tpu_enforce_deterministic_reductions=true"
            ).strip()
