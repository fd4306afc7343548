"""Measure the GradCache activation-memory claim (TPU.ACCUM_STEPS).

Compiles the train step at full b32-yfcc-msclips geometry with
ACCUM_STEPS 1 vs N and reports XLA's own `memory_analysis()` temp-buffer
bytes — the activation working set. If the scan didn't actually bound
liveness to one microbatch, the temp numbers would show it.

    python experiments/gradcache_memory.py [batch] [accum...]
    # default: batch 64, accum 1 2 4 8, single CPU device
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msclip_tpu.config import get_default_config, update_config
from msclip_tpu.models import MSClipModel, spec_from_config
from msclip_tpu.train.optim import build_optimizer
from msclip_tpu.train.trainer import init_train_state, make_step_core


def main():
    args = [int(a) for a in sys.argv[1:]]
    batch = args[0] if args else 64
    accums = args[1:] or [1, 2, 4, 8]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_config()
    update_config(cfg, os.path.join(root,
                                    "experiments/model/b32-yfcc-msclips.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_PALLAS = False
    cfg.TRAIN.LR = 1e-3
    spec = spec_from_config(cfg)
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, params, spec, steps_per_epoch=100)
    state = init_train_state(model, tx, params=params)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (batch, spec.image_resolution, spec.image_resolution, 3)
    ).astype(np.float32))
    tokens = jnp.zeros((batch, spec.context_length), jnp.int32)
    tokens = tokens.at[:, 0].set(spec.vocab_size - 2)
    tokens = tokens.at[:, 1].set(spec.vocab_size - 1)

    print(f"b32-yfcc-msclips geometry, batch {batch}, CPU compile")
    for a in accums:
        step = make_step_core(spec, tx, accum_steps=a)
        compiled = (
            jax.jit(step, donate_argnums=())
            .lower(state, images, tokens)
            .compile()
        )
        m = compiled.memory_analysis()
        print(
            f"ACCUM_STEPS={a}: temp {m.temp_size_in_bytes / 1e9:.2f} GB, "
            f"args {m.argument_size_in_bytes / 1e9:.2f} GB, "
            f"output {m.output_size_in_bytes / 1e9:.2f} GB"
        )


if __name__ == "__main__":
    main()
