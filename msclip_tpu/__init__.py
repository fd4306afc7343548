"""msclip_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of MS-CLIP (Hxyou/MSCLIP, ECCV 2022).

Layer map:
  config/    YAML config tree (BASE inheritance, reference-key compatible)
  data/      CLIP BPE tokenizer, prompts, jit image preprocessing, datasets
  models/    functional JAX model zoo (shared-trunk MS-CLIP-S)
  ops/       Pallas TPU kernels (fused LN / attention / MLP) + XLA fallbacks
  parallel/  device mesh, shardings, global-batch & sharded InfoNCE
  train/     optimizer groups, LR schedules, train step, Orbax checkpoints
  utils/     logging, metrics, torch checkpoint conversion
"""

__version__ = "0.1.0"
