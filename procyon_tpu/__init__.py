"""procyon_tpu — a TPU-native (JAX/XLA/Pallas) multimodal protein-phenotype
foundation-model framework with the capabilities of mims-harvard/ProCyon.

Layers (cf. SURVEY.md §1):
  ops/        Pallas TPU kernels + jnp reference implementations
  models/     ESM2 encoder, Llama decoder, projectors, contrastive, unified model
  parallel/   device mesh + GSPMD sharding rules (replaces DeepSpeed/NCCL)
  data/       datasets, collators, instruction templates, tokenizers
  training/   optax trainer, schedules, checkpointing (replaces trainIT.py)
  inference/  jit generation, retrieval service helpers
  evaluate/   benchmark framework (retrieval / QA / caption) + baselines
  app/        FastAPI serving
"""

__version__ = "0.1.0"
