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

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, overriding JAX_PLATFORMS. PROCYON_PLATFORM restores user control
# (e.g. PROCYON_PLATFORM=cpu for CLI smoke runs off the TPU tunnel).
import os as _os

if _os.environ.get("PROCYON_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["PROCYON_PLATFORM"])
    except Exception:
        pass
