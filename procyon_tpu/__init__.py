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

# Persistent compilation cache: remote compiles over the axon tunnel cost
# 20 s-10+ min per jit variant; the disk cache serves repeat compiles across
# processes in <1 s (measured: scripts/probe_compile_cache.py). JAX keys
# entries by backend/version/HLO hash, so sharing one dir is safe. Opt out
# with PROCYON_COMPILE_CACHE=0; JAX_COMPILATION_CACHE_DIR overrides the
# location through JAX itself.
if _os.environ.get("PROCYON_COMPILE_CACHE", "1") != "0" and \
        not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax as _jax

    try:
        _cache_dir = _os.path.expanduser("~/.cache/procyon_jax_cache")
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
