"""Device mesh + GSPMD sharding. Replaces the reference's DeepSpeed/NCCL
process-group machinery (SURVEY.md §2.3): one `jax.sharding.Mesh` with
(data, fsdp, model) axes; XLA inserts all collectives."""

from procyon_tpu.parallel.mesh import create_mesh, MeshConfig
from procyon_tpu.parallel.sharding import (
    batch_sharding, param_shardings, replicate, shard_params,
)

__all__ = ["create_mesh", "MeshConfig", "batch_sharding", "param_shardings",
           "replicate", "shard_params"]
