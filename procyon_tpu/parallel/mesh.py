"""Mesh construction.

The reference builds NCCL process groups via torchrun + deepspeed.initialize
(run_pretrain.py:117, trainIT.py:196-201). Here the entire distributed setup
is one object: a Mesh over (data, fsdp, model) axes. ICI carries intra-slice
collectives; multi-slice DCN would map to an outer "data" axis.

  * data  — batch parallelism (DistributedSamplerResume's rank interleave)
  * fsdp  — parameter/optimizer sharding (ZeRO-2/3 equivalent)
  * model — tensor parallelism (heads / MLP hidden)
"""

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int):
        known = [d for d in (self.data, self.fsdp, self.model) if d != -1]
        prod = math.prod(known)
        missing = n_devices // max(prod, 1)
        dims = tuple(missing if d == -1 else d
                     for d in (self.data, self.fsdp, self.model))
        assert math.prod(dims) == n_devices, (
            f"mesh {dims} != {n_devices} devices")
        return dims


AXES = ("data", "fsdp", "model")


def create_mesh(cfg: Optional[MeshConfig] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig()
    dims = cfg.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, AXES)
