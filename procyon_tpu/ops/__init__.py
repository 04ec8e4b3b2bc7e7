"""TPU kernels (Pallas) and their jnp reference implementations.

Replaces the reference stack's third-party native surfaces (SURVEY.md §2.3):
flash-attn CUDA kernels -> pallas flash attention; ATen eager attention in
ESM2 -> same kernel, bidirectional; fused soft-token injection replaces
procyon/model/model_unified.py:1135-1175's python scatter loop.
"""

from procyon_tpu.ops.flash_attention import flash_attention, mha_reference
from procyon_tpu.ops.norms import rms_norm, layer_norm
from procyon_tpu.ops.rotary import apply_rotary, rope_frequencies

__all__ = [
    "flash_attention",
    "mha_reference",
    "rms_norm",
    "layer_norm",
    "apply_rotary",
    "rope_frequencies",
]
