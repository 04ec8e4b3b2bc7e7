"""Task-banked LoRA (MoLoRA) as expert-indexed parameter banks.

Equivalent of the reference's mlora.py TaskSpcLoraLayer/MoLinear
(procyon/model/mlora.py:307-450): N parallel (A, B) low-rank pairs where the
active expert is selected *per task phase* (qa=0, retrieval=1, mlm/caption=2,
joint=3 — trainer cycling trainIT.py:795-931), plus the router machinery
(MoLoRATop1Router :157-262 with z-loss and load-balancing loss).

TPU-native: expert banks are a leading [E, ...] dim; the active expert is a
traced scalar index — `bank[idx]` is a gather, trivially jit-able, so there
is no module surgery like setting_lora_group (SURVEY.md §2.3 EP row).
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    num_experts: int = 1  # 1 = plain LoRA; >1 = task-banked MoLoRA
    dtype: Any = jnp.bfloat16

    @property
    def scaling(self):
        return self.alpha / self.rank


def init_params(key, cfg: LoRAConfig, in_dim, out_dim):
    """A ~ N(0, 1/r), B = 0 (standard LoRA init so the delta starts at 0)."""
    a = (jax.random.normal(key, (cfg.num_experts, in_dim, cfg.rank))
         / (in_dim ** 0.5)).astype(cfg.dtype)
    b = jnp.zeros((cfg.num_experts, cfg.rank, out_dim), cfg.dtype)
    return {"A": a, "B": b}


def apply(params, cfg: LoRAConfig, x, base_out, expert_idx=0):
    """base_out + scaling * (x @ A[e]) @ B[e]; expert_idx may be traced."""
    a = params["A"][expert_idx]
    b = params["B"][expert_idx]
    return base_out + cfg.scaling * ((x @ a) @ b)


def apply_routed(params, cfg: LoRAConfig, x, base_out, expert_onehot):
    """Per-ROW expert selection: base_out + s * (x @ A[e_b]) @ B[e_b] with
    a different expert per batch row (multi-tenant adapter serving — the
    reference can only switch adapters globally via module surgery,
    mlora.py set_lora_group; here different task adapters share one
    decode batch).

    TPU-native selection: instead of gathering per-row [in_dim, rank]
    weight slices (HBM gather traffic per layer per step), ALL E rank-r
    paths are computed — the rank-r matmul is ~r*E/out_dim ≈ 1% of the
    base matmul's FLOPs — and mixed with the one-hot [B, E], which XLA
    fuses into the tiny einsums. One-hot mixing is EXACT in any dtype
    (multiply by 1, add 0), so each row matches `apply(expert_idx=e_b)`.
    expert_onehot [B, E]."""
    oh = expert_onehot.astype(x.dtype)
    xa = jnp.einsum("btd,edr->betr", x, params["A"])
    xa = jnp.einsum("betr,be->btr", xa, oh)
    db = jnp.einsum("btr,ero->beto", xa, params["B"])
    delta = jnp.einsum("beto,be->bto", db, oh)
    return base_out + cfg.scaling * delta


def merged_delta(params, cfg: LoRAConfig):
    """Average-of-experts merge (mlora.py:417-431): mean_e A_e @ B_e * s."""
    deltas = jnp.einsum("eir,ero->eio", params["A"].astype(jnp.float32),
                        params["B"].astype(jnp.float32))
    return cfg.scaling * deltas.mean(0)


def top1_router_losses(router_logits, expert_assignment, num_experts):
    """Router auxiliary losses (mlora.py:50-75): z-loss and load-balance.

    router_logits [T, E]; expert_assignment [T] argmax assignments.
    """
    z = jax.nn.logsumexp(router_logits, axis=-1)
    z_loss = jnp.mean(z * z)
    probs = jax.nn.softmax(router_logits, axis=-1)
    density = jax.nn.one_hot(expert_assignment, num_experts).mean(0)
    density_proxy = probs.mean(0)
    balance_loss = num_experts * jnp.sum(density * density_proxy)
    return {"z_loss": z_loss, "balance_loss": balance_loss}
