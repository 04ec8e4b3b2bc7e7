"""Optimizer + LR schedules.

Equivalent of the reference's create_optimizer/create_scheduler
(procyon/training/trainIT.py:2148-2261, train_utils.py:1344-1495):
AdamW with beta=(0.9, 0.95), weight decay 1e-3, grad clip 1.0
(configs/deepspeed/full_train_ds.json) and per-module learning-rate groups
(TrainArgs.*_lr, training_args_IT.py:1270-1306).

The reference needs DeepSpeed's fused CUDA AdamW + CPU-Adam for offload;
optax.adamw under jit is fused by XLA and its state shards with the params.
"""

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    # per-module overrides; None -> use base lr
    protein_encoder_lr: Optional[float] = None
    text_encoder_lr: Optional[float] = None
    projector_lr: Optional[float] = None
    contrastive_lr: Optional[float] = None
    weight_decay: float = 1e-3
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 1.0
    warmup_steps: int = 1000
    total_steps: int = 100_000
    schedule: str = "cosine"  # cosine | linear | constant
    min_lr_ratio: float = 0.1


def make_schedule(cfg: OptimizerConfig, base_lr: float):
    warmup = optax.linear_schedule(0.0, base_lr, cfg.warmup_steps)
    decay_steps = max(cfg.total_steps - cfg.warmup_steps, 1)
    if cfg.schedule == "cosine":
        decay = optax.cosine_decay_schedule(
            base_lr, decay_steps, alpha=cfg.min_lr_ratio)
    elif cfg.schedule == "linear":
        decay = optax.linear_schedule(
            base_lr, base_lr * cfg.min_lr_ratio, decay_steps)
    elif cfg.schedule == "constant":
        decay = optax.constant_schedule(base_lr)
    else:
        raise ValueError(cfg.schedule)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def _group_of(path) -> str:
    """Map a param path to its LR group (trainIT.py:2148-2225 semantics)."""
    top = str(getattr(path[0], "key", path[0]))
    if top == "esm":
        return "protein_encoder"
    if top == "llama":
        return "text_encoder"
    if top == "projectors":
        return "projector"
    if top == "contrastive":
        return "contrastive"
    return "default"


def build_optimizer(cfg: OptimizerConfig, params):
    def lr_or_default(x):
        return cfg.lr if x is None else x

    group_lrs = {
        "protein_encoder": lr_or_default(cfg.protein_encoder_lr),
        "text_encoder": lr_or_default(cfg.text_encoder_lr),
        "projector": lr_or_default(cfg.projector_lr),
        "contrastive": lr_or_default(cfg.contrastive_lr),
        "default": cfg.lr,
    }

    def adamw_for(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(make_schedule(cfg, lr), b1=cfg.b1, b2=cfg.b2,
                        weight_decay=cfg.weight_decay),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(path), params)
    transforms = {g: adamw_for(lr) for g, lr in group_lrs.items()}
    return optax.multi_transform(transforms, labels)


def build_frozen_mask_optimizer(cfg: OptimizerConfig, params, frozen_fn):
    """Wrap build_optimizer with a freeze mask (the reference's freeze modes:
    freeze_protein_encoder / freeze_text_encoder, training_args_IT.py)."""
    inner = build_optimizer(cfg, params)
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen" if frozen_fn(path) else "train", params)
    return optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, mask)
