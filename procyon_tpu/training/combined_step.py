"""Combined multi-task step: one optimizer update over the summed task
losses, exercising every trainable subsystem (ESM2 MLM + QA/caption LM +
retrieval contrastive). Mirrors one full global step of the reference's
interleaved loop (trainIT.py:449-622) as a single jitted function — used by
the multichip dry-run and as the fused-step training option.
"""

import jax
import optax

from procyon_tpu.models import unified
from procyon_tpu.training import train_step as ts


def make_combined_step(cfg: unified.UnifiedConfig, optimizer,
                       weights: ts.TaskWeights = ts.TaskWeights(),
                       donate: bool = True, expert_override=None,
                       frozen_base: bool = False):
    """expert_override: run EVERY task through this LoRA expert index —
    the reference's joint phase (trainIT.py:898-931 sets group 3 for the
    all-task step of lora_specific_training).

    frozen_base: QLoRA state layout (train_step.init_train_state with a
    trainable_predicate): only the trainable subtree differentiates; the
    (possibly int8/int4) frozen towers merge in as constants."""
    def step(state, batches):
        """batches: dict with optional keys qa / caption / retrieval / mlm."""

        n_experts = ts.lora_num_experts(cfg)

        def expert(task):
            if expert_override is not None:
                return expert_override % max(n_experts, 1)
            return ts.TASK_LORA_EXPERT.get(task, 0) % max(n_experts, 1)

        def lf(trainable):
            params = ts.merge_params(trainable, state.get("frozen")) \
                if frozen_base else trainable
            total = 0.0
            metrics = {}
            if "qa" in batches:
                l, m = ts.lm_loss_fn(params, cfg, batches["qa"], weights.qa,
                                     lora_expert=expert("qa"))
                total += l
                metrics.update({f"qa/{k}": v for k, v in m.items()})
            if "caption" in batches:
                l, m = ts.lm_loss_fn(params, cfg, batches["caption"],
                                     weights.caption,
                                     lora_expert=expert("caption"))
                total += l
                metrics.update({f"caption/{k}": v for k, v in m.items()})
            if "retrieval" in batches:
                l, m = ts.retrieval_loss_fn(params, cfg,
                                            batches["retrieval"],
                                            weights.retrieval,
                                            lora_expert=expert("retrieval"))
                total += l
                metrics.update({f"retrieval/{k}": v for k, v in m.items()})
            if "mlm" in batches and cfg.esm is not None:
                l, m = ts.mlm_loss_fn(params, cfg, batches["mlm"],
                                      weights.mlm)
                total += l
                metrics.update({f"mlm/{k}": v for k, v in m.items()})
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state["params"])
        new_state = ts._apply_updates(state, grads, optimizer)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
