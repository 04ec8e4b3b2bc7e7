"""Jitted per-task train steps.

Equivalent of the reference's training_step/compute_loss family
(procyon/training/trainIT.py:977-1305): one step function per task family
(qa / retrieval / caption / mlm), each computing its weighted loss and
updating params. The host trainer interleaves them per global step with skip
frequencies (trainIT.py:335-380) — see trainer.py.

GSPMD notes: under jit over a mesh, the in-batch contrastive loss is global
automatically (the score matrix spans the globally sharded batch), so no
explicit all_gather/rank-offset code is needed; the shard_map+axis_name path
in models/contrastive.py remains for explicit-collective use.
"""

import dataclasses

import jax
import jax.numpy as jnp
import optax

from procyon_tpu.models import esm2, unified


@dataclasses.dataclass(frozen=True)
class TaskWeights:
    """Per-task loss weights (TrainArgs.*_loss_weight,
    training_args_IT.py:1204-1250)."""
    qa: float = 1.0
    retrieval: float = 1.0
    caption: float = 1.0
    mlm: float = 1.0


def _is_atomic(node) -> bool:
    """Quantized weight dicts ({"q","s"} / {"p","s",...}) are single
    leaves for freezing purposes."""
    from procyon_tpu.ops import quant

    return (not isinstance(node, dict) or quant.is_quantized(node)
            or quant.is_quantized4(node))


def partition_params(params, predicate):
    """Split a nested-dict param tree into (trainable, frozen) by path.

    predicate("llama/layers/lora_wq/A") -> True keeps that leaf trainable.
    The QLoRA surface (SURVEY.md §2.3 item 4: bitsandbytes NF4 base +
    bf16 LoRA via peft) maps to: quantized base weights frozen, LoRA banks
    + projectors + contrastive head trainable.
    """
    def walk(node, path):
        if _is_atomic(node):
            return (node, None) if predicate(path) else (None, node)
        t, f = {}, {}
        for k, v in node.items():
            tv, fv = walk(v, f"{path}/{k}" if path else k)
            if tv is not None:
                t[k] = tv
            if fv is not None:
                f[k] = fv
        return (t or None, f or None)

    t, f = walk(params, "")
    return t or {}, f or {}


def merge_params(trainable, frozen):
    """Inverse of partition_params (tree overlay)."""
    if trainable is None:
        return frozen
    if frozen is None:
        return trainable
    if _is_atomic(trainable) or _is_atomic(frozen):
        return trainable
    out = {}
    for k in set(trainable) | set(frozen):
        out[k] = merge_params(trainable.get(k), frozen.get(k))
    return out


def lora_trainable_predicate(path: str) -> bool:
    """The ProCyon-QLoRA recipe: LoRA expert banks, projectors, and the
    contrastive temperature train; the (quantized) towers stay frozen."""
    return ("lora" in path or path.startswith("projectors")
            or path.startswith("contrastive"))


def init_train_state(params, optimizer, trainable_predicate=None):
    if trainable_predicate is None:
        return {
            "params": params,
            "opt_state": optimizer.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
    trainable, frozen = partition_params(params, trainable_predicate)
    return {
        "params": trainable,
        "frozen": frozen,
        "opt_state": optimizer.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


def _apply_updates(state, grads, optimizer):
    updates, opt_state = optimizer.update(
        grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    new = {"params": params, "opt_state": opt_state,
           "step": state["step"] + 1}
    if "frozen" in state:
        new["frozen"] = state["frozen"]
    return new


def lm_loss_fn(params, cfg, batch, weight, lora_expert=0):
    out = unified.forward(params, cfg, batch, retrieval=False,
                          lora_expert=lora_expert)
    # optional per-batch loss rescale (CAPTION_TRAIN_WEIGHTS,
    # constants.py:682: per-dataset caption loss weights)
    batch_w = batch.get("loss_weight", 1.0)
    loss = out["lm_loss"] * weight * batch_w
    # token-level accuracy on supervised tokens
    logits = out["logits"][:, :-1]
    labels = batch["labels"][:, 1:]
    mask = labels != -100
    correct = (jnp.argmax(logits, -1) == labels) & mask
    acc = correct.sum() / jnp.maximum(mask.sum(), 1)
    ppl = jnp.exp(jnp.minimum(out["lm_loss"], 20.0))
    metrics = {"lm_loss": out["lm_loss"], "token_acc": acc, "ppl": ppl}
    if batch.get("qa_labels") is not None and \
            batch.get("answer_pos") is not None and \
            batch.get("yes_token") is not None:
        # train-time QA yes/no accuracy at the [ANSWER] position
        # (get_qa_metrics, train_utils.py:1120-1189)
        B = out["logits"].shape[0]
        at = out["logits"][jnp.arange(B), batch["answer_pos"]]
        yes_logit = at[:, batch["yes_token"]]
        no_logit = at[:, batch["no_token"]]
        pred_yes = yes_logit > no_logit
        qa_acc = (pred_yes == (batch["qa_labels"] > 0)).mean()
        metrics["qa_acc"] = qa_acc
    return loss, metrics


def retrieval_loss_fn(params, cfg, batch, weight, lora_expert=0):
    out = unified.forward(params, cfg, batch, retrieval=True,
                          lora_expert=lora_expert)
    loss = out["retrieval_loss"] * weight
    return loss, {"retrieval_loss": out["retrieval_loss"],
                  **out["retrieval_metrics"]}


def mlm_loss_fn(params, cfg, batch, weight, lora_expert=0):
    """ESM2 masked-LM loss (compute_mlm_loss, trainIT.py:1138-1193;
    get_mlm_loss, train_utils.py:884-938)."""
    logits = unified.protein_mlm_logits(params, cfg, batch["protein_tokens"],
                                        lora_expert=lora_expert)
    labels = batch["mlm_labels"]  # -100 = not masked
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    loss = nll.sum() / jnp.maximum(mask.sum(), 1)
    acc = ((jnp.argmax(logits, -1) == labels) & mask).sum() / jnp.maximum(
        mask.sum(), 1)
    return loss * weight, {"mlm_loss": loss, "mlm_acc": acc}


_LOSS_FNS = {
    "qa": lm_loss_fn,
    "caption": lm_loss_fn,
    "retrieval": retrieval_loss_fn,
    "mlm": mlm_loss_fn,
}

# task-indexed LoRA expert selection (the reference's manual expert cycling,
# trainIT.py:795-931: qa=0, retrieval=1, mlm/caption=2, joint=3)
TASK_LORA_EXPERT = {"qa": 0, "retrieval": 1, "caption": 2, "mlm": 2}


def lora_num_experts(cfg: unified.UnifiedConfig) -> int:
    """Bank size for expert cycling, over BOTH towers: the reference calls
    set_lora_group on the decoder AND set_prot_lora_group on the encoder
    with the same index (trainIT.py:795-931). Mismatched bank sizes clamp
    at each tower's own bound (JAX gather-clipping semantics)."""
    n = cfg.llama.lora.num_experts if cfg.llama.lora is not None else 1
    if cfg.esm is not None and cfg.esm.lora is not None:
        n = max(n, cfg.esm.lora.num_experts)
    return n


def make_train_step(cfg: unified.UnifiedConfig, optimizer, task: str,
                    weight: float = 1.0, donate: bool = True,
                    accumulation_steps: int = 1, frozen_base: bool = False):
    """Build a jittable train step for one task family.

    accumulation_steps > 1 enables micro-batching (the reference's
    DeepSpeed gradient accumulation, configs/deepspeed/full_train_ds.json):
    the step then takes a batch pytree whose leaves carry a leading [N, ...]
    micro-batch axis, scans the fwd/bwd over it (each micro-batch's
    activations are freed before the next — fixed memory), averages the
    grads, and applies ONE optimizer update.

    frozen_base=True is the QLoRA surface (the reference's bitsandbytes
    NF4 base + peft LoRA, esm.py:444-449 / pmc_llama.py:457-463): the state
    must come from init_train_state(..., trainable_predicate=...); grads
    flow only to the trainable subtree (the frozen — possibly int8/int4 —
    tower weights are non-differentiated constants).
    """
    loss_fn = _LOSS_FNS[task]
    n_experts = lora_num_experts(cfg)
    expert = TASK_LORA_EXPERT.get(task, 0) % max(n_experts, 1)

    if frozen_base:
        def grad_of(params, frozen, batch):
            return jax.value_and_grad(
                lambda p: loss_fn(merge_params(p, frozen), cfg, batch,
                                  weight, lora_expert=expert),
                has_aux=True)(params)
    else:
        def grad_of(params, _frozen, batch):
            return jax.value_and_grad(
                lambda p: loss_fn(p, cfg, batch, weight,
                                  lora_expert=expert),
                has_aux=True)(params)

    if accumulation_steps <= 1:
        def step(state, batch):
            (loss, metrics), grads = grad_of(state["params"],
                                             state.get("frozen"), batch)
            new_state = _apply_updates(state, grads, optimizer)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics
    else:
        def step(state, batches):
            params = state["params"]
            frozen = state.get("frozen")

            def micro(acc, batch):
                (loss, metrics), grads = grad_of(params, frozen, batch)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return acc, (loss, metrics)

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            acc, (losses, mstack) = jax.lax.scan(micro, zeros, batches)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / accumulation_steps).astype(p.dtype),
                acc, params)
            new_state = _apply_updates(state, grads, optimizer)
            metrics = {k: jnp.mean(v) for k, v in mstack.items()}
            metrics["loss"] = jnp.mean(losses)
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def stack_microbatches(batches):
    """Host-side: list of collator batches -> one pytree with a leading
    micro-batch axis for the accumulating train step. reference_indices
    (host bookkeeping) is dropped."""
    import numpy as np

    keys = [k for k in batches[0] if k != "reference_indices"]
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in keys}


def make_eval_step(cfg: unified.UnifiedConfig, task: str):
    loss_fn = _LOSS_FNS[task]

    def step(params, batch):
        loss, metrics = loss_fn(params, cfg, batch, 1.0)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return jax.jit(step)


def encode_proteins_with_mlm_mask(key, protein_tokens, *, mask_prob=0.15):
    """BERT-style residue masking (ProteinMLMCollator._mask_tokens,
    procyon/data/data_collator.py:113-174): of the selected 15%,
    80% -> <mask>, 10% -> random residue, 10% unchanged.

    Returns (masked_tokens, labels with -100 on unselected positions).
    Host-side equivalents live in the collators; this jnp version serves
    on-device augmentation.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    special = (protein_tokens == esm2.PAD_IDX) | \
              (protein_tokens == esm2.CLS_IDX) | \
              (protein_tokens == esm2.EOS_IDX)
    sel = jax.random.bernoulli(k1, mask_prob, protein_tokens.shape) & ~special
    labels = jnp.where(sel, protein_tokens, -100)
    r = jax.random.uniform(k2, protein_tokens.shape)
    masked = jnp.where(sel & (r < 0.8), esm2.MASK_IDX, protein_tokens)
    random_tok = jax.random.randint(k3, protein_tokens.shape, 4, 24)
    masked = jnp.where(sel & (r >= 0.8) & (r < 0.9), random_tok, masked)
    return masked, labels
