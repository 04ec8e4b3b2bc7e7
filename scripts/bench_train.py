"""Training-step throughput benchmark: supervised tokens/sec/chip + MFU.

Default: the fusion model (QA LM step, AdamW, frozen-table protein mode
like ProCyon-Full) at a small shape.

--flagship: the ProCyon-Full-feasible one-chip recipe (VERDICT r2 next #4):
Llama-3-8B SHAPE decoder with an int8 (or --bits 4) frozen base + bf16
task-banked LoRA experts, S=2048, remat — the native QLoRA surface
(reference: bitsandbytes NF4 + peft, pmc_llama.py:457-514). Reports
tokens/sec AND model FLOPs utilization against the v5e bf16 peak.

python scripts/bench_train.py [--dim 1024 --layers 8 --batch 8 --seq 512]
python scripts/bench_train.py --flagship [--bits 8 --batch 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_BF16_PEAK = 197e12


def matmul_params(cfg):
    """Weight elements participating in matmuls (layers + lm_head)."""
    d, hd = cfg.dim, cfg.head_dim
    per_layer = (d * cfg.n_heads * hd            # wq
                 + 2 * d * cfg.n_kv_heads * hd   # wk, wv
                 + cfg.n_heads * hd * d          # wo
                 + 3 * d * cfg.intermediate)     # gate, up, down
    return cfg.n_layers * per_layer + d * cfg.vocab_size  # + lm_head


def train_flops_per_token(cfg, seq, *, frozen_base: bool, remat: bool):
    """Matmul-FLOPs accounting: fwd 2P; bwd dL/dx 2P always; dL/dW 2P only
    for trainable weights; remat recomputes the fwd (+2P). Attention adds
    2*2*S*d per token per layer, causal-halved, x(fwd + bwd + remat)."""
    P = matmul_params(cfg)
    factor = 2 + 2 + (0 if frozen_base else 2) + (2 if remat else 0)
    attn = 2 * seq * cfg.dim * cfg.n_layers  # 4*S*d halved for causality
    attn_factor = (1 + 1 + (1 if remat else 0))
    return factor * P + attn_factor * attn


def _canary():
    """Chip-state probe fields for the JSON line (VERDICT r3 weak #4)."""
    from procyon_tpu.utils.timing import canary_fields

    return canary_fields()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps_small", type=int, default=4)
    p.add_argument("--steps_big", type=int, default=12)
    p.add_argument("--flagship", action="store_true",
                   help="Llama-3-8B shape, int8/int4 frozen base + bf16 "
                        "LoRA experts, S=2048, remat")
    p.add_argument("--bits", type=int, default=8, choices=(4, 8))
    p.add_argument("--lora_rank", type=int, default=16)
    p.add_argument("--lora_experts", type=int, default=4)
    p.add_argument("--combined", action="store_true",
                   help="joint qa+retrieval combined step (the reference's "
                        "all-task phase) instead of the qa step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.models import llama, lora, unified
    from procyon_tpu.training import train_step as ts
    from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer

    if args.flagship:
        if args.batch == 8:
            args.batch = 2
        if args.seq == 512:
            args.seq = 2048
        lcfg = llama.llama3_8b(
            max_seq_len=args.seq, dtype=jnp.bfloat16, remat=True,
            lora=lora.LoRAConfig(rank=args.lora_rank,
                                 num_experts=args.lora_experts))
    else:
        lcfg = llama.LlamaConfig(
            vocab_size=32000, dim=args.dim, n_layers=args.layers,
            n_heads=args.dim // 128, n_kv_heads=max(args.dim // 256, 1),
            intermediate=int(args.dim * 2.6875), max_seq_len=args.seq,
            dtype=jnp.bfloat16)
    cfg = unified.UnifiedConfig(
        llama=lcfg,
        esm=None, protein_embed_dim=2560, token_projector_layers=3,
        token_projector_hidden=2560, retrieval_dim=1024,
        dtype=jnp.bfloat16)

    if args.flagship:
        # materialize the quantized frozen base directly on device (a bf16
        # 8B init would OOM the chip before the int8 copy exists);
        # throughput doesn't depend on weight values
        def build():
            p_ = unified.init_params(jax.random.PRNGKey(0), cfg)
            p_ = dict(p_)
            p_["llama"] = llama.quantize_params(p_["llama"], lcfg,
                                                bits=args.bits)
            return p_

        shapes = jax.eval_shape(build)

        @jax.jit
        def materialize():
            return jax.tree_util.tree_map(
                lambda sd: jnp.full(sd.shape, 1, sd.dtype)
                if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01,
                                                      sd.dtype), shapes)

        params = materialize()
        wtag = f"int{args.bits} frozen base + bf16 LoRA " \
               f"r{args.lora_rank}x{args.lora_experts}"
    else:
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        wtag = "bf16"
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        jax.eval_shape(lambda: llama.init_params(
            jax.random.PRNGKey(0), lcfg))))

    rng = np.random.default_rng(0)
    B, L, U = args.batch, args.seq, 8
    V = lcfg.vocab_size
    soft_map = np.full((B, L), -1, np.int32)
    soft_map[:, 2] = np.arange(B) % U
    labels = rng.integers(0, V, (B, L)).astype(np.int32)
    labels[:, : L // 2] = -100
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, V, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.asarray(soft_map),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((U, 2560)), jnp.float32),
        "labels": jnp.asarray(labels),
        "ret_pos": jnp.full((B,), L - 1, jnp.int32),
        "ret_target_pos": jnp.asarray((np.arange(B) % U).astype(np.int32)),
        "ret_valid": jnp.ones((B,), bool),
    }

    ocfg = OptimizerConfig(lr=1e-4, warmup_steps=10, total_steps=1000)
    task_tag = "qa step"
    if args.flagship:
        trainable, _ = ts.partition_params(params,
                                           ts.lora_trainable_predicate)
        optimizer = build_optimizer(ocfg, trainable)
        state = ts.init_train_state(
            params, optimizer,
            trainable_predicate=ts.lora_trainable_predicate)
        if args.combined:
            from procyon_tpu.training.combined_step import \
                make_combined_step

            step_fn = make_combined_step(cfg, optimizer, donate=True,
                                         expert_override=3,
                                         frozen_base=True)
            batches = {"qa": batch, "retrieval": batch}
            step = lambda s, b: step_fn(s, batches)  # noqa: E731
            task_tag = "joint qa+retrieval step"
        else:
            step = ts.make_train_step(cfg, optimizer, "qa", donate=True,
                                      frozen_base=True)
        n_trainable = sum(
            np.prod(x.shape)
            for x in jax.tree_util.tree_leaves(state["params"]))
    else:
        optimizer = build_optimizer(ocfg, params)
        state = ts.init_train_state(params, optimizer)
        step = ts.make_train_step(cfg, optimizer, "qa", donate=True)
        n_trainable = n_params

    def run(state, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, batch)
        float(m["loss"])  # sync
        return time.perf_counter() - t0, state

    _, state = run(state, 2)  # compile + warm
    t_small, state = run(state, args.steps_small)
    t_big, state = run(state, args.steps_big)
    per_step = (t_big - t_small) / (args.steps_big - args.steps_small)
    # a combined step runs two full fwd/bwd passes (qa + retrieval)
    n_passes = 2 if (args.flagship and args.combined) else 1
    tokens_per_step = args.batch * args.seq * n_passes
    flops_per_step = tokens_per_step * train_flops_per_token(
        lcfg, args.seq, frozen_base=args.flagship, remat=lcfg.remat)
    print(json.dumps({
        "metric": "train_tokens_per_sec_chip",
        "value": round(tokens_per_step / per_step, 1),
        "unit": f"tok/s ({task_tag}, B{args.batch} S{args.seq}, "
                f"~{n_params/1e9:.1f}B params, {wtag}, AdamW)",
        "per_step_ms": round(per_step * 1e3, 2),
        "mfu": round(flops_per_step / per_step / V5E_BF16_PEAK, 4),
        "model_flops_per_step": float(flops_per_step),
        "n_trainable_params": int(n_trainable),
        **_canary(),
    }))


if __name__ == "__main__":
    main()
