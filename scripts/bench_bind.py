"""ProCyon-Bind throughput — tracked workload #4 (BASELINE.md: prot_pep +
drugdomain). The Bind inference pattern is peptide-binding QA: a prompt
carrying a peptide soft token scored yes/no at [ANSWER]
(peptide_all_qa.json; reference examples/training/procyon_peptide_tune.sh
trains it, ProCyonQAInference serves it).

Measures QA pairs/sec/chip on a flagship-shape decoder: one prefill
forward per batch of (peptide, receptor-text) pairs + the yes/no read at
the answer position. Prefill-shaped -> the W8A8 s8xs8 MXU path applies.

python scripts/bench_bind.py [--dim 4096 --layers 30 --batch 16
                              --prompt_len 256]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _canary():
    """Chip-state probe fields for the JSON line (VERDICT r3 weak #4)."""
    from procyon_tpu.utils.timing import canary_fields

    return canary_fields()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--layers", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--prompt_len", type=int, default=256)
    p.add_argument("--quant_mode", default="w8a8",
                   choices=("w8a8", "dequant"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.models import llama, unified
    from procyon_tpu.utils.timing import time_fn

    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(
            vocab_size=32000, dim=args.dim, n_layers=args.layers,
            n_heads=args.dim // 128, n_kv_heads=max(args.dim // 512, 1),
            intermediate=int(args.dim * 2.6875),
            max_seq_len=args.prompt_len, dtype=jnp.bfloat16,
            quant_mode=args.quant_mode),
        esm=None, protein_embed_dim=2560, token_projector_layers=3,
        token_projector_hidden=2560, retrieval_dim=1024,
        dtype=jnp.bfloat16)

    def build():
        p_ = dict(unified.init_params(jax.random.PRNGKey(0), cfg))
        p_["llama"] = llama.quantize_params(p_["llama"], cfg.llama)
        return p_

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(shapes["llama"]))

    B, L = args.batch, args.prompt_len
    rng = np.random.default_rng(0)
    # peptide QA batch shape: one peptide soft token per row (frozen
    # ESM2-3B peptide table, peptide_tune.yml:39), [ANSWER] at the tail
    soft_map = np.full((B, L), -1, np.int32)
    soft_map[:, 2] = np.arange(B) % 8
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 32000, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.asarray(soft_map),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((8, 2560)), jnp.float32),
    }
    answer_pos = jnp.full((B,), L - 1, jnp.int32)
    yes_id, no_id = 9, 10

    @jax.jit
    def qa_score(params, batch, answer_pos):
        out = unified.forward(params, cfg, batch)
        at = out["logits"][jnp.arange(B), answer_pos]
        two = at[:, jnp.asarray([yes_id, no_id])]
        return jax.nn.softmax(two, axis=-1)[:, 0]

    t = time_fn(lambda: qa_score(params, batch, answer_pos))
    print(json.dumps({
        "metric": "bind_qa_pairs_per_sec_chip",
        "value": round(B / t, 2),
        "unit": f"peptide-QA pairs/sec (L={L} prompt, "
                f"~{n_params/1e9:.1f}B decoder {args.quant_mode})",
        "per_batch_ms": round(t * 1e3, 2),
        **_canary(),
    }))


if __name__ == "__main__":
    main()
