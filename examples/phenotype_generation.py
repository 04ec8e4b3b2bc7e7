"""Phenotype caption generation demo — examples/phenotype_generation.ipynb
equivalent: diverse-beam caption generation for proteins.

    python examples/phenotype_generation.py
    python examples/phenotype_generation.py --checkpoint /path/to/model \
        --protein 123 --task uniprot_all_caption
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--protein", type=int, default=7)
    p.add_argument("--task", default="uniprot_all_caption")
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--beam_group_size", type=int, default=2)
    p.add_argument("--diversity_penalty", type=float, default=0.8)
    p.add_argument("--max_new_tokens", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from procyon_tpu.data import collators as C
    from procyon_tpu.data import datasets, instruct
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.inference import generation
    from procyon_tpu.inference.prompts import create_caption_input_simple
    from procyon_tpu.models import llama, unified

    if args.checkpoint:
        from procyon_tpu.models.checkpoint_io import load_model

        params, cfg, tokenizer = load_model(args.checkpoint)
        store = datasets.ProCyonDataStore()
    else:
        print("(no checkpoint given: synthetic demo model)")
        cfg = unified.UnifiedConfig(
            llama=llama.LlamaConfig(vocab_size=4096, dim=128, n_layers=2,
                                    n_heads=4, n_kv_heads=2,
                                    intermediate=256, max_seq_len=512,
                                    dtype=jnp.float32,
                                    attn_backend=None if
                                    jax.default_backend() == "tpu"
                                    else "ref"),
            esm=None, protein_embed_dim=64, token_projector_layers=2,
            token_projector_hidden=64, retrieval_dim=32, dtype=jnp.float32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = datasets.SyntheticStore(n_proteins=128, embed_dim=64)
        tokenizer = load_tokenizer(vocab_size=4096)
        args.max_new_tokens = min(args.max_new_tokens, 16)

    batch = create_caption_input_simple(
        args.task, args.protein, tokenizer=tokenizer, store=store,
        collator_cfg=C.CollatorConfig(
            protein_embed_dim=cfg.encoder_out_dim))
    dev = {k: jnp.asarray(v) for k, v in batch.items()
           if k != "reference_indices"}
    gen = generation.GenerationConfig(
        max_new_tokens=args.max_new_tokens, method="beam",
        beam_size=args.beam_size, beam_group_size=args.beam_group_size,
        diversity_penalty=args.diversity_penalty,
        eos_token_id=tokenizer.spec.eos_id,
        pad_token_id=tokenizer.spec.pad_id)
    tokens, scores = generation.generate_beam(params, cfg, dev, gen)
    tokens = np.asarray(tokens)[0]
    scores = np.asarray(scores)[0]
    print(f"\nprotein {args.protein}: top diverse-beam captions\n")
    for i in range(min(4, tokens.shape[0])):
        print(f"[{scores[i]:8.2f}] {tokenizer.decode(tokens[i])}")


if __name__ == "__main__":
    main()
