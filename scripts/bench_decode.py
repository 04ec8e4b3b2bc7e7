"""Decode throughput benchmark: output tokens/sec/chip.

The second tracked metric (BASELINE.md): bulk caption decode on a Llama-
architecture decoder. Uses two-point timing over different generation
lengths, which cancels both the prefill cost and the tunnel RTT.

The default model is a ~0.9B-param Llama-3-style decoder (GQA 16/8 heads,
dim 2048, 16 layers) sized so weights + KV cache fit one v5e chip in bf16.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--prompt_len", type=int, default=256)
    p.add_argument("--gen_small", type=int, default=32)
    p.add_argument("--gen_big", type=int, default=96)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--quant", action="store_true",
                   help="int8 weight-only quantization (ops/quant.py)")
    p.add_argument("--bits", type=int, default=8, choices=(4, 8),
                   help="weight quantization width (4 = packed int4)")
    p.add_argument("--quality", action="store_true", default=True,
                   help="run the quantization quality probe (logit cosine "
                        "+ CE delta vs bf16) and gate the result")
    p.add_argument("--no-quality", dest="quality", action="store_false")
    p.add_argument("--paged", action="store_true",
                   help="decode on the paged KV pool (the production "
                        "serving path, inference/serving.py) instead of "
                        "the dense per-request cache — the dense path "
                        "pays two full-cache copies per step (donation "
                        "misses, profiled 1.2 ms at 6B) that the pool's "
                        "in-place page writes avoid")
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--kv8", action="store_true",
                   help="int8 KV pool (per-token-per-head scales): halves "
                        "pool memory and decode gather traffic "
                        "(kv_pool.quantize_kv; paged only)")
    args = p.parse_args()
    if args.kv8 and not args.paged:
        p.error("--kv8 requires --paged (the dense cache has no "
                "quantized variant)")
    if args.dim < 128 or args.dim % 128:
        p.error(f"--dim must be a multiple of 128 (head_dim=128), "
                f"got {args.dim}")

    import jax
    import jax.numpy as jnp

    from procyon_tpu.inference import generation
    from procyon_tpu.models import llama, unified

    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(
            vocab_size=32000, dim=args.dim, n_layers=args.layers,
            n_heads=args.dim // 128, n_kv_heads=max(args.dim // 256, 1),
            intermediate=int(args.dim * 2.6875),
            max_seq_len=args.prompt_len + args.gen_big + 32,
            dtype=jnp.bfloat16),
        esm=None, protein_embed_dim=64, token_projector_layers=1,
        token_projector_hidden=64, retrieval_dim=64, dtype=jnp.bfloat16)
    wtag = "bf16"
    if args.quant:
        # materialize the int8 tree directly ON DEVICE from eval_shape: a
        # 7B bf16 init would OOM the 16GB chip before the int8 copy exists,
        # and shipping host-quantized weights over the tunnel is minutes.
        # Throughput doesn't depend on weight values.
        from procyon_tpu.models.llama import quantize_params

        def build():
            p = unified.init_params(jax.random.PRNGKey(0), cfg)
            p = dict(p)
            p["llama"] = quantize_params(p["llama"], cfg.llama,
                                         bits=args.bits)
            return p

        shapes = jax.eval_shape(build)
        n_params = sum(
            np.prod(x.shape) for x in jax.tree_util.tree_leaves(
                jax.eval_shape(
                    lambda: unified.init_params(jax.random.PRNGKey(0),
                                                cfg)["llama"])))

        @jax.jit
        def materialize():
            return jax.tree_util.tree_map(
                lambda sd: jnp.full(sd.shape, 1, sd.dtype)
                if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01,
                                                      sd.dtype), shapes)

        params = materialize()
        wtag = f"int{args.bits}"
    else:
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        n_params = sum(np.prod(x.shape)
                       for x in jax.tree_util.tree_leaves(params["llama"]))

    rng = np.random.default_rng(0)
    B, L = args.batch, args.prompt_len
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.full((B, L), -1, jnp.int32),
        "protein_embeds": jnp.zeros((1, 64), jnp.float32),
    }

    from procyon_tpu.models import llama as llama_mod

    # jit prefill + ONE decode step; loop steps in python (dispatches are
    # async, so a trailing scalar sync measures pure device time; the
    # while_loop whole-program compile is minutes over the remote tunnel)
    max_len = L + args.gen_big + 8

    if args.paged:
        # production serving decode (inference/serving.py hot loop): all
        # B slots prefilled into the page pool, then one paged_forward
        # token step with the pool donated — page writes are in place,
        # no per-step full-cache copies
        from procyon_tpu.inference import kv_pool

        n_pages_seq = -(-max_len // args.page_size)
        pcfg = kv_pool.PagedConfig(
            n_layers=cfg.llama.n_layers, n_kv_heads=cfg.llama.n_kv_heads,
            head_dim=cfg.llama.head_dim, page_size=args.page_size,
            n_pages=1 + B * n_pages_seq, max_pages_per_seq=n_pages_seq,
            slots=B, dtype=cfg.llama.dtype, quantize_kv=args.kv8)
        pt = np.zeros((B, n_pages_seq), np.int64)
        alloc = kv_pool.PageAllocator(pcfg)
        for s in range(B):
            pages = alloc.allocate(s, max_len)
            pt[s] = pages
        pool0_table = jnp.asarray(pt, jnp.int32)
        slots = jnp.arange(B, dtype=jnp.int32)

        @jax.jit
        def pprefill(params, pool, b):
            emb = unified.assemble_input_embeds(params, cfg, b)
            logits, pool = llama_mod.paged_forward(
                params["llama"], cfg.llama, pool, pcfg, slots,
                input_embeds=emb, seg_ids=b["seg_ids"])
            return jnp.argmax(logits[:, -1], -1), pool

        @functools.partial(jax.jit, donate_argnums=(2,))
        def pstep(params, tok, pool):
            logits, pool = llama_mod.paged_forward(
                params["llama"], cfg.llama, pool, pcfg, slots,
                tokens=tok[:, None])
            return jnp.argmax(logits[:, -1], -1), pool

        def run(n):
            pool = kv_pool.init_pool(pcfg)
            pool = {**pool, "page_table": pool0_table}
            tok, pool = pprefill(params, pool, batch)
            t0 = time.perf_counter()
            for _ in range(n):
                tok, pool = pstep(params, tok, pool)
            float(jnp.sum(tok))  # sync
            return time.perf_counter() - t0
    else:
        # params must be ARGUMENTS, not closure captures: captured arrays
        # embed as HLO constants and the remote-compile request body
        # explodes (HTTP 413 on the tunnel)
        @jax.jit
        def prefill(params, b):
            cache = llama_mod.init_kv_cache(cfg.llama, B, max_len=max_len)
            out = unified.forward(params, cfg, b, kv_cache=cache)
            nxt = jnp.argmax(out["logits"][:, -1], -1)
            return nxt, out["kv_cache"]

        seg_live = batch["seg_ids"][:, -1:]

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(params, tok, pos, cache):
            b = {
                "input_ids": tok[:, None],
                "seg_ids": seg_live,
                "positions": pos,
                "soft_map": jnp.full((B, 1), -1, jnp.int32),
                "protein_embeds": batch["protein_embeds"],
            }
            out = unified.forward(params, cfg, b, kv_cache=cache)
            return jnp.argmax(out["logits"][:, -1], -1), out["kv_cache"]

        def run(n):
            tok, cache = prefill(params, batch)
            pos = batch["positions"][:, -1:] + 1
            t0 = time.perf_counter()
            for _ in range(n):
                tok, cache = step(params, tok, pos, cache)
                pos = pos + 1
            float(jnp.sum(tok))  # sync
            return time.perf_counter() - t0

    run(2)  # compile + warm
    t_small = min(run(args.gen_small) for _ in range(2))
    t_big = min(run(args.gen_big) for _ in range(2))
    per_step = (t_big - t_small) / (args.gen_big - args.gen_small)
    toks_per_sec = args.batch / per_step
    result = {
        "metric": "decode_tokens_per_sec_chip",
        "value": round(toks_per_sec, 1),
        "unit": f"tok/s (B{args.batch}, ~{n_params/1e9:.1f}B params, "
                f"{wtag}{', paged' if args.paged else ''})",
        "per_step_ms": round(per_step * 1e3, 2),
        "backend": "paged" if args.paged else "dense",
        "kv_int8": bool(args.kv8 and args.paged),
    }
    # estimated-A100 denominator (VERDICT r4 #5): eager-fp16 decode at
    # the same batch shape, bandwidth-bound — see utils/baselines.py
    from procyon_tpu.utils.baselines import baseline_fields

    result.update(baseline_fields(float(n_params), args.batch,
                                  toks_per_sec))
    gate_failed = False
    if args.quality and args.quant:
        # measured quality gate (VERDICT r2 weak #1): every quantized
        # bench line carries logit-cosine + CE-delta vs bf16, loud on fail
        from procyon_tpu.evaluate.quant_quality import probe

        q = probe(args.bits, "dequant")
        result.update(q.as_dict())
        gate_failed = not q.passed
    from procyon_tpu.utils.timing import canary_fields

    result.update(canary_fields())  # chip-state probe (VERDICT r3 #4)
    print(json.dumps(result))
    if gate_failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
