"""Serving-throughput benchmark for the continuous batcher
(VERDICT r3 next #1 — the flagship serving redesign's missing number).

Workload: N mixed requests (token prompts + fused soft-token prompts, the
two admission paths of inference/serving.py) with STAGGERED arrivals into
one ContinuousBatcher. The drive loop submits per the arrival schedule
between serving rounds and measures wall-clock end to end, so the number
includes prefill, admission queueing, page recycling, and the per-round
host round trip (token ids only — sampling is on-device).

Reported (one JSON line):
  requests_per_sec  — completed requests / wall time
  output_tok_per_sec — generated tokens / wall time
  latency p50/p95   — submit->finish wall seconds per request
  slot_utilization  — mean live-slots/slots over rounds
  pool sizing       — n_pages under the fixed --pool_mb HBM budget
                      (--kv8 halves page bytes -> ~2x pages = the doubled
                      admission capacity, quantified here)

python scripts/bench_serving.py [--dim 4096 --layers 34 --slots 16
    --requests 48 --max_new 64 --step_quantum 8 --pool_mb 1024] [--kv8]
python scripts/bench_serving.py --synthetic      # CPU smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _canary():
    from procyon_tpu.utils.timing import canary_fields

    return canary_fields()


def build_model(args):
    import jax
    import jax.numpy as jnp

    from procyon_tpu.models import llama

    if args.synthetic:
        cfg = llama.tiny_config(attn_backend="ref", remat=False)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        return cfg, params, sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params))

    cfg = llama.LlamaConfig(
        vocab_size=32000, dim=args.dim, n_layers=args.layers,
        n_heads=args.dim // 128, n_kv_heads=max(args.dim // 512, 1),
        intermediate=int(args.dim * 2.6875),
        max_seq_len=args.max_prompt + args.max_new + 8,
        dtype=jnp.bfloat16)

    if args.ngram_period:
        # structured synthetic checkpoint (VERDICT r4 #3): greedy decode
        # is a designed deterministic token chain with a ~64-sigma top-1
        # margin — bit-stable across program shapes on bf16, so n-gram
        # speculative acceptance becomes measurable end to end. The
        # weight-streaming cost model is unchanged (same shapes/dtypes).
        from procyon_tpu.models import synthetic

        params, _ = synthetic.ngram_quantized_params(
            cfg, period=args.ngram_period)
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(params)
                       if x.dtype != jnp.float32)  # scales excluded
        return cfg, params, n_params

    # int8 tree straight from eval_shape (a 6B bf16 init would not fit
    # next to the pool). Weights must be VARIED, not constant: a
    # constant-weight model greedy-decodes the same token forever, which
    # makes every n-gram draft accept and fakes a perfect speculative
    # acceptance rate (observed: 7.875/8 "n-gram" acceptance on the
    # all-ones tree). Cheap per-leaf randint keeps greedy chaotic.
    def build():
        return llama.quantize_params(
            llama.init_params(jax.random.PRNGKey(0), cfg), cfg)

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        counter = [0]

        def fill(path, sd):
            counter[0] += 1
            name = jax.tree_util.keystr(path)
            key = jax.random.PRNGKey(counter[0])
            if sd.dtype == jnp.int8:
                return jax.random.randint(key, sd.shape, -8, 9,
                                          jnp.int32).astype(jnp.int8)
            if "norm" in name:
                return jnp.ones(sd.shape, sd.dtype)
            if "embed" in name:
                return (jax.random.normal(key, sd.shape, jnp.float32)
                        * 0.02).astype(sd.dtype)
            return jnp.full(sd.shape, 0.01, sd.dtype)   # quant scales

        return jax.tree_util.tree_map_with_path(fill, shapes)

    params = materialize()
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(shapes))
    return cfg, params, n_params


def make_workload(args, cfg, rng):
    """[(arrival_round, kind, prompt_len, payload)] — kind 'tok' or
    'fused'. Arrivals are uniform over the first --arrival_rounds rounds
    (a burst-then-drain profile exercises admission + recycling).

    --shared_prefix S prepends ONE S-token instruction prefix to every
    token prompt and one S-row embedding prefix to every fused prompt —
    the protein-serving shape (requests share the task's instruction
    template; only the protein + question tail differs), which is what
    --prefix_cache converts into skipped prefill + freed pool pages."""
    shared_tok = (list(rng.integers(4, cfg.vocab_size,
                                    args.shared_prefix))
                  if args.shared_prefix else [])
    shared_emb = (rng.standard_normal(
        (args.shared_prefix, cfg.dim)).astype(np.float32) * 0.02
        if args.shared_prefix else None)
    reqs = []
    for i in range(args.requests):
        plen = int(rng.integers(args.min_prompt, args.max_prompt + 1))
        arrival = int(rng.integers(0, args.arrival_rounds))
        # --short_gen G: EOS-heavy churn workload (VERDICT r4 #7) —
        # per-request generation lengths ~ U[1, G] (G = step_quantum
        # gives mean ~ K/2, the worst case for round-granularity waste)
        mn = (int(rng.integers(1, args.short_gen + 1))
              if args.short_gen else args.max_new)
        if i % 2 == 0:
            payload = shared_tok + list(
                rng.integers(4, cfg.vocab_size, plen))
            kind = "tok"
        else:
            # fused soft-token prompt: pre-assembled embeddings row
            tail = rng.standard_normal((plen, cfg.dim)).astype(
                np.float32) * 0.02
            payload = (np.concatenate([shared_emb, tail])
                       if shared_emb is not None else tail)
            kind = "fused"
        reqs.append((arrival, kind, plen + args.shared_prefix, payload,
                     mn))
    return sorted(reqs, key=lambda r: r[0])


def drive(batcher, workload, max_new, draft_for=None):
    """Submit per schedule between ticks; returns per-request latency,
    per-round utilization, wall seconds, generated-token count.
    draft_for: optional {workload index -> draft_fn} (oracle mode)."""
    submit_t = {}
    finish_t = {}
    seen_done = set()
    util = []
    pending = list(enumerate(workload))
    t0 = time.perf_counter()
    rounds = 0
    while pending or batcher.live or batcher.queue:
        while pending and pending[0][1][0] <= rounds:
            i, (_, kind, _, payload, mn) = pending.pop(0)
            dfn = draft_for.get(i) if draft_for else None
            if kind == "tok":
                rid = batcher.submit(payload, max_new=mn,
                                     draft_fn=dfn)
            else:
                rid = batcher.submit_fused(payload, max_new=mn,
                                           draft_fn=dfn)
            submit_t[rid] = time.perf_counter()
        batcher.tick()
        now = time.perf_counter()
        for rid in batcher.done:
            if rid not in seen_done:
                seen_done.add(rid)
                finish_t[rid] = now
        util.append(len(batcher.live) / batcher.pcfg.slots)
        rounds += 1
        assert rounds < 100000, "serving loop did not converge"
    wall = time.perf_counter() - t0
    lat = np.asarray([finish_t[r] - submit_t[r] for r in submit_t])
    n_tokens = sum(len(v) for v in batcher.done.values())
    return lat, np.asarray(util), wall, n_tokens, rounds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--layers", type=int, default=34)
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--requests", type=int, default=48)
    p.add_argument("--min_prompt", type=int, default=64)
    p.add_argument("--max_prompt", type=int, default=256)
    p.add_argument("--max_new", type=int, default=64)
    p.add_argument("--step_quantum", type=int, default=8,
                   help="tokens per jitted decode round (one host "
                        "readback per round)")
    p.add_argument("--arrival_rounds", type=int, default=12,
                   help="arrivals spread uniformly over this many rounds")
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--pool_mb", type=int, default=1024,
                   help="fixed KV-pool HBM budget; page count derives "
                        "from it, so --kv8 shows its capacity win")
    p.add_argument("--kv8", action="store_true",
                   help="int8 KV pool: half the bytes/page -> ~2x pages "
                        "under the same --pool_mb")
    p.add_argument("--spec_k", type=int, default=0,
                   help="self-speculative greedy decoding: K n-gram draft "
                        "tokens verified per forward (exact; replaces "
                        "step_quantum rounds)")
    p.add_argument("--spec_quantum", type=int, default=1,
                   help="R > 1: R device-drafted verify rounds per host "
                        "trip (one readback per R rounds; in-graph "
                        "n-gram drafting)")
    p.add_argument("--prefill_chunk", type=int, default=0,
                   help="chunked prefill: fixed [1, C] continuation "
                        "forwards instead of per-bucket jits (one "
                        "compile for all prompt lengths)")
    p.add_argument("--prefill_batch", type=int, default=1,
                   help="batched wave prefill: chunks of up to W "
                        "admissions share one [W, C] forward (needs "
                        "--prefill_chunk)")
    p.add_argument("--async_rounds", action="store_true",
                   help="pipelined decode rounds: dispatch round k+1 "
                        "from the device pending array before round k's "
                        "readback (greedy-exact)")
    p.add_argument("--prefix_cache", action="store_true",
                   help="automatic prefix caching: page-aligned prompt "
                        "blocks shared across requests by content hash "
                        "(skipped prefill + freed pool pages)")
    p.add_argument("--shared_prefix", type=int, default=0,
                   help="prepend one shared S-token instruction prefix "
                        "to every request (the workload prefix caching "
                        "exploits)")
    p.add_argument("--ngram_period", type=int, default=0,
                   help="structured synthetic checkpoint (models/"
                        "synthetic.py): greedy decode walks a designed "
                        "period-P token chain with a ~64-sigma top-1 "
                        "margin, so n-gram speculative acceptance is "
                        "measurable end to end (P models text "
                        "repetitiveness; P << max_new = boilerplate-heavy "
                        "captions, P >> max_new = unrepetitive text)")
    p.add_argument("--spec_oracle", action="store_true",
                   help="draft with an oracle built from a plain greedy "
                        "pass (upper bound: what spec_k buys at ~100%% "
                        "acceptance — real text sits between the n-gram "
                        "and oracle numbers)")
    p.add_argument("--short_gen", type=int, default=0,
                   help="EOS-heavy churn workload: per-request generation "
                        "lengths ~ U[1, G] instead of --max_new (G = "
                        "step_quantum gives mean ~ K/2, the worst case "
                        "for round-granularity waste — VERDICT r4 #7)")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="tiny CPU model smoke (also used by tests)")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   default=True)
    args = p.parse_args()

    if args.synthetic:
        os.environ.setdefault("PROCYON_PLATFORM", "cpu")
        args.dim, args.layers = 64, 2
        args.slots = 3
        args.requests = 8
        args.min_prompt, args.max_prompt = 4, 12
        args.max_new = 8
        args.step_quantum = 2
        args.arrival_rounds = 4
        args.page_size = 4
        args.pool_mb = 1

    import procyon_tpu  # noqa: F401  (platform/cache hooks)
    from procyon_tpu.inference import kv_pool, serving

    cfg, params, n_params = build_model(args)

    kv_bytes = 1 if args.kv8 else 2          # int8 vs bf16 per element
    kd = cfg.n_kv_heads * cfg.head_dim
    page_bytes = 2 * args.page_size * kd * kv_bytes   # k + v
    if args.kv8:
        page_bytes += 2 * args.page_size * cfg.n_kv_heads * 4  # f32 scales
    n_pages = max(int(args.pool_mb * 2 ** 20
                      / (page_bytes * cfg.n_layers)), 8)
    max_pages = -(-(args.max_prompt + args.shared_prefix + args.max_new
                    + args.step_quantum) // args.page_size)
    pcfg = kv_pool.PagedConfig(
        n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim, page_size=args.page_size, n_pages=n_pages,
        max_pages_per_seq=max_pages, slots=args.slots, dtype=cfg.dtype,
        quantize_kv=args.kv8)

    rng = np.random.default_rng(args.seed)
    batcher = serving.ContinuousBatcher(
        params, cfg, pcfg, temperature=args.temperature,
        step_quantum=args.step_quantum, seed=args.seed,
        spec_k=args.spec_k, spec_quantum=args.spec_quantum,
        prefill_chunk=args.prefill_chunk or None,
        prefix_cache=args.prefix_cache,
        prefill_batch=args.prefill_batch,
        async_rounds=args.async_rounds)
    workload = make_workload(args, cfg, rng)

    draft_for = None
    if args.spec_k and args.spec_oracle:
        # a SPEC-mode pass records each request's verify-program greedy
        # continuation; oracle drafts from it then accept in full — the
        # verify forward is causal, so an accepted prefix reproduces its
        # logits bit-exactly on re-run. (Drafting from a PLAIN T=1 pass
        # instead measured acceptance 1.07 on chip: with chaotic
        # random-weight logits the top-1 gap among 32k entries sits far
        # below bf16 cross-program noise, so the two forward shapes
        # argmax-diverge almost everywhere — same effect as the r3
        # dense-vs-paged beam-token divergence. Trained checkpoints have
        # peaked distributions and do not do this.)
        plain = serving.ContinuousBatcher(
            params, cfg, pcfg, temperature=0.0,
            step_quantum=args.step_quantum, seed=args.seed,
            spec_k=args.spec_k)
        drive(plain, workload, args.max_new)

        def mk_oracle(tokens_list, plen):
            def f(history, k, **kw):
                e = len(history) - plen
                return (tokens_list[e:e + k] + [0] * k)[:k]
            return f

        draft_for = {
            i: mk_oracle(plain.done[i],
                         len(w[3]) if w[1] == "tok" else 0)
            for i, w in enumerate(workload)}
        del plain

    if args.warmup:
        # compile every prefill bucket + the decode round, then reset
        drive(batcher, workload, args.max_new, draft_for)
        batcher.reset(seed=args.seed)
        batcher.spec_stats = {"rounds": 0, "emitted": 0}

    lat, util, wall, n_tokens, rounds = drive(batcher, workload,
                                              args.max_new, draft_for)
    assert len(batcher.done) == args.requests

    result = {
        "metric": "serving_requests_per_sec",
        "value": round(args.requests / wall, 3),
        "unit": f"requests/sec ({args.requests} mixed tok+fused reqs, "
                f"~{n_params/1e9:.1f}B int8 decoder, {args.slots} slots, "
                f"prompts {args.min_prompt}-{args.max_prompt}, "
                f"max_new {args.max_new}, quantum {args.step_quantum})",
        "output_tok_per_sec": round(n_tokens / wall, 1),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "slot_utilization": round(float(util.mean()), 3),
        "wall_s": round(wall, 2),
        "rounds": rounds,
        "n_tokens": n_tokens,
        "kv_int8": bool(args.kv8),
        "prefill_chunk": args.prefill_chunk,
        "prefill_batch": args.prefill_batch,
        "async_rounds": bool(args.async_rounds),
        "spec_k": args.spec_k,
        **({"spec_accept_per_round": round(
            batcher.spec_stats["emitted"]
            / max(batcher.spec_stats["rounds"], 1), 3),
            "spec_oracle": bool(args.spec_oracle),
            # measured serving-round time and the arithmetic all-accept
            # ceiling slots*(K+1)/round — the end-to-end ceiling is NOT
            # reachable on random weights on-chip: ~1/32k top-1 logit
            # gaps flip under ANY reduction reassociation (cached-row vs
            # in-chunk-row concat positions), so even self-consistent
            # oracle drafts mostly reject (measured acceptance 1.37).
            # Trained checkpoints have peaked logits; acceptance there is
            # a text-repetitiveness property, bounded by this ceiling.
            "spec_quantum": args.spec_quantum,
            "spec_round_ms": round(
                wall / max(rounds * args.spec_quantum, 1) * 1e3, 1),
            "spec_ceiling_tok_per_sec": round(
                args.slots * (args.spec_k + 1)
                * max(rounds * args.spec_quantum, 1) / wall, 1)}
           if args.spec_k else {}),
        **({"prefix_cache": True,
            "shared_prefix": args.shared_prefix,
            "prefix_hit_tokens": batcher.pcache.stats["hit_tokens"],
            "prefix_hit_rate": round(
                batcher.pcache.stats["hit_tokens"]
                / max(batcher.pcache.stats["hit_tokens"]
                      + batcher.pcache.stats["miss_tokens"], 1), 3),
            "prefix_pages_evicted": batcher.pcache.stats["evicted"]}
           if args.prefix_cache else
           {"shared_prefix": args.shared_prefix}
           if args.shared_prefix else {}),
        # round-granularity waste, measured (VERDICT r4 #7): fraction of
        # decode positions the device computed whose tokens were
        # discarded host-side (mid-round EOS/max_new surplus; async adds
        # one garbage round per finish; spec trips add post-finish verify
        # blocks). Bound per finish: K-1 sync, 2K-1 async.
        "short_gen": args.short_gen,
        "waste_dropped_tokens": batcher.waste["dropped"],
        "waste_fraction": round(
            batcher.waste["dropped"]
            / max(batcher.waste["emitted"] + batcher.waste["dropped"], 1),
            4),
        "pool_mb_budget": args.pool_mb,
        "n_pages": n_pages,
        "concurrency_capacity_tokens": (n_pages - 1) * args.page_size,
        **_canary(),
    }
    if not args.synthetic:
        # estimated-A100 denominator for the tokens/sec/chip north star
        # (VERDICT r4 #5): A100 eager-fp16 decode at the same slot count,
        # plus the reference's actual one-request-per-forward stack
        from procyon_tpu.utils.baselines import baseline_fields

        result.update(baseline_fields(n_params, args.slots,
                                      n_tokens / wall, serving=True))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
