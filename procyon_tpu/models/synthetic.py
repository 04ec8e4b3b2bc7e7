"""Structured synthetic checkpoints with STABLE greedy decode.

Why this exists (VERDICT r4 #3): the container has no released ProCyon
checkpoint, and RANDOM-weight logits are chaotic — top-1 gaps among a
32k-entry vocab sit far below bf16 reduction noise, so any two compiled
program shapes argmax-diverge almost everywhere and speculative-decoding
acceptance is unmeasurable end to end. This module constructs weights
whose next-token distribution has a HUGE, designed top-1 margin, so
greedy decode is bit-stable across program shapes (T=1 decode, T=K+1
verify, prefill) on bf16 hardware, and the n-gram drafter's acceptance
becomes a measurable property of the TEXT STRUCTURE we choose rather
than of float noise.

Construction — an induced-bigram (Markov-chain) transformer:

  * the embedding table E is random (the standard init);
  * every transformer layer keeps random attn/MLP weights but its two
    RESIDUAL-WRITING projections (attn.wo, mlp.w_down) are ZERO, so the
    residual stream after L layers is exactly the input embedding while
    the forward still streams/computes every weight (the decode cost
    model — weight-streaming-bound — is unchanged);
  * lm_head column j is margin * normalize(E[g(j)]) with g = f^{-1} for
    a chosen permutation f, so after the final RMSNorm
        logit_j(token i) = margin * sqrt(D) * <ê_i, ê_{g(j)}>
    = margin*sqrt(D) at j = f(i) and ~margin * N(0, 1) elsewhere: a
    sqrt(D)-sigma top-1 margin (64 sigma at dim 4096), untouchable by
    bf16 noise or int8 weight quantization.

Greedy decode therefore walks the deterministic chain t -> f(t). With f
a permutation of period-`period` cycles, a generation revisits its own
trail after at most `period` tokens — from then on the slot-history
n-gram drafter (inference/speculative.py) predicts perfectly and
speculative acceptance ramps from 1/round (cold) to K+1/round (warm).
`period` is the text-repetitiveness dial: small periods model the
GO/UniProt boilerplate protein captions repeat heavily; period >>
max_new models unrepetitive text (acceptance floors at ~1).

The reference pins its output oracle to eager HF fp16 (README.md:61) and
ships no synthetic checkpoints; this is bench/validation infrastructure
with no reference counterpart.

Used by `scripts/bench_serving.py --ngram_period P` and the CPU tests
(tests/test_speculative.py) that pin the acceptance arithmetic.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.models import llama


def cycle_permutation(vocab_size: int, period: int) -> np.ndarray:
    """f [V]: blocks of `period` consecutive ids form cycles
    (i -> i+1, block end wraps to block start); the final short block
    wraps within itself."""
    f = np.arange(vocab_size, dtype=np.int64) + 1
    for lo in range(0, vocab_size, period):
        hi = min(lo + period, vocab_size)
        f[hi - 1] = lo
    return f


def ngram_quantized_params(cfg: llama.LlamaConfig, *, period: int = 16,
                           margin: float = None, seed: int = 0):
    """Quantized (int8 weight-only) param tree matching
    llama.quantize_params(llama.init_params(...)) leaf-for-leaf, built
    directly in quantized form on device (a 6B bf16 intermediate would
    not fit next to a serving pool).

    margin defaults to 16/sqrt(dim), giving top-1 logit ~16 against
    ~N(0, 0.25) off-chain logits at any dim. Returns (params, f) with f
    the induced next-token permutation [V] (numpy, for oracles/tests).
    """
    if margin is None:
        margin = 16.0 / float(np.sqrt(cfg.dim))
    f = cycle_permutation(cfg.vocab_size, period)
    g = np.empty_like(f)
    g[f] = np.arange(cfg.vocab_size, dtype=np.int64)   # g = f^-1

    shapes = jax.eval_shape(lambda: llama.quantize_params(
        llama.init_params(jax.random.PRNGKey(seed), cfg), cfg))

    @functools.partial(jax.jit, static_argnums=())
    def materialize(g_idx):
        key = jax.random.PRNGKey(seed)
        emb = jax.random.normal(key, (cfg.vocab_size, cfg.dim),
                                jnp.float32) * 0.02
        # lm_head [D, V] column j = margin * normalize(emb[g(j)]):
        # logits after RMSNorm land margin*sqrt(D) on the chain target
        w = emb[g_idx]                                   # [V, D]
        w = w * (margin / jnp.linalg.norm(w, axis=1, keepdims=True))
        w = w.T                                          # [D, V]
        amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        lm_head = {"q": jnp.clip(jnp.round(w / s), -127, 127)
                   .astype(jnp.int8), "s": s}

        counter = [0]

        def fill(path, sd):
            counter[0] += 1
            name = jax.tree_util.keystr(path)
            k = jax.random.fold_in(key, counter[0])
            if sd.dtype == jnp.int8:
                return jax.random.randint(k, sd.shape, -8, 9,
                                          jnp.int32).astype(jnp.int8)
            if "norm" in name:
                return jnp.ones(sd.shape, sd.dtype)
            # residual-writing projections are exact zeros (scale 0):
            # the stream stays the input embedding; everything still
            # streams from HBM at full width
            if "wo" in name or "w_down" in name:
                return jnp.zeros(sd.shape, sd.dtype)
            return jnp.full(sd.shape, 0.01, sd.dtype)    # quant scales

        layers = jax.tree_util.tree_map_with_path(fill, shapes["layers"])
        return {"embed": emb.astype(cfg.dtype), "layers": layers,
                "final_norm": jnp.ones((cfg.dim,), cfg.dtype),
                "lm_head": lm_head}

    return materialize(jnp.asarray(g)), f
