"""Autoregressive generation under jit.

Equivalent of UnifiedProCyon.generate (model_unified.py:923-1027):
  * greedy / temperature / nucleus sampling (_generate_sampling :860,
    nucleus mask :844)
  * diverse (grouped) beam search with Hamming diversity penalty
    (_generate_beam_search :701, penalty :807-813)
  * left-padded ragged prompts (:1276-1291) via segment ids + positions
  * EOS early stop (:833)

TPU-native: the whole decode loop is a `lax.while_loop` over a static-length
KV cache; beam reordering is a gather on the cache (model_unified.py:830-832
does in-place python indexing); the diversity penalty's token-count is a
one-hot matmul instead of bincount.

The prompt prefill and per-token decode share the model's cache-aware
forward; prompts are left-padded by the caller (prompt builder) so all rows
decode in lockstep.
"""

import dataclasses

import jax
import jax.numpy as jnp

from procyon_tpu.models import llama, unified


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 200
    eos_token_id: int = 2
    pad_token_id: int = 0
    method: str = "greedy"  # greedy | sample | nucleus | beam
    temperature: float = 1.0
    top_p: float = 0.9
    # diverse beam search (caption_bulk.py:121-132: beam 10, groups 2,
    # diversity 0.8)
    beam_size: int = 10
    beam_group_size: int = 2
    diversity_penalty: float = 0.8


def _nucleus_filter(logits, top_p):
    """Keep the smallest prefix of sorted probs with cumsum >= top_p
    (model_unified.py:844-858 semantics)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits < cutoff, -1e30, logits)


def _decode_fn(params, cfg, token, position, seg, cache):
    """One-token forward through the cache. token [B,1]."""
    batch = {
        "input_ids": token,
        "seg_ids": seg,
        "positions": position,
        "soft_map": jnp.full_like(token, -1),
        "protein_embeds": jnp.zeros((1, cfg.encoder_out_dim), jnp.float32),
    }
    out = unified.forward(params, cfg, batch, kv_cache=cache)
    return out["logits"][:, -1], out["kv_cache"]


def generate(params, cfg: unified.UnifiedConfig, batch,
             gen: GenerationConfig, rng=None):
    """Generate continuations for a prompt batch (sampling/greedy/nucleus).

    batch: the canonical model-input batch (left-padded prompts); must
    contain prompt_len [B] (count of valid prompt tokens) implied by seg_ids.
    Returns tokens [B, max_new_tokens] (pad after EOS).
    """
    B, L = batch["input_ids"].shape
    max_len = L + gen.max_new_tokens
    cache = llama.init_kv_cache(cfg.llama, B, max_len=max_len)

    # prefill
    out = unified.forward(params, cfg, batch, kv_cache=cache)
    cache = out["kv_cache"]
    # last valid position per row (left-padded: it's position L-1)
    last_logits = out["logits"][:, -1]  # [B, V]
    next_pos = batch["positions"][:, -1:] + 1

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def sample_token(logits, key):
        if gen.method == "greedy" or gen.method == "beam":
            return jnp.argmax(logits, -1)
        logits = logits / jnp.maximum(gen.temperature, 1e-5)
        if gen.method == "nucleus":
            logits = _nucleus_filter(logits, gen.top_p)
        return jax.random.categorical(key, logits, -1)

    seg_live = batch["seg_ids"][:, -1:]  # continue the prompt's segment

    def body(state):
        t, tokens, cache, logits, pos, done, key = state
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub)  # [B]
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        tokens = tokens.at[:, t].set(nxt)
        done = done | (nxt == gen.eos_token_id)
        new_logits, cache = _decode_fn(
            params, cfg, nxt[:, None], pos, seg_live, cache)
        return t + 1, tokens, cache, new_logits, pos + 1, done, key

    def cond(state):
        t, _, _, _, _, done, _ = state
        return (t < gen.max_new_tokens) & ~jnp.all(done)

    tokens0 = jnp.full((B, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    state = (0, tokens0, cache, last_logits, next_pos, done0, rng)
    _, tokens, _, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens


# ---------------------------------------------------------------------------
# Diverse beam search
# ---------------------------------------------------------------------------


def beam_init(params, cfg: unified.UnifiedConfig, batch,
              gen: GenerationConfig):
    """Prefill + beam-state init for diverse beam search. Returns the state
    tuple `beam_step` consumes. Split out so serving/bench drivers can step
    the loop from the host (one jit variant, no fori_loop recompile per
    generation length over the remote tunnel)."""
    B, L = batch["input_ids"].shape
    beam = gen.beam_size
    n_groups = max(beam // gen.beam_group_size, 1)
    gsz = beam // n_groups
    max_len = L + gen.max_new_tokens

    def tile(x):
        return jnp.repeat(x, beam, axis=0)

    beam_batch = {k: tile(v) if hasattr(v, "ndim") and v.ndim >= 1
                  and v.shape[0] == B else v
                  for k, v in batch.items()
                  if k not in ("protein_embeds", "drug_embeds",
                               "struct_embeds")}
    for k in ("protein_embeds", "drug_embeds", "struct_embeds"):
        if k in batch and batch[k] is not None:
            beam_batch[k] = batch[k]

    cache = llama.init_kv_cache(cfg.llama, B * beam, max_len=max_len)
    out = unified.forward(params, cfg, beam_batch, kv_cache=cache)
    cache = out["kv_cache"]
    logits0 = jax.nn.log_softmax(out["logits"][:, -1].astype(jnp.float32))
    next_pos = beam_batch["positions"][:, -1:] + 1
    seg_live = beam_batch["seg_ids"][:, -1:]

    # scores [B, beam]; all beams identical at start -> only beam 0 of each
    # group is live to avoid duplicate hypotheses
    scores0 = jnp.where(
        (jnp.arange(beam) % gsz) == 0, 0.0, -1e30)
    scores0 = jnp.broadcast_to(scores0, (B, beam))
    tokens0 = jnp.full((B, beam, gen.max_new_tokens), gen.pad_token_id,
                       jnp.int32)
    done0 = jnp.zeros((B, beam), bool)
    return (tokens0, cache, logits0, next_pos, scores0, done0, seg_live)


def diverse_beam_select(logp, scores, done, gen: GenerationConfig):
    """Grouped diverse top-k selection (model_unified.py:769-858 semantics):
    per group g, pick tokens maximizing score + logprob - penalty *
    count(token chosen by groups < g this step). Finished beams are forced
    to continue with EOS at zero added score.

    logp [B, beam, V] log-softmax; scores/done [B, beam].
    Returns (new_tokens, new_parent, new_scores) each [B, beam]. Shared by
    the dense-cache and paged-pool beam decoders so both produce identical
    hypotheses."""
    B, beam, V = logp.shape
    n_groups = max(beam // gen.beam_group_size, 1)
    gsz = beam // n_groups
    new_tokens = jnp.zeros((B, beam), jnp.int32)
    new_parent = jnp.zeros((B, beam), jnp.int32)
    new_scores = jnp.zeros((B, beam), jnp.float32)
    used = jnp.zeros((B, V), jnp.float32)  # token counts from prior groups

    for g in range(n_groups):
        sl = slice(g * gsz, (g + 1) * gsz)
        g_scores = scores[:, sl]  # [B, gsz]
        g_logp = logp[:, sl]      # [B, gsz, V]
        g_done = done[:, sl]
        # finished beams: force EOS continuation with zero added score
        cont = jnp.where(g_done[..., None], -1e30, g_logp)
        cont = cont.at[:, :, gen.eos_token_id].set(
            jnp.where(g_done, 0.0, cont[:, :, gen.eos_token_id]))
        penalized = cont - gen.diversity_penalty * used[:, None, :]
        total = g_scores[..., None] + penalized  # [B, gsz, V]
        flat = total.reshape(B, gsz * V)
        top_scores, top_idx = jax.lax.top_k(flat, gsz)
        parent = top_idx // V + g * gsz  # [B, gsz]
        token = top_idx % V
        new_tokens = new_tokens.at[:, sl].set(token)
        new_parent = new_parent.at[:, sl].set(parent)
        new_scores = new_scores.at[:, sl].set(top_scores)
        used = used + jax.nn.one_hot(token, V).sum(axis=1)
    return new_tokens, new_parent, new_scores


def beam_step(params, cfg: unified.UnifiedConfig, gen: GenerationConfig,
              state, t):
    """One diverse-beam decode step (model_unified.py:769-858): grouped
    top-k with Hamming diversity penalty, parent-gather cache reorder, one
    1-token forward. t may be a traced scalar."""
    tokens, cache, logp, pos, scores, done, seg_live = state
    B, beam = scores.shape
    V = cfg.llama.vocab_size
    new_tokens, new_parent, new_scores = diverse_beam_select(
        logp.reshape(B, beam, V), scores, done, gen)

    # reorder beam state by parent (gather over cache rows)
    flat_parent = (new_parent
                   + jnp.arange(B)[:, None] * beam).reshape(-1)
    tokens = tokens.reshape(B * beam, -1)[flat_parent].reshape(
        B, beam, -1)
    done = jnp.take_along_axis(done, new_parent, axis=1)
    tokens = tokens.at[:, :, t].set(
        jnp.where(done, gen.pad_token_id, new_tokens))
    done = done | (new_tokens == gen.eos_token_id)

    cache = {
        "k": cache["k"][:, flat_parent],
        "v": cache["v"][:, flat_parent],
        "seg": cache["seg"][flat_parent],
        "pos": cache["pos"][flat_parent],
        "length": cache["length"],
    }
    step_tok = jnp.where(done.reshape(-1), gen.pad_token_id,
                         new_tokens.reshape(-1))
    new_logits, cache = _decode_fn(
        params, cfg, step_tok[:, None], pos, seg_live, cache)
    logp_next = jax.nn.log_softmax(new_logits.astype(jnp.float32))
    return (tokens, cache, logp_next, pos + 1, new_scores, done, seg_live)


def generate_beam(params, cfg: unified.UnifiedConfig, batch,
                  gen: GenerationConfig):
    """Diverse (grouped) beam search (model_unified.py:701-858).

    Beams live as an expanded batch dim [B*beam]; per decode step each group
    g picks tokens maximizing logprob - diversity_penalty * count(token in
    groups < g at this step). Cache rows are gathered on reorder.
    Returns tokens [B, beam, max_new_tokens] ranked by final score.
    """
    state = beam_init(params, cfg, batch, gen)
    state = jax.lax.fori_loop(
        0, gen.max_new_tokens,
        lambda t, s: beam_step(params, cfg, gen, s, t), state)
    tokens, _, _, _, scores, _, _ = state
    order = jnp.argsort(-scores, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    return tokens, jnp.take_along_axis(scores, order, axis=1)
