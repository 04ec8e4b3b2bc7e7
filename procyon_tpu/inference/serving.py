"""Continuous-batching decode server loop over the paged KV pool.

The reference serves one request per forward (procyon/app/main.py). This is
the TPU-serving redesign: a fixed number of decode slots share one page
pool; requests are admitted as slots and pages free up, every live slot
advances together through jitted decode rounds (one compilation for the
whole serving lifetime), and finished sequences release their pages
immediately.

TPU-first data movement:
  * sampling happens ON DEVICE (greedy argmax or temperature categorical
    inside the jit) — the host reads back int32 token ids, never the
    [slots, vocab] logit matrix (32 MB/step at Llama-3 vocab);
  * prefill returns the first sampled token the same way (the prompt's
    last-position logits are reduced on device);
  * `step_quantum` K > 1 runs K self-feeding decode steps as ONE jitted
    lax.scan round, reading back a [K, slots] token block per host round —
    amortizes the host<->device round trip K-fold. EOS/finish handling is
    host-side at round granularity: a slot that finishes mid-round wastes
    at most K-1 token-slots of compute (its extra writes land inside its
    own page allocation or on the null page — never on another slot's),
    and admission latency is bounded by one round.

Greedy or temperature sampling; prompts prefill through the same
`llama.paged_forward` in per-bucket-length jits.
"""

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.inference import kv_pool, speculative
from procyon_tpu.models import llama


@dataclasses.dataclass
class Request:
    rid: int
    prompt: List[int]
    max_new: int = 32
    eos_id: Optional[int] = None
    # fused (soft-token) prompt: pre-assembled input embeddings [T, dim]
    # override the token prompt at prefill (VERDICT r2 missing #3 — the
    # caption/retrieval workloads reach the paged pool through this)
    embeds: Optional[np.ndarray] = None
    # optional speculative draft proposer for THIS request,
    # (history, k) -> k draft tokens; None = the batcher's n-gram
    # proposer. Model-based drafters (or bench oracles) plug in here —
    # the verify math is draft-agnostic (exact for any proposal).
    draft_fn: Optional[object] = None
    # task-LoRA expert bank index for THIS request (multi-tenant adapter
    # serving): different task adapters share one decode batch via
    # lora.apply_routed's exact one-hot mixing. Ignored when the model
    # has no LoRA banks.
    lora_expert: int = 0


def _bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b


class ContinuousBatcher:
    def __init__(self, params, cfg, pcfg: kv_pool.PagedConfig, *,
                 temperature: float = 0.0, seed: int = 0,
                 step_quantum: int = 1, spec_k: int = 0,
                 spec_quantum: int = 1, mesh=None,
                 prefill_chunk: Optional[int] = None,
                 prefix_cache: bool = False,
                 prefill_batch: int = 1,
                 async_rounds: bool = False):
        if spec_k and temperature > 0 and int(spec_quantum) > 1:
            raise ValueError(
                "sampled speculative decoding is spec_quantum=1 only "
                "(the in-graph drafting trip is greedy; host-drafted "
                "rounds carry the rejection-sampling correction)")
        self.params = params
        self.cfg = cfg
        self.pcfg = pcfg
        # spec_k defaults OFF: measured on the induced-bigram checkpoint
        # (models/synthetic.py; STATUS R5.13), speculative decoding wins
        # only when the text repeats itself — period-16 chains reach
        # true n-gram acceptance 2.93/8 (> the 2.1/8 breakeven) and
        # spec_k=7 + spec_quantum=4 measured +32% req/s over plain
        # quantum-8, while unrepetitive text (period >> max_new) floors
        # at acceptance 1.0 = 0.60x plain. Enable it for boilerplate-
        # heavy workloads (GO/UniProt-style captions); leave it off for
        # free-form text. Exactness is draft-independent either way.
        self.spec_k = int(spec_k)
        # spec_quantum R > 1: R speculative verify rounds run as ONE
        # jitted lax.scan per host trip, drafting IN-GRAPH from a device
        # history buffer (speculative.device_ngram_draft) — amortizes the
        # per-round host round trip (profiled ~30 ms tunnel RTT vs 20 ms
        # device time per round at the 6.3B serving shape) exactly like
        # step_quantum does for plain decode. Per-request draft_fn only
        # applies at spec_quantum == 1 (host drafting).
        self.spec_quantum = max(int(spec_quantum), 1)
        # tensor-parallel serving: shard weights + the pool's flat-lane KD
        # axis over the mesh's `model` axis (each shard holds its kv
        # heads' lanes; the block-diagonal decode contraction runs over
        # the sharded axis, so GSPMD inserts the psum — cross-shard terms
        # are exact zeros, see tests/test_multichip.py TP paged decode).
        # Page/slot tables stay replicated: admission/finish updates are
        # tiny and every shard needs them for its gathers.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from procyon_tpu.parallel import shard_params

            self.params = shard_params(params, mesh)
            self._kd_sharding = NamedSharding(
                mesh, PartitionSpec(None, None, "model"))
            self._repl_sharding = NamedSharding(mesh, PartitionSpec())
        self.pool = self._init_pool()
        self.alloc = kv_pool.PageAllocator(pcfg)
        self.temperature = temperature
        self.key = jax.random.PRNGKey(seed)
        self.step_quantum = max(int(step_quantum), 1)
        # chunked prefill: every prompt runs as ceil(T/C) fixed-shape
        # [1, C] continuation forwards instead of one power-of-two
        # bucketed forward. ONE compiled program serves every prompt
        # length (vs a 20 s-10 min remote compile per bucket over this
        # runtime) and per-round prefill work is bounded by C. Short
        # prompts pad to C (wasted lanes); the crossover is measured in
        # bench_serving --prefill_chunk.
        self.prefill_chunk = prefill_chunk
        # batched wave prefill: chunks of up to W DIFFERENT admissions
        # share one [W, C] forward (per-row slot ids + seg masks — the
        # paged pool handles ragged continuation natively). A [1, C]
        # prefill leaves the MXU mostly idle at serving dims; batching
        # admission waves W-wide cuts the wave's prefill cost up to W-x.
        # Requires prefill_chunk (the fixed-shape program); rows beyond
        # the last real chunk pad with seg 0 onto a slot outside the
        # group (their writes land past that slot's seq_len: invisible,
        # overwritten by its own later writes).
        if prefill_batch > 1 and not prefill_chunk:
            raise ValueError("prefill_batch needs prefill_chunk")
        self.prefill_batch = min(max(int(prefill_batch), 1), pcfg.slots)
        # pipelined decode rounds: round k+1 is DISPATCHED before round
        # k's token block is read back, feeding from a device-resident
        # pending-token array — the per-round host readback (tunnel RTT
        # here; host dispatch latency on any deployment) overlaps the
        # next round's compute. Finishes are discovered one round late:
        # a finished slot wastes at most one extra K-token round of
        # garbage compute, whose writes stay past-seq_len/overwritten
        # (the same visibility invariant as mid-round EOS waste), and
        # its surplus tokens are dropped host-side. Greedy-exact
        # (tested == synchronous); temperature/spec modes keep their own
        # round batching (a garbage round would shift the RNG stream).
        if async_rounds and (temperature > 0 or spec_k):
            raise ValueError("async_rounds is greedy-plain-decode only")
        self.async_rounds = bool(async_rounds)
        self._inflight: List[tuple] = []
        self._pending_dev = jnp.zeros((pcfg.slots,), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def set_pending(pending, slot, tok):
            return pending.at[slot].set(tok)

        self._set_pending = set_pending
        # automatic prefix caching: full page-size blocks of every prompt
        # (token or fused) are content-addressed in a hash chain
        # (kv_pool.PrefixCache); admissions reuse the longest cached
        # chain as shared refcounted page-table entries — prefill skips
        # the shared region entirely and the shared pages cost no pool
        # budget. Zero-ref cached pages are evicted LRU when admission
        # needs them.
        self.pcache = (kv_pool.PrefixCache(pcfg.page_size)
                       if prefix_cache else None)
        self._slot_shared: Dict[int, List[int]] = {}
        self.queue: List[Request] = []
        self.live: Dict[int, dict] = {}          # slot -> state
        self.done: Dict[int, List[int]] = {}     # rid -> generated tokens
        self._next_rid = 0
        self._slot_ids = jnp.arange(pcfg.slots, dtype=jnp.int32)

        def sample(logits, key):
            # on-device sampling: the host never sees the logit matrix
            if temperature > 0:
                key, k2 = jax.random.split(key)
                nxt = jax.random.categorical(k2, logits / temperature,
                                             axis=-1)
            else:
                nxt = jnp.argmax(logits, axis=-1)
            return nxt.astype(jnp.int32), key

        self._sample_on_device = sample
        self._rounds: Dict[int, object] = {}
        self._prefills = {}

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def set_slot(page_table, seq_len, experts, slot, row, n, e):
            # async slot-table update: admission writes the allocated page
            # row, the slot's starting seq_len (0, or the shared-prefix
            # length on a prefix-cache hit) and its LoRA expert id;
            # finish writes the null row + 0. Replaces a host
            # read-modify-write of the pool tables (a BLOCKING
            # device->host sync per request over the remote runtime;
            # measured 134.7 -> see STATUS for the serving-throughput
            # delta when these syncs were removed).
            return (page_table.at[slot].set(row),
                    seq_len.at[slot].set(n),
                    experts.at[slot].set(e))

        self._set_slot = set_slot
        self._null_row = jnp.zeros((pcfg.max_pages_per_seq,), jnp.int32)
        # per-slot task-LoRA expert table (multi-tenant adapter serving;
        # unused by the jits when cfg.lora is None)
        self.experts = jnp.zeros((pcfg.slots,), jnp.int32)

        # device history for in-graph drafting (spec_quantum > 1): the
        # cap leaves room for one trip's worth of appends past max_ctx
        self._hist_cap = pcfg.max_ctx + self.spec_quantum * (spec_k + 1)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def set_hist(hist, hlen, slot, row, n):
            return hist.at[slot].set(row), hlen.at[slot].set(n)

        self._set_hist = set_hist
        self.hist = None
        self.hist_len = None
        if self.spec_k and self.spec_quantum > 1:
            self.hist = jnp.zeros((pcfg.slots, self._hist_cap), jnp.int32)
            self.hist_len = jnp.zeros((pcfg.slots,), jnp.int32)
        # speculative-decoding acceptance telemetry (benches report
        # emitted/rounds = mean tokens per weight stream)
        self.spec_stats = {"rounds": 0, "emitted": 0}
        # round-granularity waste telemetry (VERDICT r4 #7): `dropped`
        # counts decode positions the device computed whose tokens were
        # discarded host-side because the slot's request had already
        # finished — mid-round EOS/max_new surplus (<= K-1/finish, sync),
        # the one-round-late async garbage round (<= K more), and
        # post-finish spec-trip rounds (<= K+1 per remaining round).
        # Speculative REJECTION cost is a different category, derivable
        # as spec_stats rounds*(K+1) - emitted.
        self.waste = {"emitted": 0, "dropped": 0}

    def _spec_round_fn(self):
        """Jitted speculative verify round: ONE forward over [slots, K+1]
        token blocks (pending + K n-gram drafts), greedy argmax at every
        position, in-graph longest-accepted-prefix + seq_len REWIND so the
        rejected rows become invisible and are overwritten in place.
        Returns [slots, K+2]: K+1 greedy tokens || accepted count m — one
        host readback per round. Exact: emitted tokens are bit-identical
        to plain greedy decode (inference/speculative.py docstring;
        tested).

        temperature > 0 switches to the REJECTION-SAMPLING verify
        (Leviathan et al. 2023, specialized to a DETERMINISTIC proposer —
        the n-gram drafter and every draft_fn are point masses q = δ_d):
        draft d_{i+1} is accepted with probability p_i(d_{i+1}); at the
        first rejection the stop token is drawn from the residual
        max(0, p - q)/Z, which for a point mass is p_i renormalized over
        x != d_{i+1} (mask the draft token's logit, categorical); a fully
        accepted block draws a bonus token from p_K unmasked. The emitted
        marginal at every position is exactly p — acceptance*δ_d +
        (1 - p(d))*residual = p — so sampled spec is exact IN
        DISTRIBUTION (tested statistically); individual runs differ from
        plain decode because the RNG stream is consumed differently."""
        key = ("spec", self.spec_k, self.temperature > 0)
        fn = self._rounds.get(key)
        if fn is None:
            cfg, pcfg = self.cfg, self.pcfg
            slot_ids = self._slot_ids
            K = self.spec_k
            temp = self.temperature

            use_lora = cfg.lora is not None

            def verify_forward(params, pool, tokens, live, experts):
                seg = jnp.broadcast_to(live[:, None], tokens.shape)
                return llama.paged_forward(
                    params, cfg, pool, pcfg, slot_ids, tokens=tokens,
                    seg_ids=seg, lora_expert=experts if use_lora else 0)

            def rewind(pool, m, live):
                # paged_forward advanced live slots by K+1; pull back to
                # +m so positions holding rejected drafts sit past
                # seq_len (masked from attention, overwritten next round)
                return {**pool, "seq_len": pool["seq_len"].at[slot_ids]
                        .add(-(K + 1 - m) * live)}

            if temp > 0:
                @functools.partial(jax.jit, donate_argnums=(1,))
                def spec_round(params, pool, tokens, live, experts, rkey):
                    logits, pool = verify_forward(params, pool, tokens,
                                                  live, experts)
                    draft = tokens[:, 1:]                      # [S, K]
                    logp = jax.nn.log_softmax(logits / temp, axis=-1)
                    rkey, k_acc, k_res = jax.random.split(rkey, 3)
                    u = jax.random.uniform(k_acc, draft.shape)
                    p_draft = jnp.exp(jnp.take_along_axis(
                        logp[:, :K], draft[..., None], axis=-1)[..., 0])
                    acc = (u < p_draft).astype(jnp.int32)      # [S, K]
                    n_acc = jnp.cumprod(acc, axis=1).sum(
                        axis=1, dtype=jnp.int32)               # 0..K
                    m = 1 + n_acc
                    # residual/bonus sample at EVERY position (the stop
                    # position is data-dependent): positions 0..K-1 mask
                    # their draft token (residual of a point mass),
                    # position K samples p_K unmasked (bonus)
                    vocab = jnp.arange(logits.shape[-1],
                                       dtype=jnp.int32)
                    dpad = jnp.concatenate(
                        [draft, jnp.full((draft.shape[0], 1), -1,
                                         jnp.int32)], axis=1)
                    res_logits = jnp.where(
                        vocab[None, None] == dpad[:, :, None],
                        -jnp.inf, logits / temp)
                    res = jax.random.categorical(
                        k_res, res_logits, axis=-1).astype(jnp.int32)
                    stop = n_acc[:, None]
                    out = jnp.where(
                        jnp.arange(K + 1, dtype=jnp.int32)[None] < stop,
                        dpad,
                        jnp.take_along_axis(res, stop, axis=1))
                    pool = rewind(pool, m, live)
                    return pool, jnp.concatenate([out, m[:, None]],
                                                 axis=1), rkey
            else:
                @functools.partial(jax.jit, donate_argnums=(1,))
                def spec_round(params, pool, tokens, live, experts):
                    logits, pool = verify_forward(params, pool, tokens,
                                                  live, experts)
                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (tokens[:, 1:]
                             == greedy[:, :-1]).astype(jnp.int32)
                    m = 1 + jnp.cumprod(match, axis=1).sum(
                        axis=1, dtype=jnp.int32)
                    pool = rewind(pool, m, live)
                    return pool, jnp.concatenate([greedy, m[:, None]],
                                                 axis=1)

            fn = self._rounds[key] = spec_round
        return fn

    def _spec_trip_fn(self):
        """Jitted R-round speculative trip: lax.scan over verify rounds
        with IN-GRAPH n-gram drafting from the device history buffer —
        one host readback ([R, slots, K+2]) per R rounds. Emitted tokens
        are identical to spec_quantum=1 up to the draft (which never
        changes tokens, only acceptance) — tested equal to plain greedy.
        Slots that finish mid-trip keep generating garbage for the rest
        of the trip (bounded waste, dropped host-side; their writes stay
        inside their own allocation or on the null page)."""
        key = ("spectrip", self.spec_k, self.spec_quantum)
        fn = self._rounds.get(key)
        if fn is None:
            cfg, pcfg = self.cfg, self.pcfg
            slot_ids = self._slot_ids
            K, R = self.spec_k, self.spec_quantum
            Hh = self._hist_cap

            use_lora = cfg.lora is not None

            @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
            def spec_trip(params, pool, hist, hlen, pending, live,
                          experts):
                rows = jnp.arange(pcfg.slots)

                def body(carry, _):
                    pool, hist, hlen, pending = carry
                    draft = speculative.device_ngram_draft(hist, hlen, K)
                    tokens = jnp.concatenate(
                        [pending[:, None], draft.astype(jnp.int32)],
                        axis=1)
                    seg = jnp.broadcast_to(live[:, None], tokens.shape)
                    logits, pool = llama.paged_forward(
                        params, cfg, pool, pcfg, slot_ids, tokens=tokens,
                        seg_ids=seg,
                        lora_expert=experts if use_lora else 0)
                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (tokens[:, 1:]
                             == greedy[:, :-1]).astype(jnp.int32)
                    m = 1 + jnp.cumprod(match, axis=1).sum(
                        axis=1, dtype=jnp.int32)
                    pool = {**pool,
                            "seq_len": pool["seq_len"].at[slot_ids]
                            .add(-(K + 1 - m) * live)}
                    pos = hlen[:, None] + jnp.arange(K + 1,
                                                     dtype=jnp.int32)[None]
                    valid = ((jnp.arange(K + 1)[None] < m[:, None])
                             & (live[:, None] > 0))
                    # invalid/overflow appends are sent out of bounds and
                    # dropped (mode="drop")
                    hist = hist.at[rows[:, None],
                                   jnp.where(valid, pos, Hh)].set(
                        greedy, mode="drop")
                    hlen = hlen + m * live
                    nxt = jnp.take_along_axis(
                        greedy, (m - 1)[:, None], axis=1)[:, 0]
                    pending = jnp.where(live > 0, nxt, pending)
                    out = jnp.concatenate([greedy, m[:, None]], axis=1)
                    return (pool, hist, hlen, pending), out

                carry, ys = jax.lax.scan(
                    body, (pool, hist, hlen, pending), None, length=R)
                return carry, ys

            fn = self._rounds[key] = spec_trip
        return fn

    def _decode_round_fn(self, k: int):
        """Jitted K-step decode round: self-feeding lax.scan over the pool,
        returning the [K, slots] sampled-token block (ONE host readback
        per round). The pool argument is DONATED in every serving jit
        (rounds, prefills, slot updates): self.pool is reassigned from
        the return value, and without donation XLA copies the full
        multi-hundred-MB k/v slabs before the in-place scatter
        (profiled: 2.6 ms/round of full-pool copies at the 6.3B
        serving shape)."""
        fn = self._rounds.get(k)
        if fn is None:
            cfg, pcfg = self.cfg, self.pcfg
            sample = self._sample_on_device
            slot_ids = self._slot_ids
            use_lora = cfg.lora is not None

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode_round(params, pool, tokens, seg, key, experts):
                def body(carry, _):
                    pool, toks, key = carry
                    logits, pool = llama.paged_forward(
                        params, cfg, pool, pcfg, slot_ids,
                        tokens=toks[:, None], seg_ids=seg[:, None],
                        lora_expert=experts if use_lora else 0)
                    nxt, key = sample(logits[:, -1], key)
                    return (pool, nxt, key), nxt

                (pool, nxt, key), ys = jax.lax.scan(
                    body, (pool, tokens, key), None, length=k)
                # nxt = the final carry tokens, returned as a DEVICE
                # array so async_rounds can feed the next round without
                # reading ys back
                return pool, nxt, ys, key

            fn = self._rounds[k] = decode_round
        return fn

    def _init_pool(self):
        pool = kv_pool.init_pool(self.pcfg)
        if self.mesh is not None:
            import jax as _jax
            kd = {"k", "v", "k_scale", "v_scale"}
            model_ax = self.mesh.shape.get("model", 1)
            can_split = {
                "k": self.pcfg.kv_dim % model_ax == 0,
                "v": self.pcfg.kv_dim % model_ax == 0,
                "k_scale": self.pcfg.n_kv_heads % model_ax == 0,
                "v_scale": self.pcfg.n_kv_heads % model_ax == 0,
            }
            pool = {
                name: _jax.device_put(
                    arr, self._kd_sharding
                    if name in kd and can_split[name]
                    else self._repl_sharding)
                for name, arr in pool.items()}
        return pool

    # -- public -------------------------------------------------------------
    def reset(self, seed: int = 0) -> None:
        """Clear all serving state (pool, allocator, queues) but KEEP the
        compiled prefill/decode functions — benches warm up the jits on a
        throwaway workload, reset, then measure steady state."""
        self.pool = self._init_pool()
        self.alloc = kv_pool.PageAllocator(self.pcfg)
        if self.pcache is not None:
            # the pool's pages were just zeroed: drop every cached chain
            self.pcache = kv_pool.PrefixCache(self.pcfg.page_size)
        self._slot_shared = {}
        self.experts = jnp.zeros((self.pcfg.slots,), jnp.int32)
        self._inflight = []
        self._pending_dev = jnp.zeros((self.pcfg.slots,), jnp.int32)
        if self.hist is not None:
            self.hist = jnp.zeros((self.pcfg.slots, self._hist_cap),
                                  jnp.int32)
            self.hist_len = jnp.zeros((self.pcfg.slots,), jnp.int32)
        self.key = jax.random.PRNGKey(seed)
        self.queue = []
        self.live = {}
        self.done = {}
        self.waste = {"emitted": 0, "dropped": 0}
        self.spec_stats = {"rounds": 0, "emitted": 0}
        self._next_rid = 0

    def submit(self, prompt: List[int], max_new: int = 32,
               eos_id: Optional[int] = None, draft_fn=None,
               lora_expert: int = 0) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.queue.append(Request(rid, list(prompt), max_new, eos_id,
                                  draft_fn=draft_fn,
                                  lora_expert=lora_expert))
        return rid

    def submit_fused(self, input_embeds, max_new: int = 32,
                     eos_id: Optional[int] = None, draft_fn=None,
                     lora_expert: int = 0) -> int:
        """Admit a soft-token (fusion) prompt: pre-assembled input
        embeddings [T, dim] (unified.assemble_input_embeds row, unpadded).
        Prefill rides llama.paged_forward(input_embeds=...)."""
        rid = self._next_rid
        self._next_rid += 1
        embeds = np.asarray(input_embeds)
        self.queue.append(Request(rid, [0] * embeds.shape[0], max_new,
                                  eos_id, embeds=embeds, draft_fn=draft_fn,
                                  lora_expert=lora_expert))
        return rid

    def submit_batch(self, params_unified, cfg_unified, batch,
                     max_new: int = 32,
                     eos_id: Optional[int] = None) -> List[int]:
        """Admit every row of a canonical collator batch (soft-token
        prompts). Rows are unpadded to their true lengths; the shared soft
        bank is assembled once for the batch."""
        import jax

        from procyon_tpu.models import unified

        assemble = jax.jit(
            lambda p, b: unified.assemble_input_embeds(p, cfg_unified, b))
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "reference_indices" and v is not None
               and not np.isscalar(v)}
        embeds = np.asarray(assemble(params_unified, dev), np.float32)
        seg = np.asarray(batch["seg_ids"])
        rids = []
        for r in range(embeds.shape[0]):
            rids.append(self.submit_fused(embeds[r, seg[r] > 0], max_new,
                                          eos_id))
        return rids

    def run(self) -> Dict[int, List[int]]:
        """Drive until every submitted request finishes; returns
        rid -> generated token list."""
        self._admit()
        while self.live or self._inflight:
            self.tick()
        return self.done

    def tick(self, k: Optional[int] = None) -> None:
        """One serving round: advance every live slot by up to k
        (default step_quantum) tokens in one jitted call, process
        finishes, admit queued requests. The bench/server drive loop —
        submit() between ticks = requests joining mid-flight.

        async_rounds: dispatch round k+1 from the device pending array,
        THEN read back round k (its readback overlaps k+1's compute);
        with nothing live, drain the backlog."""
        if self.async_rounds:
            if self.live:
                self._dispatch_round_async(k or self.step_quantum)
            while len(self._inflight) > (1 if self.live else 0):
                self._process_round_async()
        elif self.live:
            if self.spec_k and self.spec_quantum > 1:
                self._spec_trip()
            elif self.spec_k:
                self._spec_round()
            else:
                self._round(k or self.step_quantum)
        self._admit()

    def _dispatch_round_async(self, k: int) -> None:
        seg = np.zeros((self.pcfg.slots,), np.int32)
        for slot in self.live:
            seg[slot] = 1
        # snapshot slot->rid: by processing time a slot may have been
        # finished + re-admitted; its garbage tokens from THIS round must
        # not be attributed to the new request
        snap = {slot: st["req"].rid for slot, st in self.live.items()}
        (self.pool, self._pending_dev, ys,
         self.key) = self._decode_round_fn(k)(
            self.params, self.pool, self._pending_dev, jnp.asarray(seg),
            self.key, self.experts)
        self._inflight.append((ys, snap, k))

    def _process_round_async(self) -> None:
        ys, snap, k = self._inflight.pop(0)
        ys = np.asarray(ys)                       # the ONE blocking read
        for slot, rid in snap.items():
            st = self.live.get(slot)
            if st is None or st["req"].rid != rid:
                # finished a round ago: this whole round was garbage
                self.waste["dropped"] += k
                continue
            self._consume(slot, ys[:k, slot])

    # -- internals ----------------------------------------------------------
    def _free_slots(self):
        return [s for s in range(self.pcfg.slots) if s not in self.live]

    def _prefill_fn(self, T: int, fused: bool = False):
        key = (T, fused)
        if key not in self._prefills:
            cfg, pcfg = self.cfg, self.pcfg
            sample = self._sample_on_device
            use_lora = cfg.lora is not None

            if fused:
                @functools.partial(jax.jit, donate_argnums=(1,))
                def prefill(params, pool, embeds, seg, slot, plen, rkey,
                            expert):
                    logits, pool = llama.paged_forward(
                        params, cfg, pool, pcfg, slot,
                        input_embeds=embeds, seg_ids=seg,
                        lora_expert=expert if use_lora else 0)
                    first, rkey = sample(logits[0, plen - 1][None], rkey)
                    return first[0], pool, rkey
            else:
                @functools.partial(jax.jit, donate_argnums=(1,))
                def prefill(params, pool, tokens, seg, slot, plen, rkey,
                            expert):
                    logits, pool = llama.paged_forward(
                        params, cfg, pool, pcfg, slot, tokens=tokens,
                        seg_ids=seg,
                        lora_expert=expert if use_lora else 0)
                    first, rkey = sample(logits[0, plen - 1][None], rkey)
                    return first[0], pool, rkey

            self._prefills[key] = prefill
        return self._prefills[key]

    def _promote_blocks(self, slot, row, n_shared, keys):
        """Move a freshly-prefilled request's full blocks into the
        prefix cache (blocks n_shared..len(keys)-1 of its page row)."""
        for j in range(n_shared, len(keys)):
            page = int(row[j])
            if self.pcache.promote(keys[j], page):
                self.alloc.disown(slot, page)
                self._slot_shared.setdefault(slot, []).append(page)

    def _wave_prefill_fn(self, fused: bool, W: int):
        """Jitted [W, C] batched chunk prefill: W admissions' chunks in
        one forward (per-row slots/seg/valids), sampling each row's
        last-valid-position logits on device. W is bucketed to powers of
        two up to prefill_batch — staggered arrivals make many SMALL
        waves, and padding a 1-request wave to the full fixed W costs
        W x the needed compute (measured: fixed W=8 LOST 7.38 -> 4.66
        req/s end to end; bucketed widths keep the compile count at
        log2(W)+1 per prompt kind while small waves pay near-[1, C]
        cost)."""
        key = ("wave", W, fused)
        fn = self._prefills.get(key)
        if fn is None:
            cfg, pcfg = self.cfg, self.pcfg
            sample = self._sample_on_device
            use_lora = cfg.lora is not None

            @functools.partial(jax.jit, donate_argnums=(1,))
            def wave_prefill(params, pool, x, seg, slots, valids, rkey,
                             experts):
                kw = ({"input_embeds": x} if fused else {"tokens": x})
                logits, pool = llama.paged_forward(
                    params, cfg, pool, pcfg, slots, seg_ids=seg,
                    lora_expert=experts if use_lora else 0, **kw)
                last = logits[jnp.arange(W), valids - 1]      # [W, vocab]
                first, rkey = sample(last, rkey)
                return first, pool, rkey

            fn = self._prefills[key] = wave_prefill
        return fn

    def _dispatch_prefill_wave(self, items):
        """Batched-wave prefill of this admission wave's requests:
        `items` = [(slot, req, start)]. Token and fused prompts batch
        separately (different input kinds). Returns {slot: first-token
        device scalar}. Greedy outputs equal the [1, C] chunked path
        (same chunk boundaries per request — tested); under temperature
        sampling the RNG stream differs, like chunked vs bucketed."""
        C, Wmax = self.prefill_chunk, self.prefill_batch
        first = {}
        for fused in (False, True):
            queue = [[slot, req, start] for slot, req, start in items
                     if (req.embeds is not None) == fused]
            while queue:
                n = min(len(queue), Wmax)
                # bucket the program width to the next power of two (or
                # Wmax): small waves pay near-[1, C] cost instead of a
                # Wmax-wide padded forward
                W = 1 << (n - 1).bit_length()
                W = min(W, Wmax)
                group = queue[:min(n, W)]
                group_slots = {it[0] for it in group}
                pad_slot = next((s for s in range(self.pcfg.slots)
                                 if s not in group_slots), group[0][0])
                slots = np.full((W,), pad_slot, np.int32)
                seg = np.zeros((W, C), np.int32)
                valids = np.ones((W,), np.int32)
                experts = np.zeros((W,), np.int32)
                if fused:
                    x = np.zeros((W, C, self.cfg.dim), np.float32)
                else:
                    x = np.zeros((W, C), np.int32)
                for i, it in enumerate(group):
                    slot, req, pos = it
                    plen = len(req.prompt)
                    valid = min(C, plen - pos)
                    slots[i] = slot
                    seg[i, :valid] = 1
                    valids[i] = valid
                    experts[i] = req.lora_expert
                    if fused:
                        x[i, :valid] = req.embeds[pos:pos + valid]
                    else:
                        x[i, :valid] = req.prompt[pos:pos + valid]
                    it[2] = pos + valid
                xs = (jnp.asarray(x, self.cfg.dtype) if fused
                      else jnp.asarray(x))
                fw, self.pool, self.key = self._wave_prefill_fn(
                    fused, W)(
                    self.params, self.pool, xs, jnp.asarray(seg),
                    jnp.asarray(slots), jnp.asarray(valids), self.key,
                    jnp.asarray(experts))
                done_rows = [i for i, it in enumerate(group)
                             if it[2] >= len(it[1].prompt)]
                for i in done_rows:
                    first[group[i][0]] = fw[i]
                queue = [it for it in queue
                         if it[2] < len(it[1].prompt)]
        return first

    def _admit(self):
        # admissions happen in WAVES: every prefill of a wave is
        # dispatched before any result is read back, so the host pays one
        # device round trip per wave instead of one per request (over a
        # remote runtime, per-request syncs dominated admission cost —
        # measured 48 prefill syncs inside an 11.8 s serving run)
        batched = self.prefill_batch > 1
        while True:
            staged = []
            staged_slots = set()
            wave_items = []
            wave_promote = []

            def free():
                return [s for s in self._free_slots()
                        if s not in staged_slots]

            while self.queue and free():
                req = self.queue[0]
                budget = len(req.prompt) + req.max_new
                if budget > self.pcfg.max_ctx:
                    raise ValueError(
                        f"request {req.rid} needs {budget} tokens > "
                        f"max_ctx {self.pcfg.max_ctx}")
                shared, keys = [], []
                if self.pcache is not None:
                    # LoRA-expert routing changes the K/V bytes a prefill
                    # writes (lora_wk/lora_wv deltas ride the cached
                    # rows): fold the expert id into the digest domain so
                    # pages written under expert A never match expert B.
                    digests = kv_pool.PrefixCache.block_digests(
                        prompt=req.prompt if req.embeds is None else None,
                        embeds=req.embeds,
                        page_size=self.pcfg.page_size,
                        domain=(b"e%d:" % req.lora_expert
                                if self.cfg.lora is not None else b""))
                    shared, keys = self.pcache.match(digests)
                    if shared:
                        # pin the matched pages BEFORE admission-pressure
                        # eviction: their writer may have finished (ref 0),
                        # and evict() must not reclaim the very pages this
                        # admission is about to reuse
                        self.pcache.acquire(shared)
                if not self.alloc.can_admit(budget, reserved=len(shared)):
                    # reclaim idle cached pages before giving up
                    if self.pcache is not None:
                        short = (self.alloc.pages_for(budget)
                                 - len(shared) - len(self.alloc.free))
                        self.alloc.free.extend(self.pcache.evict(short))
                    if not self.alloc.can_admit(budget,
                                                reserved=len(shared)):
                        if shared:
                            self.pcache.release(shared)
                        break  # wait for pages
                self.queue.pop(0)
                slot = free()[0]
                staged_slots.add(slot)
                if shared:
                    self._slot_shared[slot] = list(shared)
                pages = self.alloc.allocate(slot, budget,
                                            reserved=len(shared))
                row = np.zeros((self.pcfg.max_pages_per_seq,), np.int32)
                row[:len(shared)] = shared
                row[len(shared):len(shared) + len(pages)] = pages
                start = len(shared) * self.pcfg.page_size
                pt, sl, self.experts = self._set_slot(
                    self.pool["page_table"], self.pool["seq_len"],
                    self.experts, jnp.int32(slot), jnp.asarray(row),
                    jnp.int32(start), jnp.int32(req.lora_expert))
                self.pool = {**self.pool, "page_table": pt, "seq_len": sl}

                if batched:
                    first = None
                    wave_items.append([slot, req, start])
                else:
                    first = self._dispatch_prefill(req, slot, start=start)
                if self.pcache is not None:
                    # promote the freshly-prefilled full blocks: their
                    # lifetime moves from the slot's release to the
                    # cache's refcount (this slot holds one reference).
                    # In batched-wave mode promotion is DEFERRED to the
                    # end of the wave: same-wave chunks interleave, so a
                    # same-wave hit could gather pages whose writes are
                    # not yet dispatched (sequential mode fully prefills
                    # each request before the next one's dispatch).
                    if batched:
                        wave_promote.append(
                            (slot, row, len(shared), keys))
                    else:
                        self._promote_blocks(slot, row, len(shared),
                                             keys)
                    # start <= plen-1 by construction (block_digests
                    # leaves the final prompt token to the private tail)
                    self.pcache.stats["hit_tokens"] += start
                    self.pcache.stats["miss_tokens"] += (
                        len(req.prompt) - start)
                # keep `first` on device; resolve the whole wave below
                staged.append((slot, req, first))
            if not staged:
                return
            if batched:
                by_slot = self._dispatch_prefill_wave(wave_items)
                staged = [(slot, req, by_slot[slot])
                          for slot, req, _ in staged]
                for slot, row, n_shared, keys in wave_promote:
                    self._promote_blocks(slot, row, n_shared, keys)
            firsts = np.asarray(jnp.stack([f for _, _, f in staged]))
            for (slot, req, _), tok in zip(staged, firsts):
                last = int(tok)
                # history feeds the n-gram draft proposer (spec_k > 0):
                # token prompts contribute their text, fused prompts only
                # their generations (their token ids are placeholders)
                hist = ([] if req.embeds is not None
                        else list(req.prompt)) + [last]
                self.live[slot] = {"req": req, "generated": [last],
                                   "pending": last, "history": hist}
                if self.async_rounds:
                    # seed the device pending array so the next round
                    # can be dispatched without a host round trip
                    self._pending_dev = self._set_pending(
                        self._pending_dev, jnp.int32(slot),
                        jnp.int32(last))
                if self.hist is not None:
                    row = np.zeros((self._hist_cap,), np.int32)
                    row[:len(hist)] = hist
                    self.hist, self.hist_len = self._set_hist(
                        self.hist, self.hist_len, jnp.int32(slot),
                        jnp.asarray(row), jnp.int32(len(hist)))
                self._maybe_finish(slot)
            # a request finishing AT prefill (max_new=1 / instant EOS)
            # frees its slot: loop for another wave

    def _dispatch_prefill(self, req: Request, slot: int, start: int = 0):
        """Dispatch a request's prefill (async — no host sync; the wave
        resolver reads the returned first-token array). Bucketed mode
        runs one power-of-two-length forward; chunked mode
        (prefill_chunk=C) runs ceil(T/C) fixed-shape [1, C] continuation
        forwards — one compiled program for every prompt length, per-
        round prefill work bounded by C. Chunk tails pad with seg 0:
        pad KV rows land past seq_len (invisible, overwritten by later
        writes). Mid chunks reuse the same jit and discard its sampled
        token, so under temperature sampling the RNG stream differs from
        bucketed mode (greedy outputs are identical — tested).

        `start` > 0 = prefix-cache hit: the slot's seq_len already sits
        at the shared-prefix boundary and the forward continues from
        there — only the tail [start, plen) is computed."""
        plen = len(req.prompt)
        fused = req.embeds is not None
        C = self.prefill_chunk
        chunks = ([(lo, min(plen - lo, C))
                   for lo in range(start, plen, C)] if C
                  else [(start, plen - start)])
        first = None
        for lo, valid in chunks:
            T = C if C else _bucket(plen - start)
            seg = np.zeros((1, T), np.int32)
            seg[0, :valid] = 1
            if fused:
                dim = req.embeds.shape[-1]
                emb = np.zeros((1, T, dim), np.float32)
                emb[0, :valid] = req.embeds[lo:lo + valid]
                x = jnp.asarray(emb, self.cfg.dtype)
            else:
                toks = np.zeros((1, T), np.int32)
                toks[0, :valid] = req.prompt[lo:lo + valid]
                x = jnp.asarray(toks)
            prefill = self._prefill_fn(T, fused=fused)
            first, self.pool, self.key = prefill(
                self.params, self.pool, x, jnp.asarray(seg),
                jnp.asarray([slot], jnp.int32), jnp.int32(valid),
                self.key, jnp.int32(req.lora_expert))
        return first

    def _round(self, k: int):
        """One jitted K-step decode round + host-side finish processing.
        Slots that finish mid-round have their surplus tokens dropped
        here (the device kept feeding them — bounded waste, see module
        docstring)."""
        tokens = np.zeros((self.pcfg.slots,), np.int32)
        seg = np.zeros((self.pcfg.slots,), np.int32)
        for slot, st in self.live.items():
            tokens[slot] = st["pending"]
            seg[slot] = 1
        self.pool, _, ys, self.key = self._decode_round_fn(k)(
            self.params, self.pool, jnp.asarray(tokens), jnp.asarray(seg),
            self.key, self.experts)
        ys = np.asarray(ys)                       # [k, slots] — ONE readback
        for slot in list(self.live):
            self._consume(slot, ys[:k, slot])

    def _spec_trip(self):
        """R device-drafted verify rounds per host trip (spec_quantum):
        one readback, host replays emission round by round (a slot that
        finishes mid-trip stops consuming its later rounds)."""
        K, R = self.spec_k, self.spec_quantum
        pending = np.zeros((self.pcfg.slots,), np.int32)
        live = np.zeros((self.pcfg.slots,), np.int32)
        for slot, st in self.live.items():
            pending[slot] = st["pending"]
            live[slot] = 1
        (self.pool, self.hist, self.hist_len, _), ys = \
            self._spec_trip_fn()(
                self.params, self.pool, self.hist, self.hist_len,
                jnp.asarray(pending), jnp.asarray(live), self.experts)
        ys = np.asarray(ys)                   # [R, slots, K+2] — ONE readback
        snap = {slot: st["req"].rid for slot, st in self.live.items()}
        for r in range(R):
            for slot, rid in snap.items():
                st = self.live.get(slot)
                if st is None or st["req"].rid != rid:
                    # finished mid-trip: the device still ran this
                    # slot's whole verify block this round
                    self.waste["dropped"] += K + 1
                    continue
                m = int(ys[r, slot, K + 1])
                self.spec_stats["rounds"] += 1
                self._consume(slot, ys[r, slot, :m], history=True,
                              spec=True)

    def _spec_round(self):
        """One speculative round: host-side n-gram drafts per live slot
        (zero device cost), one jitted verify forward, host emit of the
        accepted prefix. Each accepted draft token is a decode step the
        weight stream never has to run; a fully-rejected draft still
        emits one token, so the round is never slower than a plain
        k=1 round in steps (the verify forward itself costs one weight
        stream plus the wider-T attention/embedding margin)."""
        K = self.spec_k
        tokens = np.zeros((self.pcfg.slots, K + 1), np.int32)
        live = np.zeros((self.pcfg.slots,), np.int32)
        for slot, st in self.live.items():
            propose = st["req"].draft_fn or speculative.ngram_propose
            tokens[slot, 0] = st["pending"]
            tokens[slot, 1:] = propose(st["history"], K)
            live[slot] = 1
        if self.temperature > 0:
            self.pool, out, self.key = self._spec_round_fn()(
                self.params, self.pool, jnp.asarray(tokens),
                jnp.asarray(live), self.experts, self.key)
        else:
            self.pool, out = self._spec_round_fn()(
                self.params, self.pool, jnp.asarray(tokens),
                jnp.asarray(live), self.experts)
        out = np.asarray(out)                     # [slots, K+2] — ONE readback
        for slot in list(self.live):
            m = int(out[slot, K + 1])
            self.spec_stats["rounds"] += 1
            self._consume(slot, out[slot, :m], history=True, spec=True)

    def _consume(self, slot, toks, *, history: bool = False,
                 spec: bool = False) -> bool:
        """Emit device-computed decode positions `toks` into `slot`'s
        stream in order, stopping at the first finish and counting the
        round's remaining positions as waste (the device computed them;
        the host drops them — the round-granularity invariant every
        decode mode shares). history/spec additionally feed the n-gram
        draft history and the speculative emit counter. Returns True if
        the slot finished."""
        st = self.live[slot]
        n = len(toks)
        for t in range(n):
            tok = int(toks[t])
            st["generated"].append(tok)
            if history:
                st["history"].append(tok)
            st["pending"] = tok
            self.waste["emitted"] += 1
            if spec:
                self.spec_stats["emitted"] += 1
            if self._maybe_finish(slot):
                self.waste["dropped"] += n - 1 - t
                return True
        return False

    def _maybe_finish(self, slot) -> bool:
        st = self.live[slot]
        req = st["req"]
        gen = st["generated"]
        hit_eos = req.eos_id is not None and gen and gen[-1] == req.eos_id
        if hit_eos or len(gen) >= req.max_new:
            self.done[req.rid] = gen
            self.alloc.release(slot)
            sh = self._slot_shared.pop(slot, None)
            if sh:
                self.pcache.release(sh)
            del self.live[slot]
            # point the dead slot at the null page and reset its length:
            # idle slots still participate in the fixed-shape decode step,
            # and their writes must not land on reallocated pages
            pt, sl, self.experts = self._set_slot(
                self.pool["page_table"], self.pool["seq_len"],
                self.experts, jnp.int32(slot), self._null_row,
                jnp.int32(0), jnp.int32(0))
            self.pool = {**self.pool, "page_table": pt, "seq_len": sl}
            return True
        return False
