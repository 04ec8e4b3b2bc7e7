"""Diverse beam search over the paged KV pool.

The reference's beam caption path decodes on a dense per-beam cache with
in-place row reordering (model_unified.py:701-858, :830-832). The dense
JAX port (inference/generation.py) gathers full cache rows per step — a
copy of the whole context per beam per token. This module moves beam decode
onto the paged pool (inference/kv_pool.py):

  * beam rows ARE pool slots; all beams of a prompt SHARE the prompt's
    full KV pages read-only (prompt KV is written once, not `beam` times —
    the dense path replicates it per beam at prefill);
  * parent reorder = a gather on page-table ROWS (max_pages int32 entries)
    instead of the full KV context;
  * the only per-step KV copy is each beam's current PARTIAL page: full
    pages are append-only and immutable, so children can share the
    parent's filled pages and only the in-progress page must be
    duplicated (copy-on-write at page granularity).

Page ownership scheme (no refcounts needed): every beam slot owns a fixed
private page range covering the generation region [g0, last] where
g0 = prompt_len // page_size. Reorder copies the parent's current partial
page into the child's private page for that index and re-points all
indices >= current at the child's private pages; indices < current gather
the parent's (immutable) entries. A private page is only written while it
is the slot's current page, and it only enters other tables once full —
so no write ever lands on a shared page.

Selection math is `generation.diverse_beam_select`, shared with the dense
path: both decoders produce identical hypotheses (tested).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.inference import kv_pool
from procyon_tpu.ops import page_move
from procyon_tpu.inference.generation import (GenerationConfig,
                                              diverse_beam_select)
from procyon_tpu.models import llama, unified


def plan_pool_config(cfg: llama.LlamaConfig, prompt_lens, beam: int,
                     max_new: int, *, page_size: int = 64,
                     dtype=None, quantize_kv: bool = False,
                     n_prompt_pages: Optional[int] = None
                     ) -> kv_pool.PagedConfig:
    """Size a pool exactly for one beam run: shared prompt pages + TWO
    private generation pages per (beam slot, generation index) + the null
    page. Private pages come in ping-pong PAIRS: step t writes the
    phase-(t%2) page of the slot's current index, so copy-on-write
    sources (the parent's page, last written at phase 1-t%2) and
    destinations are always disjoint sets — the COW is then a direct
    in-place page copy (ops/page_move.move_pages_direct) with no staging
    pass. Costs ~n_priv*slots extra pages (~5% of a caption-shaped pool)
    and halves the per-step COW traffic.

    n_prompt_pages overrides the per-row prompt-page sum (the
    shared-prefix planner passes the DEDUPED count)."""
    P = page_size
    n_prompt = (n_prompt_pages if n_prompt_pages is not None
                else sum(-(-int(L) // P) for L in prompt_lens))
    max_pages_per_seq = max(-(-(int(L) + max_new) // P)
                            for L in prompt_lens)
    n_priv = max(
        (-(-(int(L) + max_new) // P)) - int(L) // P for L in prompt_lens)
    slots = len(prompt_lens) * beam
    return kv_pool.PagedConfig(
        n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim, page_size=P,
        n_pages=1 + n_prompt + slots * n_priv * 2,
        max_pages_per_seq=max_pages_per_seq, slots=slots,
        dtype=dtype or cfg.dtype, quantize_kv=quantize_kv)


@dataclasses.dataclass
class _BeamPlan:
    """Host-side page layout for one run (all arrays are static inputs)."""
    prompt_pages: np.ndarray   # [B, max_pages] page id per prompt page
    private: np.ndarray        # [slots, n_priv, 2] ping-pong private pages
    g0: np.ndarray             # [B] first generation page index
    lens: np.ndarray           # [B] prompt lengths
    start: np.ndarray          # [B] shared-prefix tokens (prefill resumes
    #                            here; 0 without shared_prefix)
    wave: np.ndarray           # [B] prefill wave (a row's shared pages are
    #                            all written by strictly earlier waves)


def _plan_pages(pcfg: kv_pool.PagedConfig, prompt_lens, beam: int,
                max_new: int) -> _BeamPlan:
    P = pcfg.page_size
    B = len(prompt_lens)
    nxt = 1  # page 0 = null
    prompt_pages = np.zeros((B, pcfg.max_pages_per_seq), np.int64)
    g0 = np.zeros((B,), np.int64)
    for r, L in enumerate(prompt_lens):
        n = -(-int(L) // P)
        prompt_pages[r, :n] = np.arange(nxt, nxt + n)
        nxt += n
        g0[r] = int(L) // P
    n_priv = max(
        (-(-(int(L) + max_new) // P)) - int(L) // P for L in prompt_lens)
    private = np.arange(nxt, nxt + B * beam * n_priv * 2).reshape(
        B * beam, n_priv, 2)
    assert private.max(initial=0) < pcfg.n_pages, "pool too small"
    return _BeamPlan(prompt_pages=prompt_pages, private=private, g0=g0,
                     lens=np.asarray(prompt_lens, np.int64),
                     start=np.zeros((B,), np.int64),
                     wave=np.zeros((B,), np.int64))


@dataclasses.dataclass
class _SharedPlan:
    """Result of the shared-prefix dedup pass."""
    pages: np.ndarray     # [B, max_prompt_pages] page id per prompt page
    start: np.ndarray     # [B] shared tokens (prefill resumes here)
    wave: np.ndarray      # [B] prefill dependency wave
    n_prompt: int         # novel prompt pages allocated by THIS plan
    novel: list           # [(chain node key, page id)] freshly-owned FULL
    #                       blocks — a BeamPoolSession promotes them into
    #                       its cross-batch cache once their prefill ran
    hit_pages: list       # page ids hit in chain0 (cross-batch cache hits;
    #                       the session refs them for the batch's lifetime)


def _shared_prompt_plan(prompt_lens, page_size: int, digests, *,
                        chain0=None, page_iter=None) -> _SharedPlan:
    """Dedup full prompt blocks across batch rows (shared-prefix prompt
    pages for the bulk-caption workload, the beam-path analogue of
    kv_pool.PrefixCache: every caption batch reuses ONE instruction
    template, so rows share their leading blocks until the first
    protein-specific token).

    digests[r] = kv_pool.PrefixCache.block_digests of row r's unpadded
    prompt content (full blocks only; the block holding the last prompt
    token is always row-private, so shared pages are write-once and the
    partial-page beam copy-on-write never touches them). Blocks are
    chained by a rolling hash — a block is only shared under an
    identical full prefix, exactly the PrefixCache.match semantics.

    chain0: node key -> page id of blocks whose KV was ALREADY WRITTEN
    in an earlier batch (a BeamPoolSession's PrefixCache.chain) — hits
    there carry NO wave dependency (wave -1: nothing to wait for).
    page_iter: callable n -> n fresh page ids for novel pages (a
    session's free list); defaults to the 1-based arange of the
    single-run exact pool layout.

    The first row to present a novel chain node OWNS (and prefills) its
    page; later rows reference it and prefill only their tail as a
    continuation forward, one wave after their deepest dependency."""
    P = page_size
    B = len(prompt_lens)
    max_prompt = max(-(-int(L) // P) for L in prompt_lens)
    prompt_pages = np.zeros((B, max_prompt), np.int64)
    start = np.zeros((B,), np.int64)
    wave = np.zeros((B,), np.int64)
    # rolling node key -> (page id, writer wave); cross-batch pages were
    # written before this batch dispatched anything: wave -1
    chain = {k: (int(p), -1) for k, p in (chain0 or {}).items()}
    nxt = [1]                   # page 0 = null
    if page_iter is None:
        def page_iter(n):
            out = np.arange(nxt[0], nxt[0] + n)
            nxt[0] += n
            return out
    n_novel = 0
    novel = []
    hit_pages = {}              # ordered de-dup of cross-batch hits
    hasher = kv_pool.PrefixCache(P)
    for r, L in enumerate(prompt_lens):
        L = int(L)
        n = -(-L // P)
        keys = hasher.node_keys(list(digests[r]))
        hits = []
        dep = -1
        for k in keys:
            ent = chain.get(k)
            if ent is None:
                break
            hits.append(ent[0])
            dep = max(dep, ent[1])
            if ent[1] < 0:
                hit_pages[ent[0]] = None
        s = len(hits)
        wave[r] = dep + 1
        own = np.asarray(page_iter(n - s), np.int64)
        n_novel += n - s
        for j in range(s, len(keys)):     # promote novel FULL blocks
            chain[keys[j]] = (int(own[j - s]), int(wave[r]))
            novel.append((keys[j], int(own[j - s])))
        prompt_pages[r, :s] = hits
        prompt_pages[r, s:n] = own
        start[r] = s * P
    return _SharedPlan(pages=prompt_pages, start=start, wave=wave,
                       n_prompt=n_novel, novel=novel,
                       hit_pages=list(hit_pages))


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 0).bit_length() if n > 1 else 1


class BeamPoolSession:
    """Persistent cross-batch pool for bulk captioning.

    paged_beam_init sizes an exact pool per batch, so (a) every batch
    whose prompt lengths differ compiles a NEW program set (pool shapes
    are static under jit — 20 s-10 min per variant over the remote
    runtime), and (b) the instruction template's KV is re-prefilled every
    batch even though `shared_prefix` dedups it within one. A session
    fixes both: ONE PagedConfig (one compiled prefill/step set for the
    whole run) and a kv_pool.PrefixCache whose entries OUTLIVE batches —
    the template blocks written by batch k are cache hits for batches
    k+1..n, which prefill only their protein-specific tails (wave 0,
    no dependency: the bytes were written by an earlier batch's
    dispatches). This is the caption-path analogue of the
    ContinuousBatcher's automatic prefix caching (serving.py), with the
    batch — not the slot — as the page-lifetime unit.

    Page lifetime: novel pages are batch-owned (freed by end_batch);
    full prompt blocks are PROMOTED into the cache at end_batch (their
    lifetime becomes the cache's LRU/refcount); cache hits are ref'd for
    the batch and released after. Zero-ref cached pages are evicted back
    to the free list only when an allocation needs them. Generation and
    partial-page COW writes land exclusively on batch-private pages, so
    cached pages are write-once (same safety argument as the per-batch
    shared-prefix plan).

    Usage: pass `session=` to paged_beam_generate (ProcyonCaptionEval
    does this when shared_prefix=True); every batch must present the
    same batch_size x beam_size (pad the last chunk — the eval wrapper
    does). Exactness: a hit reuses the BYTES an earlier batch's prefill
    wrote at the same absolute positions; CPU-f32 tokens are unchanged
    (tested), on-chip bf16 the usual cross-program caveat applies on
    random weights (CLAUDE.md)."""

    def __init__(self, *, page_size: int = 64, quantize_kv: bool = False,
                 cache_pages: Optional[int] = None):
        self.page_size = page_size
        self.quantize_kv = quantize_kv
        self.cache_pages = cache_pages
        self.pcfg: Optional[kv_pool.PagedConfig] = None
        self.pool = None
        self.cache = kv_pool.PrefixCache(page_size)
        self.free: Optional[list] = None
        self.n_priv = 0
        self._beam = 0
        self._max_new = 0
        self._max_prompt = 0
        self._prefill = None       # jitted once: one program set per run
        self._step = None
        self._step_trip = None     # K-step scan variant (step_trip > 1)
        self._step_key = None      # (gen, cascade widths, trip) closed over
        self._step_gen = None      # the GenerationConfig _step closed over
        self._step_cascade = None  # the cascade widths _step closed over

    # -- sizing -----------------------------------------------------------
    def _build(self, lcfg: llama.LlamaConfig, B: int, beam: int,
               max_prompt: int, max_new: int):
        P = self.page_size
        prompt_rows = -(-max_prompt // P)
        # worst-case private pages per beam slot over any prompt length
        n_priv = -(-max_new // P) + 1
        cache_budget = (self.cache_pages if self.cache_pages is not None
                        else 2 * prompt_rows)
        n_pages = (1 + cache_budget + B * prompt_rows
                   + B * beam * n_priv * 2)
        self.pcfg = kv_pool.PagedConfig(
            n_layers=lcfg.n_layers, n_kv_heads=lcfg.n_kv_heads,
            head_dim=lcfg.head_dim, page_size=P, n_pages=n_pages,
            max_pages_per_seq=-(-(max_prompt + max_new) // P),
            slots=B * beam, dtype=lcfg.dtype,
            quantize_kv=self.quantize_kv)
        self.pool = kv_pool.init_pool(self.pcfg)
        self.free = list(range(n_pages - 1, 0, -1))
        self.n_priv = n_priv
        self._beam, self._max_new, self._max_prompt = beam, max_new, \
            max_prompt

    def _take(self, n: int) -> np.ndarray:
        if n > len(self.free):
            self.free.extend(self.cache.evict(n - len(self.free)))
        if n > len(self.free):
            raise MemoryError(
                f"beam session pool exhausted: need {n} pages, "
                f"{len(self.free)} free and no evictable cache entries")
        return np.asarray([self.free.pop() for _ in range(n)], np.int64)

    # -- per-batch plan -----------------------------------------------------
    def begin_batch(self, lcfg: llama.LlamaConfig, lens, digests,
                    beam: int, max_new: int, max_prompt_bound: int):
        if self.pcfg is None:
            self._build(lcfg, len(lens), beam, max_prompt_bound, max_new)
        B = len(lens)
        if B * beam != self.pcfg.slots or beam != self._beam:
            raise ValueError(
                f"beam session is shaped for {self.pcfg.slots // self._beam}"
                f" x beam {self._beam}; got {B} x {beam} (pad the last "
                "chunk to the session batch size)")
        if max_new > self._max_new or int(max(lens)) > self._max_prompt:
            raise ValueError("prompt/generation length exceeds the "
                             "session's first-batch bound")
        taken: list = []

        def page_iter(n):
            pages = self._take(n)
            taken.extend(int(p) for p in pages)
            return pages

        # Pin EVERY cached page while the plan reads the chain: _take's
        # LRU eviction must not reclaim a zero-ref page an earlier row of
        # this very plan already hit (refs for the batch are acquired
        # only once the plan is complete). Private pages are taken after
        # unpinning, when evicting non-hit cold entries is safe again.
        pinned = list(self.cache.meta)
        self.cache.acquire(pinned)
        try:
            plan = _shared_prompt_plan(lens, self.page_size, digests,
                                       chain0=self.cache.chain,
                                       page_iter=page_iter)
            self.cache.acquire(plan.hit_pages)
        except MemoryError:
            self.free.extend(sorted(set(taken), reverse=True))
            raise
        finally:
            self.cache.release(pinned)
        try:
            priv = self._take(B * beam * self.n_priv * 2)
        except MemoryError:
            self.cache.release(plan.hit_pages)
            self.free.extend(sorted(set(taken), reverse=True))
            raise
        taken.extend(int(p) for p in priv)
        private = priv.reshape(B * beam, self.n_priv, 2)
        pp = np.zeros((B, self.pcfg.max_pages_per_seq), np.int64)
        pp[:, :plan.pages.shape[1]] = plan.pages
        lens64 = np.asarray(lens, np.int64)
        beam_plan = _BeamPlan(
            prompt_pages=pp, private=private,
            g0=lens64 // self.page_size, lens=lens64,
            start=plan.start, wave=plan.wave)
        rec = {"taken": set(taken), "novel": plan.novel,
               "hits": plan.hit_pages}
        return beam_plan, rec

    def end_batch(self, rec, pool) -> None:
        """Carry the batch's KV writes forward, promote its novel full
        prompt blocks into the cross-batch cache, release its refs, and
        free its remaining pages."""
        self.pool = {**self.pool,
                     **{k: pool[k] for k in _kv_arrays(pool)}}
        promoted = []
        for key, page in rec["novel"]:
            if self.cache.promote(key, page):
                rec["taken"].discard(page)   # lifetime -> cache
                promoted.append(page)
        # promote() refs the page for the prefilling batch; that batch
        # is done now — pages stay cached at ref 0 (evictable, reusable)
        self.cache.release(promoted)
        self.cache.release(rec["hits"])
        self.free.extend(sorted(rec["taken"], reverse=True))


def _beam_tables(plan: _BeamPlan, pcfg: kv_pool.PagedConfig, beam: int):
    """Initial per-slot page tables: shared prompt pages below g0, private
    pages from g0 on. Generation entries start at PHASE 1 (the init
    partial-prompt copy counts as the write of "step -1", so step 0's
    copy-on-write destinations — phase 0 — never overlap its sources)."""
    B = plan.prompt_pages.shape[0]
    tables = np.zeros((B * beam, pcfg.max_pages_per_seq), np.int64)
    for r in range(B):
        for k in range(beam):
            s = r * beam + k
            g = int(plan.g0[r])
            tables[s, :g] = plan.prompt_pages[r, :g]
            n_priv = plan.private.shape[1]
            end = min(g + n_priv, pcfg.max_pages_per_seq)
            tables[s, g:end] = plan.private[s, :end - g, 1]
    return tables


_KV_KEYS = ("k", "v", "k_scale", "v_scale")


def _kv_arrays(pool):
    return [k for k in _KV_KEYS if k in pool]


def _copy_pages(pool, n_pages, src_pages, dst_pages):
    """pool k/v (+ int8-KV scale arrays) [L*n_pages, page, X] (flat
    layer-major rows): copy page src -> dst per entry, in every layer.
    The per-layer permutation is applied on a free [L, n_pages, ...]
    reshape view."""

    def move(arr):
        a4 = arr.reshape(-1, n_pages, *arr.shape[1:])
        return a4.at[:, dst_pages].set(a4[:, src_pages]).reshape(arr.shape)

    return {**pool, **{k: move(pool[k]) for k in _kv_arrays(pool)}}


# module-level wrapper: callers across batches share one jit cache
_copy_pages_jit = jax.jit(_copy_pages, static_argnums=1)


def _copy_pages_matmul(pool, n_pages, src_pages, dst_pages):
    """_copy_pages as one one-hot matmul over the page axis.

    XLA lowers the gather+scatter form to sequential per-page while
    loops (profiled 3.5 ms/step of an 17.9 ms 6.3B beam step — 4x the
    bandwidth floor of the 40-page move). Expressing the move as
    new[:, q] = sum_p M[p, q] * pool[:, p] with M = identity except
    M[:, dst_j] = one_hot(src_j) turns it into a single [P, P]
    contraction the MXU streams at full rate. 0/1 weights copy bf16
    values exactly. dst pages must be distinct (each beam slot's own
    private page — guaranteed by the page plan); src may repeat."""
    def move(arr):
        if arr.dtype == jnp.float32:
            # f32 scale arrays take the exact gather+scatter form: a
            # one-hot f32 matmul is NOT a bit-exact copy on TPU (f32
            # dots run as bf16 passes, ~1e-2 abs error) and the scale
            # slabs are tiny (KH lanes vs Hkv*D)
            a4 = arr.reshape(-1, n_pages, *arr.shape[1:])
            return a4.at[:, dst_pages].set(
                a4[:, src_pages]).reshape(arr.shape)
        # int8 codes route through f32 one-hot weights (a 0/1 f32 matmul
        # of values |x| <= 127 is exact); bf16 0/1 weights copy bf16
        # values exactly
        mdt = arr.dtype if arr.dtype != jnp.int8 else jnp.float32
        return _onehot_page_contraction(arr, n_pages, src_pages,
                                        dst_pages, mdt)

    return {**pool, **{k: move(pool[k]) for k in _kv_arrays(pool)}}


def _onehot_page_contraction(arr, n_pages, src_pages, dst_pages, mdt):
    """The page move as ONE MXU contraction over the flattened
    layer-major page axis: new[:, q] = sum_p M[p, q] * arr[:, p] with
    M = identity except M[:, dst_j] = one_hot(src_j). dst pages must be
    distinct (each beam slot's own private page — guaranteed by the
    page plan); src may repeat. Shared by _copy_pages_matmul and
    _move_scales_onehot so the move-plan semantics live in one place.
    Returns arr's shape/dtype."""
    m = jnp.eye(n_pages, dtype=mdt)
    m = m.at[:, dst_pages].set(0.0)
    m = m.at[src_pages, dst_pages].set(1.0)
    flat = arr.reshape(-1, n_pages, int(np.prod(arr.shape[1:])))
    out = jax.lax.dot_general(
        m, flat.astype(mdt), dimension_numbers=(((0,), (1,)), ((), ())))
    # dot_general output is [P_out, L, X]; restore [L, P, X]
    return out.transpose(1, 0, 2).astype(arr.dtype).reshape(arr.shape)


def _move_scales_onehot(arr, n_pages, src_pages, dst_pages):
    """Exact one-hot matmul page move for the f32 int8-KV scale slabs.

    Running the Pallas page-move custom call on the [L*P, page, KH]
    scale arrays forced XLA to relayout the WHOLE slab before and after
    the aliased call (profiled ~1.6 ms/step of the 25.6 ms flagship
    caption step: four+ f32[5568,64,8] copies around custom-call.60/61)
    — more than the move itself. The slabs are tiny (~11 MB at 174
    pages), so streaming them once through a [P, P] one-hot contraction
    costs ~0.03 ms and keeps XLA's native layout. Exactness: f32 bytes
    are BITCAST to int8 lanes first — a one-hot product copies a single
    int8-valued term, exactly representable in the TPU's bf16 multiply
    passes (a direct f32 one-hot matmul is NOT a bit-exact copy here)."""
    s8 = jax.lax.bitcast_convert_type(arr, jnp.int8)   # [N, page, KH, 4]
    out = _onehot_page_contraction(s8, n_pages, src_pages, dst_pages,
                                   jnp.float32)
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def _copy_pages_kernel(pool, n_pages, src_pages, dst_pages, *,
                       interpret=False):
    """_copy_pages via the Pallas page-move kernel (ops/page_move.py):
    stages the src pages with one XLA gather, then DMAs them onto their
    dst rows in place (pool aliased) — traffic is 2x the MOVED pages
    instead of the matmul form's 2x the whole pool (one-hot contraction
    reads and rewrites every page to move ~40) or the scatter form's
    sequential per-page loops. Moves are broadcast over the flattened
    layer-major page axis. int8-KV scale slabs take the exact one-hot
    matmul instead (_move_scales_onehot: the custom call's forced slab
    relayouts cost more than streaming the small slab outright)."""
    L = pool["k"].shape[0] // n_pages
    offs = jnp.arange(L, dtype=jnp.int32)[:, None] * n_pages
    src_flat = (offs + src_pages[None, :].astype(jnp.int32)).reshape(-1)
    dst_flat = (offs + dst_pages[None, :].astype(jnp.int32)).reshape(-1)
    # the ping-pong page plan guarantees src/dst disjointness, so the
    # direct (stage-free) kernel is safe
    out = {}
    for k in _kv_arrays(pool):
        if pool[k].dtype == jnp.float32:       # k_scale / v_scale slabs
            out[k] = _move_scales_onehot(pool[k], n_pages, src_pages,
                                         dst_pages)
        else:
            out[k] = page_move.move_pages_direct(pool[k], src_flat,
                                                 dst_flat,
                                                 interpret=interpret)
    return {**pool, **out}


def paged_beam_init(params, cfg: unified.UnifiedConfig, batch,
                    gen: GenerationConfig, *, page_size: int = 64,
                    prefill_bucket: Optional[int] = None,
                    quantize_kv: bool = False,
                    shared_prefix: bool = False,
                    session: Optional[BeamPoolSession] = None,
                    cascade: Optional[bool] = None):
    """Prefill prompts ONCE (not once per beam) and lay out the beam pool.

    batch: canonical (soft-token) model-input batch, LEFT-padded like the
    dense beam path; rows are unpacked to their true lengths for paged
    prefill. Returns (state, ctx) for `paged_beam_step`.

    shared_prefix=True dedups full prompt blocks ACROSS batch rows
    (content-addressed, _shared_prompt_plan): bulk-caption batches reuse
    one instruction template, so the shared leading blocks are written
    once — later rows point their tables at them and prefill only their
    private tail as a continuation forward (prefill compute AND pool
    pages both drop by the shared amount). CPU-f32 tokens are unchanged;
    on-chip bf16 the continuation is a different compiled program than
    the full-batch prefill, so the usual cross-program argmax caveat
    applies on random weights (CLAUDE.md).

    session= extends the dedup ACROSS batches on a persistent fixed-size
    pool (see BeamPoolSession): cache-hit blocks skip prefill entirely,
    and every batch reuses one compiled program set. Implies
    shared_prefix semantics; page_size/quantize_kv come from the session.
    """
    input_ids = np.asarray(batch["input_ids"])
    seg = np.asarray(batch["seg_ids"])
    B, Lmax = input_ids.shape
    beam = gen.beam_size
    lens = seg.sum(1).astype(np.int64)
    if session is not None:
        page_size = session.page_size
        quantize_kv = session.quantize_kv
        shared_prefix = True

    # fused-prompt embeddings for the full (padded) batch, then per-row
    # unpadding: paged prefill is position-0-based (no left padding).
    # params go through jit ARGUMENTS everywhere (captured arrays embed as
    # HLO constants -> oversized compile requests on the remote runtime).
    # Assembled BEFORE pool planning: the shared-prefix planner content-
    # addresses the embedding blocks.
    assemble = jax.jit(lambda p, b: unified.assemble_input_embeds(p, cfg, b))
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "reference_indices" and v is not None
                 and not np.isscalar(v)}
    embeds = np.asarray(assemble(params, dev_batch), np.float32)
    Lu = int(lens.max())
    dense = np.zeros((B, Lu, embeds.shape[-1]), np.float32)
    for r in range(B):
        dense[r, :int(lens[r])] = embeds[r, seg[r] > 0]

    rec = None
    if shared_prefix:
        digests = [kv_pool.PrefixCache.block_digests(
            embeds=dense[r, :int(lens[r])], page_size=page_size)
            for r in range(B)]
        if session is not None:
            plan, rec = session.begin_batch(
                cfg.llama, lens, digests, beam, gen.max_new_tokens,
                max_prompt_bound=Lmax)
            pcfg = session.pcfg
        else:
            splan = _shared_prompt_plan(lens, page_size, digests)
            pcfg = plan_pool_config(cfg.llama, lens, beam,
                                    gen.max_new_tokens,
                                    page_size=page_size,
                                    quantize_kv=quantize_kv,
                                    n_prompt_pages=splan.n_prompt)
            # private generation pages start right after the deduped
            # prompt pages (same ping-pong pairing as _plan_pages)
            P = page_size
            n_priv = max((-(-(int(L) + gen.max_new_tokens) // P))
                         - int(L) // P for L in lens)
            priv0 = 1 + splan.n_prompt
            private = np.arange(
                priv0, priv0 + B * beam * n_priv * 2).reshape(
                B * beam, n_priv, 2)
            assert private.max(initial=0) < pcfg.n_pages, "pool too small"
            pp = np.zeros((B, pcfg.max_pages_per_seq), np.int64)
            pp[:, :splan.pages.shape[1]] = splan.pages
            plan = _BeamPlan(prompt_pages=pp, private=private,
                             g0=(lens // P).astype(np.int64),
                             lens=np.asarray(lens, np.int64),
                             start=splan.start, wave=splan.wave)
    else:
        pcfg = plan_pool_config(cfg.llama, lens, beam, gen.max_new_tokens,
                                page_size=page_size,
                                quantize_kv=quantize_kv)
        plan = _plan_pages(pcfg, lens, beam, gen.max_new_tokens)
    # a session's pool CARRIES the cached pages' bytes across batches;
    # single-run pools start zeroed
    pool = (dict(session.pool) if session is not None
            else kv_pool.init_pool(pcfg))

    # prefill rows r=0..B-1 through slots 0..B-1 whose tables point at the
    # prompt pages (partial last page included - beams copy it right after)
    pt = np.zeros((pcfg.slots, pcfg.max_pages_per_seq), np.int64)
    pt[:B] = plan.prompt_pages
    # rows whose prompt ends mid-page write that page here first; it is
    # copied into each beam's private page below
    pool = {**pool, "page_table": jnp.asarray(pt, jnp.int32)}

    def _prefill_fn(p, pool, emb, pseg, rows, starts):
        # continuation semantics: positions derive from seq_len, so a
        # row with a shared prefix resumes at its boundary and attends
        # to the shared pages through its table
        pool = {**pool,
                "seq_len": pool["seq_len"].at[rows].set(starts)}
        logits, pool = llama.paged_forward(
            p["llama"], cfg.llama, pool, pcfg, rows, input_embeds=emb,
            seg_ids=pseg)
        return logits, pool

    if session is not None:
        # one jit wrapper per SESSION (not per batch): with the fixed
        # pcfg and pow2-bucketed tails below, every batch after the
        # first hits already-compiled programs
        if session._prefill is None:
            session._prefill = jax.jit(_prefill_fn)
        prefill = session._prefill
    else:
        prefill = jax.jit(_prefill_fn)

    # prefill in dependency waves (ONE wave of all rows without sharing —
    # the historical [B, T] program): a row runs only after the rows that
    # wrote its shared pages
    last_rows = [None] * B
    for w in range(int(plan.wave.max()) + 1):
        rows = np.nonzero(plan.wave == w)[0]
        tails = (lens[rows] - plan.start[rows]).astype(np.int64)
        T = int(tails.max())
        if prefill_bucket and prefill_bucket >= T:
            T = prefill_bucket
        elif session is not None:
            T = _next_pow2(T)  # bounded program set across batches
        emb_w = np.zeros((len(rows), T, dense.shape[-1]), np.float32)
        seg_w = np.zeros((len(rows), T), np.int32)
        for i, r in enumerate(rows):
            s, L = int(plan.start[r]), int(lens[r])
            emb_w[i, :L - s] = dense[r, s:L]
            seg_w[i, :L - s] = 1
        logits, pool = prefill(
            params, pool, jnp.asarray(emb_w, cfg.llama.dtype),
            jnp.asarray(seg_w), jnp.asarray(rows, jnp.int32),
            jnp.asarray(plan.start[rows], jnp.int32))
        wl = logits[jnp.arange(len(rows)), jnp.asarray(tails) - 1]
        for i, r in enumerate(rows):
            last_rows[r] = wl[i]
    last_logits = jnp.stack(last_rows)                    # [B, V]

    # beam tables + copy each prompt's partial page into every beam's
    # private page 0 (only when the prompt ends mid-page)
    tables = _beam_tables(plan, pcfg, beam)
    src, dst = [], []
    for r in range(B):
        if lens[r] % pcfg.page_size != 0:
            for k in range(beam):
                s = r * beam + k
                src.append(plan.prompt_pages[r, plan.g0[r]])
                dst.append(plan.private[s, 0, 1])  # phase 1 = "step -1"
    if src:
        pool = _copy_pages_jit(
            pool, pcfg.n_pages, jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32))
    seq_len = np.repeat(lens, beam)
    pool = {**pool, "page_table": jnp.asarray(tables, jnp.int32),
            "seq_len": jnp.asarray(seq_len, jnp.int32)}

    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32))
    logp0 = jnp.repeat(logp0, beam, axis=0)               # [B*beam, V]
    gsz = max(gen.beam_group_size, 1)
    scores0 = jnp.broadcast_to(
        jnp.where((jnp.arange(beam) % gsz) == 0, 0.0, -1e30), (B, beam))
    tokens0 = jnp.full((B, beam, gen.max_new_tokens), gen.pad_token_id,
                       jnp.int32)
    done0 = jnp.zeros((B, beam), bool)

    state = (tokens0, pool, logp0, scores0, done0)
    # grouped-prefix cascade decode (llama._cascade_decode_attention):
    # default ON for real beam decode off the "ref" CPU test backend —
    # the prompt's full pages are gathered once per beam group instead
    # of once per beam. STATIC widths: prefix = full prompt pages (the
    # session bound keeps one compiled program set across batches),
    # tail = private generation pages + the partial prompt page.
    if cascade is None:
        cascade = cfg.llama.attn_backend != "ref" and beam > 1
    pp_static = (session._max_prompt // page_size if session is not None
                 else int(plan.g0.max()))
    cpages = ((pp_static, plan.private.shape[1] + 1)
              if cascade and beam > 1 and pp_static > 0 else None)
    ctx = {"pcfg": pcfg, "beam": beam, "B": B,
           "private": jnp.asarray(plan.private, jnp.int32),
           "g0": jnp.asarray(plan.g0, jnp.int32),
           "start": plan.start, "wave": plan.wave, "session_rec": rec,
           "cascade_pages": cpages}
    return state, ctx


def paged_beam_step(params, cfg: unified.UnifiedConfig,
                    gen: GenerationConfig, pcfg: kv_pool.PagedConfig,
                    beam: int, private, g0, state, t,
                    cascade_pages=None):
    """One paged diverse-beam step: shared selection -> page-table row
    gather + partial-page copy-on-write -> one paged decode token.

    cascade_pages=(prefix_pages, tail_pages) (STATIC ints) routes the
    decode forward through the grouped-prefix cascade attention
    (llama._cascade_decode_attention): each prompt's immutable full
    pages are gathered once per beam GROUP instead of once per beam —
    at the flagship caption shape (B8 x beam 10, 7 pages/seq) the
    per-layer KV gather drops from 560 to ~128 page reads."""
    tokens, pool, logp, scores, done = state
    B = scores.shape[0]
    V = logp.shape[-1]
    new_tokens, new_parent, new_scores = diverse_beam_select(
        logp.reshape(B, beam, V), scores, done, gen)

    # absolute parent slot ids [B*beam]
    flat_parent = (new_parent + jnp.arange(B)[:, None] * beam).reshape(-1)
    slots = jnp.arange(B * beam)

    # token history + done reorder (as dense)
    tokens = tokens.reshape(B * beam, -1)[flat_parent].reshape(B, beam, -1)
    done = jnp.take_along_axis(done, new_parent, axis=1)
    tokens = tokens.at[:, :, t].set(
        jnp.where(done, gen.pad_token_id, new_tokens))
    done = done | (new_tokens == gen.eos_token_id)

    # --- page-table reorder (the win: max_pages int32 per slot, not KV) ---
    table = pool["page_table"]                       # [slots, P]
    seq_len = pool["seq_len"]                        # [slots] (same per row)
    parent_table = table[flat_parent]                # [slots, P]
    cur_idx = seq_len // pcfg.page_size              # [slots]
    g0_slot = jnp.repeat(g0, beam)                   # [slots]
    # entries >= cur point at THIS slot's private pages; below cur share
    # the parent's immutable pages
    idx = jnp.arange(pcfg.max_pages_per_seq)[None, :]
    priv_cols = jnp.clip(idx - g0_slot[:, None], 0,
                         private.shape[1] - 1)
    # ping-pong phase: step t writes its slots' phase-(t%2) pages, so
    # copy-on-write sources (parent pages, last written at phase 1-t%2
    # or at prefill) never collide with destinations
    phase = (t % 2).astype(jnp.int32)
    own_phased = jnp.where(phase == 0, private[..., 0], private[..., 1])
    own_pages = jnp.take_along_axis(own_phased, priv_cols, axis=1)
    new_table = jnp.where(idx >= cur_idx[:, None], own_pages, parent_table)

    # copy-on-write: parent's current partial page -> own private page.
    # On TPU the Pallas page-move kernel copies exactly the moved pages
    # at bandwidth, in place (src/dst disjoint by phase — no staging);
    # the CPU reference path keeps the XLA forms (matmul while the pool
    # is small — the scatter form lowers to sequential per-page loops at
    # ~4x the floor — scatter for big pools).
    src = jnp.take_along_axis(parent_table, cur_idx[:, None], axis=1)[:, 0]
    dst = jnp.take_along_axis(new_table, cur_idx[:, None], axis=1)[:, 0]
    backend = cfg.llama.attn_backend
    if backend != "ref":
        pool = _copy_pages_kernel(pool, pcfg.n_pages, src, dst,
                                  interpret=backend == "interpret")
    elif pcfg.n_pages <= 4 * dst.shape[0]:
        pool = _copy_pages_matmul(pool, pcfg.n_pages, src, dst)
    else:
        pool = _copy_pages(pool, pcfg.n_pages, src, dst)
    pool = {**pool, "page_table": new_table}

    # one paged decode token for every slot
    step_tok = jnp.where(done.reshape(-1), gen.pad_token_id,
                         new_tokens.reshape(-1))
    share = {}
    if cascade_pages is not None:
        share = dict(share_gsz=beam,
                     share_prefix_pages=int(cascade_pages[0]),
                     share_tail_pages=int(cascade_pages[1]),
                     share_g0=g0_slot)
    logits, pool = llama.paged_forward(
        params["llama"], cfg.llama, pool, pcfg, slots.astype(jnp.int32),
        tokens=step_tok[:, None], **share)
    logp_next = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32))
    return (tokens, pool, logp_next, new_scores, done)


def paged_beam_step_trip(params, cfg: unified.UnifiedConfig,
                         gen: GenerationConfig, pcfg: kv_pool.PagedConfig,
                         beam: int, private, g0, state, t0, n_steps: int,
                         cascade_pages=None):
    """`n_steps` (STATIC) consecutive paged diverse-beam steps as ONE
    lax.scan program — the beam counterpart of serving's step_quantum
    rounds. The host-stepped drive loop (bench_caption / BeamPoolSession)
    dispatches one program per decode step; scanning K steps into one
    program removes K-1 program boundaries per trip at no readback cost
    (the drive loop needs no per-step host decision: beam selection,
    COW, and EOS masking are all in-graph already; `done` rows keep
    stepping on pad tokens by design, exactly as the single-step host
    loop does).

    MEASURED NEUTRAL on the flagship chip config (bench_caption
    --step_trip 4: 21.29 ms/step plain vs 21.31 tripped, speedup 0.999,
    canary 0.688 / rtt 46.3): JAX's async dispatch already queues
    consecutive step programs back-to-back, so program boundaries cost
    no device idle here — the ~3.2 ms/step 'gaps' bucket in the r5
    caption attribution (profile_paged_beam.py) is INTRA-program
    scheduling/DMA bubbles, which a scan cannot remove. Kept (tested,
    token-exact) for hosts where per-program dispatch is expensive;
    default stays single-step everywhere.

    The scan body is compiled ONCE regardless of n_steps (unlike the
    whole-generation fori_loop program this module avoids — its unrolled
    remote compile takes many minutes); t rides the scan xs so the
    ping-pong COW phase (t % 2) and the token-history write stay exact.
    Token parity with n_steps repeated single steps is pinned by the CPU
    f32 suite; on-chip the usual cross-program bf16 argmax caveat
    applies (CLAUDE.md)."""
    ts = t0 + jnp.arange(n_steps, dtype=jnp.int32)

    def body(st, t):
        return paged_beam_step(params, cfg, gen, pcfg, beam, private,
                               g0, st, t, cascade_pages=cascade_pages), None

    state, _ = jax.lax.scan(body, state, ts)
    return state


def paged_beam_generate(params, cfg: unified.UnifiedConfig, batch,
                        gen: GenerationConfig, *, page_size: int = 64,
                        host_loop: bool = False,
                        quantize_kv: bool = False,
                        shared_prefix: bool = False,
                        session: Optional[BeamPoolSession] = None,
                        cascade: Optional[bool] = None,
                        step_trip: int = 1):
    """Full paged diverse-beam generation. Returns (tokens [B, beam, T],
    scores [B, beam]) ranked by score — same contract (and same tokens,
    tested) as generation.generate_beam.

    host_loop=True steps from the host with one jitted step function (the
    serving/bench drive mode: one compile regardless of max_new_tokens);
    False runs a lax.fori_loop on device.

    shared_prefix=True dedups identical leading prompt blocks across the
    batch (see paged_beam_init) — the bulk-caption capacity/prefill win.
    session= (a BeamPoolSession) extends the dedup across batches on a
    persistent pool: later batches skip the cached instruction prefill
    and reuse the first batch's compiled programs.
    cascade= (default: on off-"ref") — grouped-prefix cascade decode
    attention; see paged_beam_init/paged_beam_step.
    step_trip=K > 1 runs K-step lax.scan trips (paged_beam_step_trip) —
    one dispatch per K decode steps; the ragged tail falls back to
    single steps. Trips are a host-stepped drive mode, so step_trip > 1
    implies host_loop (the device fori_loop already runs every step in
    one program and has no dispatch boundaries to amortize).
    """
    state, ctx = paged_beam_init(params, cfg, batch, gen,
                                 page_size=page_size,
                                 quantize_kv=quantize_kv,
                                 shared_prefix=shared_prefix,
                                 session=session, cascade=cascade)
    pcfg, beam = ctx["pcfg"], ctx["beam"]
    cpages = ctx["cascade_pages"]

    # static config rides the closure; every ARRAY (params, page plan,
    # state) is a jit argument
    def _step(p, private, g0, state, t):
        return paged_beam_step(p, cfg, gen, pcfg, beam, private, g0,
                               state, t, cascade_pages=cpages)

    def _trip(p, private, g0, state, t0, n=step_trip):
        return paged_beam_step_trip(p, cfg, gen, pcfg, beam, private, g0,
                                    state, t0, n, cascade_pages=cpages)

    def _drive(jstep, jtrip):
        nonlocal state
        t = 0
        while t < gen.max_new_tokens:
            if jtrip is not None and t + step_trip <= gen.max_new_tokens:
                state = jtrip(params, ctx["private"], ctx["g0"], state,
                              jnp.int32(t))
                t += step_trip
            else:
                state = jstep(params, ctx["private"], ctx["g0"], state, t)
                t += 1

    if session is not None:
        # one step program for the whole session (fixed pcfg/slots);
        # re-wrapped if the GenerationConfig, cascade widths, or trip
        # size change (all are closed over)
        key = (gen, cpages, step_trip)
        if session._step is None or getattr(session, "_step_key",
                                            None) != key:
            session._step = jax.jit(_step)
            session._step_trip = (jax.jit(_trip) if step_trip > 1
                                  else None)
            session._step_key = key
            session._step_gen = gen
            session._step_cascade = cpages
        _drive(session._step, session._step_trip)
    elif host_loop or step_trip > 1:
        # step_trip without host_loop/session still means "use trips":
        # the device fori_loop below never consults it, so honoring the
        # caller here keeps caption_bulk --step_trip (no --shared_prefix)
        # measuring the drive loop it asked for
        _drive(jax.jit(_step),
               jax.jit(_trip) if step_trip > 1 else None)
    else:
        @jax.jit
        def _run(p, private, g0, state):
            return jax.lax.fori_loop(
                0, gen.max_new_tokens,
                lambda t, s: _step(p, private, g0, s, t), state)

        state = _run(params, ctx["private"], ctx["g0"], state)
    tokens, pool_f, _, scores, _ = state
    if session is not None:
        session.end_batch(ctx["session_rec"], pool_f)
    order = jnp.argsort(-scores, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    return tokens, jnp.take_along_axis(scores, order, axis=1)
