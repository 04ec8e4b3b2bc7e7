"""Paged KV cache + continuous-batching decode.

The reference serves one request at a time through a dense per-request
cache (FastAPI app, procyon/app/main.py; HF past_key_values). This module
is the TPU-serving redesign: a fixed pool of KV pages shared by all live
sequences, a host-side page allocator, and a jit decode step over a fixed
number of slots — so memory scales with the TOKENS actually cached instead
of n_seqs x max_len, and new requests join mid-flight without recompiling
(continuous batching).

Layout (all static shapes, jit-friendly):
  pool k/v : [L * n_pages, page_size, Hkv*D]  — flat lane layout like the
             packed attention kernels. The layer axis is FLATTENED into
             the page axis (layer l's page p lives at row l*n_pages + p):
             per-layer access is then a single gather with offset page
             indices instead of a dynamic-slice of the whole layer
             (profiled: the [L, P, page, KD] layout cost 1.2 ms/step of
             a 13.8 ms Llama-8B-class decode step copying each layer's
             full 12.8 MB pool slab before gathering 48 pages out of it).
  page_table : [slots, max_pages]  int32 (PER-LAYER page id 0..n_pages-1;
               consumers add l*n_pages for layer l)
  seq_len    : [slots] int32 (tokens cached; 0 = slot empty)
  k_scale/v_scale : [L * n_pages, page_size, Hkv] f32 — present only when
               cfg.quantize_kv: the pool then stores int8 K/V with
               per-(token, kv-head) symmetric scales. Decode dequant is
               algebraically free under the block-diagonal attention:
               the K scale factors OUT of each head's score row (the
               block-diagonal query zeroes every other head's lanes) and
               the V scale folds INTO the probabilities before the PV
               dot — so the int8 pool halves gather traffic and pool
               memory with two cheap elementwise corrections.

Decode gathers each slot's pages with one XLA gather per layer — HBM
traffic is proportional to the LIVE context, and the gather indices come
from the on-device page table (no host sync per step).
"""

import dataclasses
import hashlib
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PagedConfig:
    n_layers: int
    n_kv_heads: int
    head_dim: int
    page_size: int = 64
    n_pages: int = 256
    max_pages_per_seq: int = 16
    slots: int = 8
    dtype: object = jnp.bfloat16
    # store K/V pages as int8 with per-(token, head) scales: halves pool
    # memory and decode gather traffic (the serving hot path's largest
    # non-weight cost); quality is gated by tests/benches like the
    # weight quantization paths
    quantize_kv: bool = False

    @property
    def kv_dim(self):
        return self.n_kv_heads * self.head_dim

    @property
    def max_ctx(self):
        return self.max_pages_per_seq * self.page_size


def init_pool(cfg: PagedConfig) -> Dict:
    kv_dtype = jnp.int8 if cfg.quantize_kv else cfg.dtype
    pool = {
        "k": jnp.zeros((cfg.n_layers * cfg.n_pages, cfg.page_size,
                        cfg.kv_dim), kv_dtype),
        "v": jnp.zeros((cfg.n_layers * cfg.n_pages, cfg.page_size,
                        cfg.kv_dim), kv_dtype),
        "page_table": jnp.zeros((cfg.slots, cfg.max_pages_per_seq),
                                jnp.int32),
        "seq_len": jnp.zeros((cfg.slots,), jnp.int32),
    }
    if cfg.quantize_kv:
        shape = (cfg.n_layers * cfg.n_pages, cfg.page_size, cfg.n_kv_heads)
        pool["k_scale"] = jnp.zeros(shape, jnp.float32)
        pool["v_scale"] = jnp.zeros(shape, jnp.float32)
    return pool


def quantize_rows(x, n_kv_heads):
    """Per-(row, kv-head) symmetric int8 quantization of flat-lane K/V
    rows [..., Hkv*D] -> (q int8 [..., Hkv*D], scale f32 [..., Hkv])."""
    *lead, KD = x.shape
    hd = KD // n_kv_heads
    xh = x.reshape(*lead, n_kv_heads, hd).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xh), axis=-1)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xh / scale[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(*lead, KD), scale


class PageAllocator:
    """Host-side free-list over pool pages. Page 0 is reserved as the null
    page (page_table entries for unallocated logical pages point at it)."""

    def __init__(self, cfg: PagedConfig):
        self.cfg = cfg
        self.free: List[int] = list(range(cfg.n_pages - 1, 0, -1))
        self.owned: Dict[int, List[int]] = {}

    def pages_for(self, n_tokens: int) -> int:
        return -(-n_tokens // self.cfg.page_size)

    def can_admit(self, n_tokens: int, reserved: int = 0) -> bool:
        """reserved = page-table entries already covered by shared
        prefix-cache pages (they cost no private budget)."""
        return len(self.free) >= self.pages_for(n_tokens) - reserved

    def allocate(self, slot: int, n_tokens: int,
                 reserved: int = 0) -> List[int]:
        need = (self.pages_for(n_tokens) - reserved
                - len(self.owned.get(slot, [])))
        if need > len(self.free):
            raise MemoryError(
                f"paged KV pool exhausted: need {need} pages, "
                f"{len(self.free)} free")
        pages = [self.free.pop() for _ in range(max(need, 0))]
        self.owned.setdefault(slot, []).extend(pages)
        return self.owned[slot]

    def release(self, slot: int):
        self.free.extend(reversed(self.owned.pop(slot, [])))

    def disown(self, slot: int, page: int):
        """Transfer a page OUT of this slot's ownership (prefix-cache
        promotion: the page's lifetime is now the cache's refcount, not
        the slot's release)."""
        self.owned[slot].remove(page)


class PrefixCache:
    """Host-side shared-prefix page cache (automatic prefix caching).

    Protein serving workloads share long instruction templates (the
    reference rebuilds and re-forwards the full prompt per request,
    procyon/app/main.py:56-80 + inference_utils.py prompt builders). Here
    every FULL page-size block of a prompt is content-addressed by a
    rolling hash chain (block digest keyed by the digest of everything
    before it, so a block is only shared under an identical prefix); on
    admission the longest chain of cached blocks is reused directly as
    shared page-table entries — the prefill forward starts AFTER the
    shared region (compute skipped) and the shared pages cost no pool
    budget (capacity freed). Pages are refcounted: a live slot holds a
    reference on every shared page in its table; zero-ref pages stay
    cached and are evicted LRU back to the free list only when admission
    needs them.

    Exactness: a cache hit reuses the BYTES an earlier identical prefill
    wrote — positions, rotary phases, and page layout are absolute from
    0, so the gathered KV is exactly what this request's own prefill
    would have produced under the same prefill program (CPU-f32 parity is
    bit-exact and tested; on-chip bf16 the usual same-program caveat from
    CLAUDE.md applies across different prefill shapes).

    Safety invariant: only FULL blocks strictly inside the prompt are
    ever shared, and at least the final prompt token is always left to
    the private tail — decode/speculative writes land at positions
    >= prompt_len, i.e. in private pages, so shared pages are write-once.

    Cache lifetimes are PER POOL, by design (VERDICT r4 #9): the
    ContinuousBatcher and paged_beam.BeamPoolSession each own a
    PrefixCache because cache entries are page INDICES into one physical
    pool's flat page axis — sharing a cache across owners would require
    both to address the same donated k/v device buffers. Their pools
    cannot be one buffer: pool shapes are static under jit and sized to
    opposite working sets (serving: slots x max_ctx steady-state; beam:
    B x beam burst with COW ping-pong pairs), so a union pool would
    permanently reserve the larger footprint in HBM next to 6-8 GB of
    weights AND tie both compiled program sets to one shape (any resize
    for either workload recompiles both, 20 s-10 min/variant remotely).
    The cost of NOT sharing is bounded and small: the duplicated
    template KV is ~ceil(prefix_len/page_size) pages per owner
    (a 256-token bf16 template at 8B-model KV width is ~2 MB), vs tens
    of GB-seconds of over-provisioned pool. A process that both serves
    and bulk-captions should therefore run two pools and eat the few-MB
    duplication; the digest chain (block_digests) is already shared
    logic, so the caches stay behaviourally identical.
    """

    _ROOT = b"procyon-prefix-root"

    def __init__(self, page_size: int):
        self.page_size = page_size
        self.chain: Dict[bytes, int] = {}    # node key -> page id
        self.meta: Dict[int, dict] = {}      # page -> {key, ref, clock}
        self._clock = 0
        self.stats = {"hit_tokens": 0, "miss_tokens": 0, "evicted": 0}

    # -- content addressing ---------------------------------------------
    @staticmethod
    def block_digests(prompt=None, embeds=None, page_size: int = 64,
                      domain: bytes = b"") -> List[bytes]:
        """Digests of the prompt's full blocks, shareable region only
        (the last prompt token is excluded so the prefill tail is never
        empty — its logits produce the first sampled token). Token and
        fused (embedding) prompts hash in disjoint domains.

        `domain` extends the hash domain for anything beyond the prompt
        bytes that changes the KV a prefill WRITES: per-request task-LoRA
        experts apply the expert's lora_wk/lora_wv deltas to the cached
        K/V rows, so pages written under expert A must never match a
        request routed to expert B (the serving batcher passes
        b"e%d:" % lora_expert whenever cfg.lora is configured)."""
        if embeds is not None:
            n = embeds.shape[0]
            tag = b"emb:" + domain
            block = lambda j: np.ascontiguousarray(
                embeds[j * page_size:(j + 1) * page_size]).tobytes()
        else:
            arr = np.asarray(prompt, np.int32)
            n = arr.shape[0]
            tag = b"tok:" + domain
            block = lambda j: arr[j * page_size:(j + 1) * page_size
                                  ].tobytes()
        n_full = max((n - 1) // page_size, 0)
        return [hashlib.blake2b(tag + block(j), digest_size=16).digest()
                for j in range(n_full)]

    def node_keys(self, digests: List[bytes]) -> List[bytes]:
        keys, parent = [], self._ROOT
        for d in digests:
            parent = hashlib.blake2b(parent + d, digest_size=16).digest()
            keys.append(parent)
        return keys

    # -- lookup / lifetime ------------------------------------------------
    def match(self, digests: List[bytes]) -> Tuple[List[int], List[bytes]]:
        """Longest cached chain for these block digests. Returns
        (shared page ids, node keys for ALL blocks — hits then misses;
        the caller promotes the miss blocks after prefilling them)."""
        keys = self.node_keys(digests)
        pages = []
        for k in keys:
            p = self.chain.get(k)
            if p is None:
                break
            pages.append(p)
        return pages, keys

    def acquire(self, pages: List[int]) -> None:
        self._clock += 1
        for p in pages:
            m = self.meta[p]
            m["ref"] += 1
            m["clock"] = self._clock

    def release(self, pages: List[int]) -> None:
        for p in pages:
            self.meta[p]["ref"] -= 1

    def promote(self, key: bytes, page: int) -> bool:
        """Register a freshly-prefilled full-block page under its chain
        key with ref 1 (the prefilling slot's own use). Returns False if
        the key is already cached (the page stays slot-private)."""
        if key in self.chain:
            return False
        self._clock += 1
        self.chain[key] = page
        self.meta[page] = {"key": key, "ref": 1, "clock": self._clock}
        return True

    def evict(self, n: int) -> List[int]:
        """Evict up to n zero-ref pages, least recently used first;
        returns the page ids (caller hands them to the allocator's free
        list)."""
        victims = sorted(
            (p for p, m in self.meta.items() if m["ref"] <= 0),
            key=lambda p: self.meta[p]["clock"])[:n]
        for p in victims:
            del self.chain[self.meta.pop(p)["key"]]
        self.stats["evicted"] += len(victims)
        return victims

    def n_evictable(self) -> int:
        return sum(1 for m in self.meta.values() if m["ref"] <= 0)


def write_tokens(pool: Dict, cfg: PagedConfig, layer_k, layer_v, slot_ids,
                 start_pos):
    """Scatter new K/V rows into the pool. layer_k/v [L, B, T, Hkv*D] for B
    slots writing T tokens each starting at their start_pos. Returns the
    updated pool (functional). Positions past max_pages_per_seq are clipped
    to the LAST page-table column, so overflow writes land on whatever that
    entry holds: the repeated last private page for beam tables, but page 0
    (the null page) for PageAllocator-filled tables whose entries past the
    allocation are 0 — callers must guarantee allocation first.

    quantize_kv pools re-quantize the bf16 ys here with the SAME
    kv_pool.quantize_rows the decode scan used for the token's own
    attention (bit-identical by construction — one function, same
    input); threading the int8 codes + scales through the scan ys to
    avoid the duplicate VPU pass was measured SLOWER (633.2 vs 672.0
    tok/s at the 6.6B kv8 shape).

    Kept as the POST-SCAN write: scattering each layer's rows inside the
    decode scan body (pool in the scan carry) measured ~0.5 ms/step SLOWER
    at the 6.6B shape (12.29 vs 11.82 ms) — the in-loop scatter on the
    carried 873 MB buffer lowers worse than stacking ys and scattering
    once here."""
    L, B, T, KD = layer_k.shape
    pos = start_pos[:, None] + jnp.arange(T)[None, :]            # [B, T]
    logical = pos // cfg.page_size                               # [B, T]
    offset = pos % cfg.page_size
    table = pool["page_table"][slot_ids]                         # [B, P]
    page = jnp.take_along_axis(
        table, jnp.clip(logical, 0, cfg.max_pages_per_seq - 1), axis=1)
    # flatten scatter indices: [L*B*T] flat-pool rows (l*n_pages + page)
    page_f = jnp.broadcast_to(page[None], (L, B, T)).reshape(L, -1)
    off_f = jnp.broadcast_to(offset[None], (L, B, T)).reshape(-1)
    l_off = jnp.arange(L, dtype=page_f.dtype)[:, None] * cfg.n_pages
    flat_page = (page_f + l_off).reshape(-1)
    new = dict(pool)
    if cfg.quantize_kv:
        kq, ks = quantize_rows(layer_k.reshape(-1, KD), cfg.n_kv_heads)
        vq, vs = quantize_rows(layer_v.reshape(-1, KD), cfg.n_kv_heads)
        new["k"] = pool["k"].at[flat_page, off_f].set(kq)
        new["v"] = pool["v"].at[flat_page, off_f].set(vq)
        new["k_scale"] = pool["k_scale"].at[flat_page, off_f].set(ks)
        new["v_scale"] = pool["v_scale"].at[flat_page, off_f].set(vs)
    else:
        new["k"] = pool["k"].at[flat_page, off_f].set(
            layer_k.reshape(-1, KD))
        new["v"] = pool["v"].at[flat_page, off_f].set(
            layer_v.reshape(-1, KD))
    return new
