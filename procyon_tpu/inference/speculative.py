"""Self-speculative greedy decoding over the paged KV pool.

The reference decodes one token per forward (procyon/model/model_unified.py
generate path; procyon/app/main.py serves it one request at a time). On TPU
the decode step is WEIGHT-STREAMING bound (STATUS r3: the 6.6B int8 step
runs at 1.33x its weight-bandwidth floor with the MXU idle), so verifying K
drafted tokens in ONE forward costs barely more than decoding one token —
the [B, K+1] token block rides the same weight stream, and every accepted
draft token is a decode step the server never has to run.

Greedy speculative decoding is EXACT: the emitted sequence is the verify
forward's own greedy sequence regardless of what the draft proposes —
drafts change COST, never tokens (the verify forward is causal, so an
accepted prefix reproduces its logits bit-exactly on re-run). On the CPU
f32 suite this equals the plain T=1 decode path token-for-token (tested);
on-chip bf16 the T=K+1 and T=1 programs can argmax-diverge on near-ties
(chaotic random-weight logits: almost always, since top-1 gaps among 32k
entries sit below bf16 cross-program noise; trained checkpoints: rarely —
same effect as the r3 dense-vs-paged beam-token note). One verify round:

    feed   [t0, d1 .. dK]      t0 = the pending (last emitted) token
    greedy g_i = argmax logits at position i
    accept the longest prefix where d_{i+1} == g_i
    emit   g_0 .. g_m' (m = m'+1 tokens, 1 <= m <= K+1)
    rewind the slot's seq_len from start+K+1 to start+m

The rewind makes the rejected rows invisible (paged attention masks cached
positions >= seq_len) and the next round's writes overwrite them in place.

Drafts come from an N-GRAM proposer over the slot's own token history
(prompt + generated): the continuation that followed the most recent
occurrence of the current (n)-gram. Zero model cost, no second network,
no extra weights — the draft quality rides the natural repetitiveness of
the text (protein descriptions repeat GO/UniProt boilerplate heavily).
A model-based drafter can replace `propose` without touching the verify
math.

Temperature sampling composes via the rejection-sampling correction
(Leviathan et al. 2023) implemented in serving._spec_round_fn,
specialized to DETERMINISTIC proposers (every drafter here is a point
mass): accept d with probability p(d), resample the stop token from p
renormalized over x != d, bonus-sample p unmasked after a full accept.
The emitted marginal at every position is exactly p — sampled spec is
exact IN DISTRIBUTION (tested statistically in tests/test_speculative.py)
while consuming the RNG stream differently from plain decode. The
in-graph spec_quantum trip remains greedy-only.
"""

from typing import List, Sequence

import numpy as np


def ngram_propose(history: Sequence[int], k: int, *, n_max: int = 3,
                  n_min: int = 1) -> List[int]:
    """Draft k tokens: find the most recent earlier occurrence of the
    longest suffix n-gram (n_max down to n_min) of `history` and return
    the k tokens that followed it. Pads by repeating the last token when
    no match (or not enough continuation) exists — a wrong draft costs
    nothing (exact verify), an absent one wastes the slot's lane.

    Pure host-side numpy over the slot's python token list: runs between
    serving rounds, never touches the device.
    """
    h = np.asarray(history, dtype=np.int64)
    L = h.shape[0]
    last = int(h[-1]) if L else 0
    draft = None
    for n in range(min(n_max, L - 1), n_min - 1, -1):
        pat = h[L - n:]
        # candidate start positions of the n-gram, excluding the suffix
        # occurrence itself; windows end before L-n
        if L - n <= 0:
            continue
        win = np.lib.stride_tricks.sliding_window_view(h[:L - 1], n) \
            if L - 1 >= n else np.empty((0, n), np.int64)
        hits = np.nonzero((win == pat).all(axis=1))[0]
        if hits.size:
            p = int(hits[-1])
            cont = h[p + n:p + n + k]
            draft = list(int(t) for t in cont)
            break
    if draft is None:
        draft = []
    while len(draft) < k:
        draft.append(draft[-1] if draft else last)
    return draft[:k]


def accept_counts(draft_tail: np.ndarray, greedy: np.ndarray) -> np.ndarray:
    """m [B]: tokens emitted per row. draft_tail [B, K] (the d_1..d_K fed
    after the pending token), greedy [B, K+1] (argmax at every fed
    position). m = 1 + length of the matched prefix d_{i+1} == g_i.

    numpy mirror of the in-graph computation (serving._spec_round_fn) for
    tests."""
    match = draft_tail == greedy[:, :-1]
    # cumulative prefix: stop at the first mismatch
    prefix = np.cumprod(match.astype(np.int64), axis=1)
    return 1 + prefix.sum(axis=1)


def device_ngram_draft(hist, lens, k: int):
    """In-graph n-gram drafter: the jnp counterpart of `ngram_propose` for
    DEVICE-side speculative rounds (serving spec_quantum > 1), where R
    verify rounds run as one lax.scan per host trip and the draft must be
    computed between rounds without a host round trip (~30 ms each over
    the tunnel — the profiled majority of a spec round's wall time).

    hist [B, H] int32 (prompt + generated, front-aligned), lens [B] valid
    lengths. Matches the most recent earlier occurrence of the trailing
    2-gram, falling back to the trailing 1-gram, then to repeating the
    last token. Simpler than the host proposer's 3->1-gram ladder — the
    draft only affects COST, never tokens, so the two proposers need not
    agree. Rows with lens == 0 return garbage (callers mask dead slots).

    Fully vectorized [B, H] compare/argmax passes — microseconds next to
    a verify forward."""
    import jax.numpy as jnp

    B, H = hist.shape
    idx = jnp.arange(H, dtype=jnp.int32)
    rows = jnp.arange(B)
    last = hist[rows, jnp.maximum(lens - 1, 0)]                  # [B]
    prev = hist[rows, jnp.maximum(lens - 2, 0)]
    # 2-gram matches at p: hist[p] == prev, hist[p+1] == last, with the
    # continuation starting inside the valid region and the suffix's own
    # occurrence (p = lens-2) excluded
    m2 = (hist[:, :-1] == prev[:, None]) & (hist[:, 1:] == last[:, None])
    m2 &= (idx[None, :H - 1] < (lens - 2)[:, None]) & (lens > 2)[:, None]
    has2 = m2.any(axis=1)
    p2 = jnp.argmax(jnp.where(m2, idx[None, :H - 1], -1), axis=1)
    # 1-gram fallback: hist[p] == last, p < lens-1
    m1 = (hist == last[:, None]) & (idx[None] < (lens - 1)[:, None])
    has1 = m1.any(axis=1)
    p1 = jnp.argmax(jnp.where(m1, idx[None], -1), axis=1)
    start = jnp.where(has2, p2 + 2, p1 + 1)
    cont_idx = start[:, None] + jnp.arange(k, dtype=jnp.int32)[None]
    cont = jnp.take_along_axis(hist, jnp.clip(cont_idx, 0, H - 1), axis=1)
    # positions past the valid history repeat the last token
    cont = jnp.where(cont_idx < lens[:, None], cont, last[:, None])
    return jnp.where((has2 | has1)[:, None], cont,
                     jnp.broadcast_to(last[:, None], (B, k)))
