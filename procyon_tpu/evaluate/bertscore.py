"""Native BERTScore over the JAX BERT encoder.

The reference's primary caption metric is BERTScore with the ``en-sci``
model (procyon/evaluate/framework/caption.py:68-103: the HF ``evaluate``
bertscore wrapper with ``rescale_with_baseline=True``; en-sci resolves to
allenai/scibert_scivocab_uncased).  This module reimplements the metric
natively (bert_score's greedy-matching math) so the headline caption score
needs no external package:

  per (candidate, reference) pair, embed both with a BERT-family encoder,
  take the hidden states of one intermediate layer, L2-normalize, and
  greedy-match: recall = (idf-weighted) mean over reference tokens of the
  max cosine to any candidate token; precision symmetric; F1 harmonic.
  [CLS]/[SEP]/[PAD] are excluded.  Multi-reference: best F1 over the
  reference set (bert_score's multi-ref behavior).  Optional baseline
  rescaling maps scores to (s - b) / (1 - b).

Batched TPU-first: candidate/reference sentence pairs are packed into one
padded token batch per chunk, a single jitted encoder call embeds them, and
the (Tc x Tr) similarity matrices reduce on device.
"""

import dataclasses
from functools import partial
from math import log
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.models import bert

# bert_score pins one "known-good" layer per model (model2layers); scibert
# (the en-sci scorer) reads layer 8 of 12.
DEFAULT_LAYER = 8


@dataclasses.dataclass
class BERTScoreResult:
    precision: np.ndarray
    recall: np.ndarray
    f1: np.ndarray


@partial(jax.jit, static_argnames=("cfg", "layer"))
def _embed_layer(params, cfg: bert.BertConfig, tokens, layer: int):
    out = bert.forward(params, cfg, tokens, return_all_hidden=True)
    h = out["all_hidden"][layer].astype(jnp.float32)
    return h / jnp.maximum(
        jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)


@jax.jit
def _pair_scores(emb, mask, idf_w, cand_rows, ref_rows):
    """Greedy matching for index-paired rows of one packed batch.

    emb [N,S,d] normalized, mask [N,S] {0,1} (specials excluded),
    idf_w [N,S] per-token idf weights (uniform when idf is off),
    cand_rows/ref_rows [P] row indices. Returns (P,) precision/recall/f1.
    """
    c_e, r_e = emb[cand_rows], emb[ref_rows]
    c_m, r_m = mask[cand_rows], mask[ref_rows]
    c_w, r_w = idf_w[cand_rows], idf_w[ref_rows]
    sim = jnp.einsum("psd,ptd->pst", c_e, r_e)
    sim = sim * c_m[:, :, None] * r_m[:, None, :]
    neg = jnp.float32(-1e9)
    best_c = jnp.where(c_m > 0, jnp.max(
        jnp.where(r_m[:, None, :] > 0, sim, neg), axis=2), 0.0)
    best_r = jnp.where(r_m > 0, jnp.max(
        jnp.where(c_m[:, :, None] > 0, sim, neg), axis=1), 0.0)
    p = (best_c * c_w).sum(-1) / jnp.maximum((c_w * c_m).sum(-1), 1e-8)
    r = (best_r * r_w).sum(-1) / jnp.maximum((r_w * r_m).sum(-1), 1e-8)
    f1 = 2 * p * r / jnp.maximum(p + r, 1e-8)
    return p, r, f1


def compute_idf(refs: Sequence[str], tokenizer) -> Dict[int, float]:
    """bert_score idf: log((N+1)/(df+1)) document frequency over the
    reference corpus; specials get 0."""
    n = len(refs)
    df: Dict[int, int] = {}
    for t in refs:
        for tid in set(tokenizer.encode(t, add_special_tokens=False)):
            df[tid] = df.get(tid, 0) + 1
    idf = {tid: log((n + 1) / (c + 1)) for tid, c in df.items()}
    for tid in (tokenizer.cls_id, tokenizer.sep_id, tokenizer.pad_id):
        idf[tid] = 0.0
    return idf


class BERTScorer:
    """Reusable scorer: load the encoder once, score many batches.

    tokenizer: data/wordpiece.WordPieceTokenizer (or API-compatible).
    baseline: optional (p, r, f1) rescale baseline triple (the reference
    passes rescale_with_baseline=True with bert_score's shipped en-sci
    baseline file; supply those numbers here when reproducing it exactly).
    """

    def __init__(self, params, cfg: bert.BertConfig, tokenizer, *,
                 layer: int = DEFAULT_LAYER, idf: bool = False,
                 baseline: Optional[Tuple[float, float, float]] = None,
                 max_len: int = 512, batch_size: int = 64):
        if not 0 <= layer <= cfg.n_layers:
            raise ValueError(
                f"layer {layer} out of range for a {cfg.n_layers}-layer "
                f"encoder")
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.layer = layer
        self.idf = idf
        self.baseline = baseline
        # clamp to the encoder's position table (tiny synthetic configs
        # have max_position 64; long texts truncate like bert_score)
        self.max_len = min(max_len, cfg.max_position)
        self.batch_size = batch_size

    def _encode_texts(self, texts: Sequence[str], idf_table):
        enc = self.tokenizer.batch_encode(texts, max_len=self.max_len)
        ids = enc.ids
        # exclude specials from matching (bert_score strips CLS/SEP)
        mask = enc.attention_mask.astype(np.float32)
        for sid in (self.tokenizer.cls_id, self.tokenizer.sep_id):
            mask[ids == sid] = 0.0
        if idf_table is not None:
            w = np.vectorize(lambda t: idf_table.get(int(t), 1.0))(ids)
        else:
            w = np.ones_like(mask)
        return ids, mask, w.astype(np.float32)

    def score(self, candidates: Sequence[str],
              references: Sequence[Union[str, Sequence[str]]]
              ) -> BERTScoreResult:
        """references[i]: one string or a list (multi-ref -> best F1)."""
        assert len(candidates) == len(references)
        refs_lists: List[List[str]] = [
            [r] if isinstance(r, str) else list(r) for r in references]
        idf_table = (compute_idf([r for rs in refs_lists for r in rs],
                                 self.tokenizer) if self.idf else None)

        P = np.zeros(len(candidates), np.float32)
        R = np.zeros(len(candidates), np.float32)
        F = np.zeros(len(candidates), np.float32)
        # chunk pairs so each packed batch stays bounded
        pairs: List[Tuple[int, str, str]] = []
        for i, (c, rs) in enumerate(zip(candidates, refs_lists)):
            for r in rs:
                pairs.append((i, c, r))
        best_f: Dict[int, float] = {}
        for s in range(0, len(pairs), self.batch_size):
            chunk = pairs[s:s + self.batch_size]
            texts: List[str] = []
            index: Dict[str, int] = {}
            for _, c, r in chunk:
                for t in (c, r):
                    if t not in index:
                        index[t] = len(texts)
                        texts.append(t)
            ids, mask, w = self._encode_texts(texts, idf_table)
            emb = _embed_layer(self.params, self.cfg, jnp.asarray(ids),
                               self.layer)
            c_rows = jnp.asarray([index[c] for _, c, _ in chunk], jnp.int32)
            r_rows = jnp.asarray([index[r] for _, _, r in chunk], jnp.int32)
            p, r_, f1 = _pair_scores(emb, jnp.asarray(mask),
                                     jnp.asarray(w), c_rows, r_rows)
            p, r_, f1 = (np.asarray(a, np.float32) for a in (p, r_, f1))
            for j, (i, _, _) in enumerate(chunk):
                if i not in best_f or f1[j] > best_f[i]:
                    best_f[i] = float(f1[j])
                    P[i], R[i], F[i] = p[j], r_[j], f1[j]

        if self.baseline is not None:
            bp, br, bf = self.baseline
            P = (P - bp) / (1 - bp)
            R = (R - br) / (1 - br)
            F = (F - bf) / (1 - bf)
        return BERTScoreResult(precision=P, recall=R, f1=F)


def compute_baseline(scorer: BERTScorer, sentences: Sequence[str], *,
                     n_pairs: int = 1000, seed: int = 0
                     ) -> Tuple[float, float, float]:
    """Rescaling-baseline b = mean BERTScore of UNRELATED sentence pairs
    under this scorer's (model, layer) — bert_score's baseline method
    (its shipped en-sci file averages ~1M random Common Crawl pairs; see
    the reference's rescale_with_baseline=True, framework/caption.py:85-95).

    Deviation from bert_score, documented: this container has no Common
    Crawl corpus, so b is computed over random pairs drawn from a
    user-supplied corpus (e.g. the caption reference texts via
    scripts/compute_bertscore_baseline.py). Identical (model, layer,
    corpus, seed) reproduce the same b; rescaled scores are comparable
    ACROSS runs that share a baseline file, and differ from bert_score's
    shipped constants by the corpus-distribution delta.

    Pairs are (s_i, s_j) with i != j (derangement-style shifted pairing
    over shuffles), scored with the scorer's idf setting and NO baseline
    applied. Returns the (p, r, f1) means."""
    assert len(sentences) >= 2, "need at least two sentences"
    rng = np.random.default_rng(seed)
    sents = list(sentences)
    cands: List[str] = []
    refs: List[str] = []
    while len(cands) < n_pairs:
        perm = rng.permutation(len(sents))
        shift = np.roll(perm, 1)
        for i, j in zip(perm, shift):
            if sents[i] != sents[j]:
                cands.append(sents[i])
                refs.append(sents[j])
            if len(cands) >= n_pairs:
                break
    saved = scorer.baseline
    scorer.baseline = None
    try:
        res = scorer.score(cands, refs)
    finally:
        scorer.baseline = saved
    return (float(res.precision.mean()), float(res.recall.mean()),
            float(res.f1.mean()))


def load_baseline(path: str) -> Tuple[float, float, float]:
    """Read a baseline JSON written by scripts/compute_bertscore_baseline.py
    ({"precision": b_p, "recall": b_r, "f1": b_f, ...metadata})."""
    import json

    with open(path) as f:
        d = json.load(f)
    return (float(d["precision"]), float(d["recall"]), float(d["f1"]))


def make_scorer(checkpoint_dir: Optional[str] = None, *,
                vocab_file: Optional[str] = None,
                layer: int = DEFAULT_LAYER, idf: bool = False,
                dtype=jnp.bfloat16, seed: int = 0,
                baseline_file: Optional[str] = None,
                **kw) -> BERTScorer:
    """Build a scorer from a local HF BERT checkpoint dir (weights +
    vocab.txt), or - with no checkpoint - from synthetic weights (metric
    math is exact either way; absolute scores need real weights).
    baseline_file: JSON of rescaling constants (compute_bertscore_baseline
    CLI) -> scores are reported rescaled (s - b) / (1 - b) like the
    reference's rescale_with_baseline=True."""
    from procyon_tpu.data.wordpiece import WordPieceTokenizer

    if baseline_file:
        kw = {**kw, "baseline": load_baseline(baseline_file)}
    if checkpoint_dir:
        import os

        params, cfg = bert.load_hf_checkpoint(checkpoint_dir, dtype=dtype)
        vocab_file = vocab_file or os.path.join(checkpoint_dir, "vocab.txt")
        tokenizer = WordPieceTokenizer.from_vocab_file(vocab_file)
    else:
        cfg = bert.tiny_config(n_layers=2)
        params = bert.init_params(jax.random.PRNGKey(seed), cfg)
        tokenizer = WordPieceTokenizer.synthetic()
        layer = min(layer, cfg.n_layers)
    return BERTScorer(params, cfg, tokenizer, layer=layer, idf=idf, **kw)
