"""Structured synthetic checkpoint (models/synthetic.py, VERDICT r4 #3).

The induced-bigram construction must make greedy decode a DESIGNED
deterministic chain t -> f(t) (the zeroed residual-writing projections
leave the stream equal to the input embedding, so position i's logits
depend only on token i), with a top-1 margin huge enough to survive
quantization — that stability is what makes n-gram speculative
acceptance measurable end to end on chip (bench_serving --ngram_period).

CPU f32 here pins the arithmetic: the chain itself, the acceptance ramp
on repetitive text (period << max_new), and the acceptance floor on
unrepetitive text (period >> max_new).
"""
import jax
import numpy as np
import pytest

from procyon_tpu.inference import kv_pool as KP
from procyon_tpu.inference.serving import ContinuousBatcher
from procyon_tpu.models import llama as L
from procyon_tpu.models import synthetic


def _cfg():
    return L.tiny_config(attn_backend="ref", remat=False)


def _pcfg(cfg, **kw):
    base = dict(n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
                head_dim=cfg.head_dim, page_size=4, n_pages=64,
                max_pages_per_seq=16, slots=2, dtype=cfg.dtype)
    base.update(kw)
    return KP.PagedConfig(**base)


def test_cycle_permutation_is_permutation():
    f = synthetic.cycle_permutation(37, 8)
    assert sorted(f.tolist()) == list(range(37))
    # blocks of 8 form cycles: start of each block is reachable from its
    # end; the final short block (37 % 8 = 5 wide) wraps within itself
    assert f[7] == 0 and f[15] == 8 and f[36] == 32


@pytest.fixture(scope="module")
def chain_model():
    cfg = _cfg()
    params, f = synthetic.ngram_quantized_params(cfg, period=8, seed=0)
    return cfg, params, f


def test_greedy_decode_walks_the_chain(chain_model):
    cfg, params, f = chain_model
    rng = np.random.default_rng(3)
    prompt = list(rng.integers(4, cfg.vocab_size, 7))
    b = ContinuousBatcher(params, cfg, _pcfg(cfg))
    rid = b.submit(prompt, max_new=20)
    out = b.run()[rid]
    want, t = [], prompt[-1]
    for _ in range(20):
        t = int(f[t])
        want.append(t)
    assert out == want


def test_spec_acceptance_ramps_on_repetitive_text(chain_model):
    """period 8 << max_new 40: after one cold lap the slot history
    contains the full cycle, the n-gram drafter predicts it perfectly,
    and every verify round accepts all K+1 tokens. Tokens stay exactly
    the plain greedy chain (spec changes cost, never tokens)."""
    cfg, params, f = chain_model
    rng = np.random.default_rng(5)
    prompt = list(rng.integers(4, cfg.vocab_size, 5))
    stats = {}
    for max_new in (20, 60):
        b = ContinuousBatcher(params, cfg,
                              _pcfg(cfg, max_pages_per_seq=24), spec_k=4)
        rid = b.submit(prompt, max_new=max_new)
        out = b.run()[rid]
        want, t = [], prompt[-1]
        for _ in range(max_new):
            t = int(f[t])
            want.append(t)
        assert out == want
        stats[max_new] = dict(b.spec_stats)
    # warm-phase incremental acceptance (tokens 21..60 — the history
    # already contains the full cycle): every round accepts all K+1 = 5
    warm = ((stats[60]["emitted"] - stats[20]["emitted"])
            / (stats[60]["rounds"] - stats[20]["rounds"]))
    assert warm > 4.5, stats
    # and spec saved real rounds vs the 1-token-per-round plain floor
    assert stats[60]["rounds"] < 60 / 2, stats


def test_spec_acceptance_floors_on_unrepetitive_text():
    """period >> max_new: the chain never revisits its trail inside one
    generation, so n-gram drafts essentially never match and acceptance
    sits near the 1-token floor."""
    cfg = _cfg()
    params, _ = synthetic.ngram_quantized_params(cfg, period=cfg.vocab_size,
                                                 seed=0)
    rng = np.random.default_rng(7)
    prompt = list(rng.integers(4, cfg.vocab_size, 5))
    b = ContinuousBatcher(params, cfg, _pcfg(cfg), spec_k=4)
    b.submit(prompt, max_new=24)
    b.run()
    acc = b.spec_stats["emitted"] / b.spec_stats["rounds"]
    assert acc < 2.0, b.spec_stats


def test_margin_survives_program_shapes(chain_model):
    """The designed top-1 margin must make T=1 decode and a T>1 forward
    agree on argmax — the property random weights lack (CLAUDE.md) and
    the reason this checkpoint makes on-chip spec acceptance meaningful.
    Here: full-prompt prefill logits vs token-by-token decode logits
    argmax-agree at every position."""
    cfg, params, f = chain_model
    rng = np.random.default_rng(9)
    toks = np.asarray([list(rng.integers(4, cfg.vocab_size, 12))])
    full = L.forward(params, cfg, tokens=toks)["logits"]
    amax_full = np.asarray(full).argmax(-1)[0]
    assert amax_full.tolist() == [int(f[t]) for t in toks[0]]
