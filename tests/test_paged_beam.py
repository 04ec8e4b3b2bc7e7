"""Paged beam decode + fused-prompt serving: parity with the dense path.

VERDICT r2 missing #3: the flagship caption workload must reach the paged
pool. These tests pin (a) paged diverse beam == dense diverse beam tokens,
(b) fused (soft-token) prompts through ContinuousBatcher == dense greedy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.inference import generation, kv_pool, paged_beam, serving
from procyon_tpu.models import unified


def setup_model():
    cfg = unified.tiny_config(esm=None, protein_embed_dim=16)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_soft_batch(cfg, rng, B=2, L=12, n_prot=3, ragged=True):
    """Left-padded fused prompts with soft-token injections (the caption
    collator's for_generation layout)."""
    ids = np.asarray(rng.integers(4, cfg.llama.vocab_size, (B, L)), np.int32)
    seg = np.ones((B, L), np.int32)
    pos = np.broadcast_to(np.arange(L, dtype=np.int32), (B, L)).copy()
    soft = np.full((B, L), -1, np.int32)
    for b in range(B):
        pad = (b * 3) % (L // 2) if ragged else 0
        ids[b, :pad] = 0
        seg[b, :pad] = 0
        pos[b] = np.maximum(pos[b] - pad, 0)
        soft[b, pad + 1] = b % n_prot  # a protein soft token per row
    return {
        "input_ids": jnp.asarray(ids),
        "seg_ids": jnp.asarray(seg),
        "positions": jnp.asarray(pos),
        "soft_map": jnp.asarray(soft),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((n_prot, cfg.encoder_out_dim)),
            jnp.float32),
    }


class TestPagedBeamParity:
    @pytest.mark.parametrize("page_size", [4, 8])
    def test_tokens_match_dense_beam(self, rng, page_size):
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=2, L=12)
        gen = generation.GenerationConfig(
            max_new_tokens=9, method="beam", beam_size=4, beam_group_size=2,
            diversity_penalty=0.8, eos_token_id=2, pad_token_id=0)
        dense_toks, dense_scores = generation.generate_beam(
            params, cfg, batch, gen)
        paged_toks, paged_scores = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=page_size)
        np.testing.assert_array_equal(np.asarray(paged_toks),
                                      np.asarray(dense_toks))
        np.testing.assert_allclose(np.asarray(paged_scores),
                                   np.asarray(dense_scores), atol=1e-4)

    def test_prompt_exactly_page_aligned(self, rng):
        """Prompt length a multiple of page_size: no partial prompt page to
        copy; generation starts on a fresh private page."""
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=1, L=8, ragged=False)
        gen = generation.GenerationConfig(
            max_new_tokens=6, method="beam", beam_size=2, beam_group_size=1,
            diversity_penalty=0.5, eos_token_id=2, pad_token_id=0)
        dense_toks, _ = generation.generate_beam(params, cfg, batch, gen)
        paged_toks, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=8)
        np.testing.assert_array_equal(np.asarray(paged_toks),
                                      np.asarray(dense_toks))

    def test_host_loop_matches_device_loop(self, rng):
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=1, L=10)
        gen = generation.GenerationConfig(
            max_new_tokens=5, method="beam", beam_size=2, beam_group_size=2,
            diversity_penalty=0.8, eos_token_id=2, pad_token_id=0)
        dev_toks, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4)
        host_toks, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, host_loop=True)
        np.testing.assert_array_equal(np.asarray(host_toks),
                                      np.asarray(dev_toks))

    def test_step_trip_matches_single_steps(self, rng):
        """K-step scan trips (paged_beam_step_trip) must emit the same
        tokens as K repeated single-step dispatches, including a ragged
        tail (max_new not divisible by the trip size) and with EOS
        finishing rows mid-trip."""
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=2, L=12)
        gen = generation.GenerationConfig(
            max_new_tokens=7, method="beam", beam_size=4,
            beam_group_size=2, diversity_penalty=0.8, eos_token_id=2,
            pad_token_id=0)
        single_toks, single_scores = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, host_loop=True)
        trip_toks, trip_scores = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, host_loop=True,
            step_trip=3)   # 3+3+1: exercises the single-step tail
        np.testing.assert_array_equal(np.asarray(trip_toks),
                                      np.asarray(single_toks))
        np.testing.assert_allclose(np.asarray(trip_scores),
                                   np.asarray(single_scores),
                                   atol=1e-5, rtol=1e-5)
        # step_trip WITHOUT host_loop must be honored too (it implies the
        # host-stepped trip drive): caption_bulk --step_trip without
        # --shared_prefix used to fall through to the device fori_loop,
        # which never consults step_trip
        implied_toks, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, step_trip=3)
        np.testing.assert_array_equal(np.asarray(implied_toks),
                                      np.asarray(single_toks))

    def test_pool_is_smaller_than_dense_replication(self, rng):
        """The design point: beam slots share prompt pages, so pool KV is
        below beam * max_ctx per prompt even though every private
        generation page is a ping-pong PAIR (phase-disjoint
        copy-on-write). The prompt-dominated regime (long prompts, short
        generations — the caption workload) keeps the big saving."""
        cfg, params = setup_model()
        lens = [64, 64]
        beam, max_new, P = 10, 32, 8
        pcfg = paged_beam.plan_pool_config(cfg.llama, lens, beam, max_new,
                                           page_size=P)
        paged_tokens = pcfg.n_pages * P
        dense_tokens = len(lens) * beam * (max(lens) + max_new)
        assert paged_tokens < dense_tokens
        # prompt-dominated regime: far below dense
        pcfg2 = paged_beam.plan_pool_config(cfg.llama, [120, 120], beam,
                                            8, page_size=P)
        assert pcfg2.n_pages * P < len(lens) * beam * (120 + 8) / 2


class TestFusedServing:
    def test_fused_prompt_matches_dense_greedy(self, rng):
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=2, L=12)
        gcfg = generation.GenerationConfig(
            max_new_tokens=6, method="greedy", eos_token_id=2,
            pad_token_id=0)
        dense = np.asarray(generation.generate(params, cfg, batch, gcfg))

        pcfg = kv_pool.PagedConfig(
            n_layers=cfg.llama.n_layers, n_kv_heads=cfg.llama.n_kv_heads,
            head_dim=cfg.llama.head_dim, page_size=8, n_pages=32,
            max_pages_per_seq=4, slots=4, dtype=cfg.llama.dtype)
        batcher = serving.ContinuousBatcher(params["llama"], cfg.llama,
                                            pcfg)
        rids = batcher.submit_batch(params, cfg, batch, max_new=6,
                                    eos_id=2)
        done = batcher.run()
        got = np.stack([done[r] for r in rids])
        np.testing.assert_array_equal(got, dense)

    def test_fused_and_token_requests_coexist(self, rng):
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=1, L=8)
        pcfg = kv_pool.PagedConfig(
            n_layers=cfg.llama.n_layers, n_kv_heads=cfg.llama.n_kv_heads,
            head_dim=cfg.llama.head_dim, page_size=8, n_pages=32,
            max_pages_per_seq=4, slots=4, dtype=cfg.llama.dtype)
        batcher = serving.ContinuousBatcher(params["llama"], cfg.llama,
                                            pcfg)
        rid_f = batcher.submit_batch(params, cfg, batch, max_new=4)[0]
        rid_t = batcher.submit([5, 6, 7, 8], max_new=4)
        done = batcher.run()
        assert len(done[rid_f]) == 4
        assert len(done[rid_t]) == 4
        # the token request must match a token-prompt-only run
        b2 = serving.ContinuousBatcher(params["llama"], cfg.llama, pcfg)
        rid2 = b2.submit([5, 6, 7, 8], max_new=4)
        assert b2.run()[rid2] == done[rid_t]


class TestPagedCaptionEval:
    def test_eval_wrapper_paged_matches_dense(self, rng):
        """ProcyonCaptionEval(use_paged=True) must produce the same
        captions as the dense path (the flagship captioner rides the
        paged pool in product code, not just the bench)."""
        from procyon_tpu.data import collators as C
        from procyon_tpu.data.datasets import SyntheticStore
        from procyon_tpu.data.instruct import TaskLibrary
        from procyon_tpu.data.text_tokenizer import WordTokenizer
        from procyon_tpu.evaluate.procyon_models import ProcyonCaptionEval

        cfg = unified.tiny_config(esm=None, protein_embed_dim=32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = SyntheticStore(n_proteins=8, n_texts=8, embed_dim=32)
        tok = WordTokenizer(cfg.llama.vocab_size)
        task = TaskLibrary().get("uniprot_all_caption")
        gcfg = generation.GenerationConfig(
            max_new_tokens=6, method="beam", beam_size=2,
            beam_group_size=1, diversity_penalty=0.5,
            eos_token_id=tok.spec.eos_id, pad_token_id=tok.spec.pad_id)
        kw = dict(batch_size=4, gen=gcfg,
                  collator_cfg=C.CollatorConfig(max_text_len=96,
                                                protein_embed_dim=32))
        dense = ProcyonCaptionEval(params, cfg, tok, store, task, **kw)
        paged = ProcyonCaptionEval(params, cfg, tok, store, task,
                                   use_paged=True, page_size=8, **kw)
        ids = [0, 1, 2, 3]
        assert dense.get_predictions(ids) == paged.get_predictions(ids)


def make_shared_batch(cfg, rng, tails, S=9, n_prot=3, shared=None,
                      L_pad=None):
    """Fused prompts sharing a common S-token instruction prefix, then a
    per-row protein soft token + a random tail (the bulk-caption shape:
    one instruction template across the batch). Pass the same `shared`
    ids to build MULTIPLE batches over one instruction template
    (cross-batch session tests); L_pad forces the padded width (a
    session requires every batch at the first batch's width bound)."""
    B = len(tails)
    lens = [S + 1 + t for t in tails]
    L = L_pad or max(lens)
    ids = np.zeros((B, L), np.int32)
    seg = np.zeros((B, L), np.int32)
    pos = np.zeros((B, L), np.int32)
    soft = np.full((B, L), -1, np.int32)
    if shared is None:
        shared = np.asarray(rng.integers(4, cfg.llama.vocab_size, S),
                            np.int32)
    for b in range(B):
        pad = L - lens[b]                       # left padding
        ids[b, pad:pad + S] = shared
        ids[b, pad + S + 1:] = rng.integers(4, cfg.llama.vocab_size,
                                            tails[b])
        seg[b, pad:] = 1
        pos[b, pad:] = np.arange(lens[b])
        soft[b, pad + S] = b % n_prot
    return {
        "input_ids": jnp.asarray(ids),
        "seg_ids": jnp.asarray(seg),
        "positions": jnp.asarray(pos),
        "soft_map": jnp.asarray(soft),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((n_prot, cfg.encoder_out_dim)),
            jnp.float32),
    }


class TestSharedPrefix:
    """Shared-prefix prompt pages across batch rows (bulk-caption win)."""

    def test_plan_dedups_and_waves(self):
        """Unit: identical leading digests alias to one set of pages; the
        hitting row prefills one wave after the writer; divergence ends
        the share; a fully-duplicated prompt still keeps a private tail
        (block_digests excludes the final block by contract)."""
        P = 4
        d = [bytes([i]) * 16 for i in range(6)]
        digests = [
            [d[0], d[1], d[2]],          # row 0: writer, 16-token prompt
            [d[0], d[1], d[2]],          # row 1: full hit (same prompt)
            [d[0], d[1], d[5]],          # row 2: diverges at block 2
            [d[3]],                      # row 3: nothing shared
        ]
        lens = [16, 16, 16, 8]
        plan = paged_beam._shared_prompt_plan(lens, P, digests)
        pages, start, wave, n_prompt = (plan.pages, plan.start,
                                        plan.wave, plan.n_prompt)
        np.testing.assert_array_equal(start, [0, 12, 8, 0])
        np.testing.assert_array_equal(wave, [0, 1, 1, 0])
        # row 1 aliases row 0's first three pages, row 2 the first two
        np.testing.assert_array_equal(pages[1][:3], pages[0][:3])
        np.testing.assert_array_equal(pages[2][:2], pages[0][:2])
        assert pages[2][2] != pages[0][2]
        # every row keeps a private final page (write target for the
        # partial-page COW); dedup saved exactly the aliased pages
        assert pages[1][3] not in set(pages[0][:4])
        unshared = sum(-(-L // P) for L in lens)
        assert n_prompt == unshared - 5
        assert len({p for row in pages for p in row if p}) == n_prompt

    def test_tokens_match_dense_beam(self, rng):
        """Sharing must not change a single token: shared_prefix paged
        beam == dense diverse beam on a batch with a 9-token shared
        instruction prefix and ragged tails."""
        cfg, params = setup_model()
        batch = make_shared_batch(cfg, rng, tails=[3, 6, 2], S=9)
        gen = generation.GenerationConfig(
            max_new_tokens=7, method="beam", beam_size=4,
            beam_group_size=2, diversity_penalty=0.8, eos_token_id=2,
            pad_token_id=0)
        dense_toks, dense_scores = generation.generate_beam(
            params, cfg, batch, gen)
        toks, scores = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, shared_prefix=True)
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(dense_toks))
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(dense_scores), atol=1e-4)

    def test_pool_shrinks_and_tables_alias(self, rng):
        cfg, params = setup_model()
        batch = make_shared_batch(cfg, rng, tails=[3, 5, 4, 2], S=13)
        gen = generation.GenerationConfig(
            max_new_tokens=5, method="beam", beam_size=2,
            beam_group_size=1, diversity_penalty=0.5, eos_token_id=2,
            pad_token_id=0)
        _, ctx_p = paged_beam.paged_beam_init(params, cfg, batch, gen,
                                              page_size=4)
        _, ctx_s = paged_beam.paged_beam_init(params, cfg, batch, gen,
                                              page_size=4,
                                              shared_prefix=True)
        # 4 rows x 3 shared full blocks -> 9 pages saved
        assert (ctx_p["pcfg"].n_pages - ctx_s["pcfg"].n_pages) == 9

    def test_no_sharing_degenerates_to_private(self, rng):
        """Distinct prompts: same pool size as the unshared planner and
        one prefill wave."""
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=3, L=12)
        gen = generation.GenerationConfig(
            max_new_tokens=5, method="beam", beam_size=2,
            beam_group_size=2, diversity_penalty=0.8, eos_token_id=2,
            pad_token_id=0)
        toks_p, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4)
        toks_s, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, shared_prefix=True)
        np.testing.assert_array_equal(np.asarray(toks_s),
                                      np.asarray(toks_p))

    def test_shared_prefix_quantized_pool(self, rng):
        """Shared pages on an int8-KV pool: the continuation rows gather
        + dequantize the writer's int8 blocks; tokens match the private
        quantized run exactly (same quantization of the same bytes)."""
        cfg, params = setup_model()
        batch = make_shared_batch(cfg, rng, tails=[4, 3], S=9)
        gen = generation.GenerationConfig(
            max_new_tokens=6, method="beam", beam_size=2,
            beam_group_size=1, diversity_penalty=0.5, eos_token_id=2,
            pad_token_id=0)
        toks_q, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, quantize_kv=True)
        toks_qs, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, quantize_kv=True,
            shared_prefix=True)
        np.testing.assert_array_equal(np.asarray(toks_qs),
                                      np.asarray(toks_q))

    def test_duplicate_prompts_share_everything_but_tail(self, rng):
        """Two IDENTICAL prompts (same protein): the second row shares
        every full block and both rows produce identical captions."""
        cfg, params = setup_model()
        b1 = make_shared_batch(cfg, rng, tails=[4], S=9, n_prot=1)
        batch = {k: (v if k == "protein_embeds"
                     else jnp.concatenate([v, v]))
                 for k, v in b1.items()}
        gen = generation.GenerationConfig(
            max_new_tokens=6, method="beam", beam_size=2,
            beam_group_size=1, diversity_penalty=0.5, eos_token_id=2,
            pad_token_id=0)
        toks, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, shared_prefix=True)
        toks = np.asarray(toks)
        np.testing.assert_array_equal(toks[0], toks[1])
        dense_toks, _ = generation.generate_beam(params, cfg, batch, gen)
        np.testing.assert_array_equal(toks, np.asarray(dense_toks))


class TestBeamSession:
    """BeamPoolSession: the cross-batch persistent pool — batches after
    the first hit the cached instruction KV (prefill skipped) on one
    fixed PagedConfig (one compiled program set per run)."""

    def _gen(self, max_new=6, beam=2):
        return generation.GenerationConfig(
            max_new_tokens=max_new, method="beam", beam_size=beam,
            beam_group_size=1, diversity_penalty=0.5, eos_token_id=2,
            pad_token_id=0)

    def test_cross_batch_tokens_match_dense(self, rng):
        """Reusing batch 1's instruction KV must not change one token of
        batch 2 (or batch 1): session == dense on both."""
        cfg, params = setup_model()
        gen = self._gen()
        shared = np.asarray(rng.integers(4, cfg.llama.vocab_size, 9),
                            np.int32)
        b1 = make_shared_batch(cfg, rng, tails=[3, 6], S=9, shared=shared,
                               L_pad=16)
        b2 = make_shared_batch(cfg, rng, tails=[5, 2], S=9, shared=shared,
                               L_pad=16)
        sess = paged_beam.BeamPoolSession(page_size=4)
        t1, s1 = paged_beam.paged_beam_generate(params, cfg, b1, gen,
                                                session=sess)
        t2, s2 = paged_beam.paged_beam_generate(params, cfg, b2, gen,
                                                session=sess)
        d1, _ = generation.generate_beam(params, cfg, b1, gen)
        d2, _ = generation.generate_beam(params, cfg, b2, gen)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(t2), np.asarray(d2))

    def test_second_batch_skips_cached_prefill(self, rng):
        """Batch 2 over the same template: every row resumes past the
        cached full blocks (start = 8 of the 9-token instruction at page
        4) in wave 0 — no within-batch writer to wait for."""
        cfg, params = setup_model()
        gen = self._gen()
        shared = np.asarray(rng.integers(4, cfg.llama.vocab_size, 9),
                            np.int32)
        b1 = make_shared_batch(cfg, rng, tails=[3, 6], S=9, shared=shared,
                               L_pad=16)
        b2 = make_shared_batch(cfg, rng, tails=[4, 2], S=9, shared=shared,
                               L_pad=16)
        sess = paged_beam.BeamPoolSession(page_size=4)
        st1, ctx1 = paged_beam.paged_beam_init(params, cfg, b1, gen,
                                               session=sess)
        # batch 1: row 0 writes the template blocks, row 1 waits a wave
        np.testing.assert_array_equal(ctx1["start"], [0, 8])
        np.testing.assert_array_equal(ctx1["wave"], [0, 1])
        sess.end_batch(ctx1["session_rec"], st1[1])
        st2, ctx2 = paged_beam.paged_beam_init(params, cfg, b2, gen,
                                               session=sess)
        np.testing.assert_array_equal(ctx2["start"], [8, 8])
        np.testing.assert_array_equal(ctx2["wave"], [0, 0])
        sess.end_batch(ctx2["session_rec"], st2[1])

    def test_page_accounting_across_batches(self, rng):
        """After each end_batch every non-cached page is back on the
        free list and every cached page sits at ref 0 (evictable)."""
        cfg, params = setup_model()
        gen = self._gen()
        shared = np.asarray(rng.integers(4, cfg.llama.vocab_size, 9),
                            np.int32)
        sess = paged_beam.BeamPoolSession(page_size=4)
        for k in range(3):
            b = make_shared_batch(cfg, rng, tails=[3 + k, 6 - k], S=9,
                                  shared=shared, L_pad=16)
            paged_beam.paged_beam_generate(params, cfg, b, gen,
                                           session=sess)
            cached = len(sess.cache.meta)
            assert len(sess.free) == sess.pcfg.n_pages - 1 - cached
            assert all(m["ref"] == 0 for m in sess.cache.meta.values())
        # the template's two full blocks cached ONCE, plus each batch's
        # two row-specific full blocks (cached so a recurring protein
        # would hit; evictable at ref 0): 2 + 2 x 3 batches
        assert cached == 8

    def test_new_template_evicts_old(self, rng):
        """A template change mid-run: the old cached blocks are LRU-
        evicted when the pool needs their pages, and tokens stay equal
        to the dense path."""
        cfg, params = setup_model()
        gen = self._gen()
        sess = paged_beam.BeamPoolSession(page_size=4, cache_pages=0)
        outs = []
        batches = []
        for k in range(3):  # three DIFFERENT templates, zero cache slack
            b = make_shared_batch(cfg, rng, tails=[3, 6], S=9, L_pad=16)
            batches.append(b)
            t, _ = paged_beam.paged_beam_generate(params, cfg, b, gen,
                                                  session=sess)
            outs.append(np.asarray(t))
        assert sess.cache.stats["evicted"] >= 2
        for b, t in zip(batches, outs):
            d, _ = generation.generate_beam(params, cfg, b, gen)
            np.testing.assert_array_equal(t, np.asarray(d))

    def test_eval_wrapper_session_matches_dense(self, rng):
        """ProcyonCaptionEval(shared_prefix=True) runs every chunk
        through one persistent session (ragged last chunk padded):
        captions must equal the dense wrapper's."""
        from procyon_tpu.data import collators as C
        from procyon_tpu.data.datasets import SyntheticStore
        from procyon_tpu.data.instruct import TaskLibrary
        from procyon_tpu.data.text_tokenizer import WordTokenizer
        from procyon_tpu.evaluate.procyon_models import ProcyonCaptionEval

        cfg = unified.tiny_config(esm=None, protein_embed_dim=32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = SyntheticStore(n_proteins=8, n_texts=8, embed_dim=32)
        tok = WordTokenizer(cfg.llama.vocab_size)
        task = TaskLibrary().get("uniprot_all_caption")
        gcfg = generation.GenerationConfig(
            max_new_tokens=6, method="beam", beam_size=2,
            beam_group_size=1, diversity_penalty=0.5,
            eos_token_id=tok.spec.eos_id, pad_token_id=tok.spec.pad_id)
        kw = dict(batch_size=2, gen=gcfg,
                  collator_cfg=C.CollatorConfig(max_text_len=96,
                                                protein_embed_dim=32))
        dense = ProcyonCaptionEval(params, cfg, tok, store, task, **kw)
        sessioned = ProcyonCaptionEval(params, cfg, tok, store, task,
                                       use_paged=True, page_size=8,
                                       shared_prefix=True, **kw)
        ids = [0, 1, 2, 3, 4]   # 3 chunks; the last is ragged (padded)
        assert dense.get_predictions(ids) == sessioned.get_predictions(ids)
        # chunks 2+ hit the instruction blocks cached by chunk 1
        assert len(sessioned._session.cache.meta) > 0


def make_int8_pool(rng, n_pages=9, L=3, page=8, kd=128, kh=2):
    """A quantize_kv-shaped pool: int8 k/v codes + f32 per-(token, kv-head)
    scale slabs, flat layer-major page rows."""
    return {
        "k": jnp.asarray(rng.integers(-127, 128, (L * n_pages, page, kd)),
                         jnp.int8),
        "v": jnp.asarray(rng.integers(-127, 128, (L * n_pages, page, kd)),
                         jnp.int8),
        "k_scale": jnp.asarray(rng.standard_normal((L * n_pages, page, kh)),
                               jnp.float32),
        "v_scale": jnp.asarray(rng.standard_normal((L * n_pages, page, kh)),
                               jnp.float32),
    }


class TestCopyPagesMatmul:
    def test_matches_scatter_form(self, rng):
        """The one-hot-matmul page move must reproduce the gather+scatter
        semantics bit-exactly (0/1 bf16 weights copy values exactly),
        including repeated sources feeding distinct destinations."""
        pool = {
            "k": jnp.asarray(rng.standard_normal((3 * 9, 4, 8)),
                             jnp.bfloat16),
            "v": jnp.asarray(rng.standard_normal((3 * 9, 4, 8)),
                             jnp.bfloat16),
        }
        src = jnp.asarray([2, 2, 5], jnp.int32)
        dst = jnp.asarray([6, 7, 8], jnp.int32)
        a = paged_beam._copy_pages(pool, 9, src, dst)
        b = paged_beam._copy_pages_matmul(pool, 9, src, dst)
        for key in ("k", "v"):
            np.testing.assert_array_equal(np.asarray(a[key]),
                                          np.asarray(b[key]))

    def test_matmul_form_exact_on_int8_pool(self, rng):
        """ADVICE r3: the f32 one-hot matmul of int8 codes (exact since
        |x| <= 127 is bf16-representable with one nonzero term per output)
        and the f32 gather+scatter scale branch must both reproduce the
        reference scatter form bit-exactly on a quantize_kv pool."""
        pool = make_int8_pool(rng)
        src = jnp.asarray([2, 2, 5], jnp.int32)
        dst = jnp.asarray([6, 7, 8], jnp.int32)
        a = paged_beam._copy_pages(pool, 9, src, dst)
        b = paged_beam._copy_pages_matmul(pool, 9, src, dst)
        for key in ("k", "v", "k_scale", "v_scale"):
            assert b[key].dtype == pool[key].dtype
            np.testing.assert_array_equal(np.asarray(a[key]),
                                          np.asarray(b[key]))

    def test_direct_kernel_matches_scatter_on_int8_pool(self, rng):
        """ADVICE r3: the direct page-move COW over a quantize_kv pool
        (int8 code pages + f32 scale slabs through move_pages_direct) —
        interpret-mode coverage for the path the TPU kv8 beam takes."""
        pool = make_int8_pool(rng)
        src = jnp.asarray([2, 2, 5], jnp.int32)
        dst = jnp.asarray([6, 7, 8], jnp.int32)
        a = paged_beam._copy_pages(pool, 9, src, dst)
        b = paged_beam._copy_pages_kernel(pool, 9, src, dst,
                                          interpret=True)
        for key in ("k", "v", "k_scale", "v_scale"):
            assert b[key].dtype == pool[key].dtype
            np.testing.assert_array_equal(np.asarray(a[key]),
                                          np.asarray(b[key]))

    def test_staged_kernel_handles_chains(self, rng):
        """ops/page_move.move_pages (the STAGED kernel) must reproduce
        the functional semantics: every dst receives the OLD content of
        its src, even when one page is simultaneously another move's
        source and its own destination (reorder chains). NOTE: interpret
        mode simulates aliasing with a copy, so it cannot catch a
        chain-unsafe implementation — this test documents the staged
        kernel's contract; the wired direct kernel is covered by the
        disjointness tests below."""
        from procyon_tpu.ops import page_move

        arr = jnp.asarray(rng.standard_normal((27, 8, 128)), jnp.bfloat16)
        src = np.asarray([2, 2, 5], np.int32)
        dst = np.asarray([6, 7, 2], np.int32)  # 2 is src AND dst
        ref = np.array(arr)
        ref[dst] = np.array(arr)[src]
        got = page_move.move_pages(arr, jnp.asarray(src), jnp.asarray(dst),
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_direct_kernel_matches_scatter_on_disjoint_sets(self, rng):
        """_copy_pages_kernel (move_pages_direct) == the XLA scatter form
        for disjoint src/dst — the only regime the beam plan produces
        (ping-pong phases)."""
        pool = {
            "k": jnp.asarray(rng.standard_normal((3 * 9, 8, 128)),
                             jnp.bfloat16),
            "v": jnp.asarray(rng.standard_normal((3 * 9, 8, 128)),
                             jnp.bfloat16),
        }
        src = jnp.asarray([2, 2, 5], jnp.int32)
        dst = jnp.asarray([6, 7, 8], jnp.int32)
        a = paged_beam._copy_pages(pool, 9, src, dst)
        b = paged_beam._copy_pages_kernel(pool, 9, src, dst,
                                          interpret=True)
        for key in ("k", "v"):
            np.testing.assert_array_equal(np.asarray(a[key]),
                                          np.asarray(b[key]))

    def test_pingpong_plan_src_dst_always_disjoint(self, rng):
        """The load-bearing invariant behind the direct (stage-free) COW:
        at every step, the set of copy SOURCES (parent tables' current
        pages, under ANY parent assignment) and the set of DESTINATIONS
        (each slot's phase-t%2 private page) must be disjoint — on real
        hardware an overlap would let one slot's in-place write race
        another's read (interpret mode cannot catch it)."""
        cfg, params = setup_model()
        lens = [9, 12, 16]  # mixed alignment vs page_size 8
        beam, max_new, P = 4, 11, 8
        pcfg = paged_beam.plan_pool_config(cfg.llama, lens, beam, max_new,
                                           page_size=P)
        plan = paged_beam._plan_pages(pcfg, lens, beam, max_new)
        tables = paged_beam._beam_tables(plan, pcfg, beam)
        slots = len(lens) * beam
        seq_len = np.repeat(np.asarray(lens), beam)
        g0_slot = np.repeat(plan.g0, beam)
        rng2 = np.random.default_rng(7)
        for t in range(max_new):
            phase = t % 2
            cur = seq_len // P
            # adversarial parents: any slot may adopt any same-prompt row
            parent = np.concatenate([
                rng2.integers(0, beam, beam) + r * beam
                for r in range(len(lens))])
            parent_table = tables[parent]
            src = parent_table[np.arange(slots), cur]
            own = plan.private[np.arange(slots)[:, None],
                               np.clip(cur[:, None] - g0_slot[:, None], 0,
                                       plan.private.shape[1] - 1),
                               phase][:, 0]
            assert not set(src.tolist()) & set(own.tolist()), (t, src, own)
            # apply the table update like paged_beam_step
            idx = np.arange(pcfg.max_pages_per_seq)[None, :]
            priv_cols = np.clip(idx - g0_slot[:, None], 0,
                                plan.private.shape[1] - 1)
            own_pages = plan.private[np.arange(slots)[:, None], priv_cols,
                                     phase]
            tables = np.where(idx >= cur[:, None], own_pages, parent_table)
            seq_len = seq_len + 1


class TestCascadeDecode:
    """Grouped-prefix cascade decode attention
    (llama._cascade_decode_attention, wired by paged_beam_step's
    cascade_pages): the prompt's immutable full pages are gathered once
    per beam GROUP (all beams of a prompt share them) and merged with
    each slot's private tail by softmax statistics — at the flagship
    caption shape this removes ~77% of the per-layer KV gather reads.
    Mathematically identical to the single-pass gather path; these
    tests pin CPU-f32 token equality across every pool flavor."""

    def _gen(self, n=9):
        return generation.GenerationConfig(
            max_new_tokens=n, method="beam", beam_size=4,
            beam_group_size=2, diversity_penalty=0.8, eos_token_id=2,
            pad_token_id=0)

    def test_matches_plain_and_dense(self, rng):
        """Ragged prompt lengths (distinct g0 per group) — cascade ==
        plain paged == dense tokens."""
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=3, L=21)
        gen = self._gen()
        dense_toks, dense_scores = generation.generate_beam(
            params, cfg, batch, gen)
        casc_toks, casc_scores = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, cascade=True)
        np.testing.assert_array_equal(np.asarray(casc_toks),
                                      np.asarray(dense_toks))
        np.testing.assert_allclose(np.asarray(casc_scores),
                                   np.asarray(dense_scores), atol=1e-4)

    def test_fully_masked_prefix_row(self, rng):
        """A row shorter than one page has g0 == 0: its group's prefix
        segment is fully masked and the merge weight must underflow to
        exact zero (no NaN, no contribution)."""
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=2, L=9)   # lens 9 and 6
        gen = self._gen(n=6)
        plain, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=8, cascade=False)
        casc, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=8, cascade=True)
        np.testing.assert_array_equal(np.asarray(casc),
                                      np.asarray(plain))

    def test_kv8_pool(self, rng):
        """int8-KV pool: the factored scale algebra (K scale on score
        rows, V scale folded pre-normalization) must survive the
        two-segment merge bit-for-bit vs the single-pass kv8 path."""
        cfg, params = setup_model()
        batch = make_soft_batch(cfg, rng, B=2, L=16)
        gen = self._gen(n=7)
        plain, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, quantize_kv=True,
            cascade=False)
        casc, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, quantize_kv=True,
            cascade=True)
        np.testing.assert_array_equal(np.asarray(casc),
                                      np.asarray(plain))

    def test_shared_prefix_composes(self, rng):
        """shared_prefix dedup + cascade: groups whose prefix pages
        alias OTHER rows' pages gather them once per group all the
        same."""
        cfg, params = setup_model()
        shared = np.asarray(rng.integers(4, cfg.llama.vocab_size, 9),
                            np.int32)
        batch = make_shared_batch(cfg, rng, tails=[3, 6, 5], S=9,
                                  shared=shared)
        gen = self._gen(n=6)
        plain, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, shared_prefix=True,
            cascade=False)
        casc, _ = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, shared_prefix=True,
            cascade=True)
        np.testing.assert_array_equal(np.asarray(casc),
                                      np.asarray(plain))

    def test_session_composes(self, rng):
        """BeamPoolSession + cascade: the session's fixed prefix width
        (max_prompt bound, not the batch's g0 max) keeps ONE compiled
        step program across batches; tokens == dense on every batch."""
        cfg, params = setup_model()
        gen = generation.GenerationConfig(
            max_new_tokens=6, method="beam", beam_size=2,
            beam_group_size=1, diversity_penalty=0.5, eos_token_id=2,
            pad_token_id=0)
        shared = np.asarray(rng.integers(4, cfg.llama.vocab_size, 9),
                            np.int32)
        b1 = make_shared_batch(cfg, rng, tails=[3, 6], S=9, shared=shared,
                               L_pad=16)
        b2 = make_shared_batch(cfg, rng, tails=[5, 2], S=9, shared=shared,
                               L_pad=16)
        sess = paged_beam.BeamPoolSession(page_size=4)
        t1, _ = paged_beam.paged_beam_generate(params, cfg, b1, gen,
                                               session=sess, cascade=True)
        step1 = sess._step
        t2, _ = paged_beam.paged_beam_generate(params, cfg, b2, gen,
                                               session=sess, cascade=True)
        assert sess._step is step1, "cascade widths must be session-stable"
        d1, _ = generation.generate_beam(params, cfg, b1, gen)
        d2, _ = generation.generate_beam(params, cfg, b2, gen)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(t2), np.asarray(d2))
