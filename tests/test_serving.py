"""Paged KV pool + continuous batching (inference/kv_pool.py, serving.py).

Correctness bar: paged decode must equal the dense kv_cache path exactly,
and batched/staggered serving must produce the same greedy outputs as
serving each request alone.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procyon_tpu.inference import kv_pool as KP
from procyon_tpu.inference.serving import ContinuousBatcher
from procyon_tpu.models import llama as L


@pytest.fixture(scope="module")
def model():
    cfg = L.tiny_config(attn_backend="ref", remat=False)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _pcfg(cfg, **kw):
    base = dict(n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
                head_dim=cfg.head_dim, page_size=4, n_pages=64,
                max_pages_per_seq=12, slots=3, dtype=cfg.dtype)
    base.update(kw)
    return KP.PagedConfig(**base)


class TestPagedForward:
    def test_matches_dense_prefill_and_decode(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg)
        pool = KP.init_pool(pcfg)
        alloc = KP.PageAllocator(pcfg)
        B, T = 2, 9
        tokens = (jnp.arange(B * T).reshape(B, T) * 7) % cfg.vocab_size
        full = L.forward(params, cfg, tokens=tokens)["logits"]
        slots = np.array([1, 2])
        pt = np.array(pool["page_table"])
        for s in slots:
            pages = alloc.allocate(int(s), T + 2)
            pt[s, :len(pages)] = pages
        pool = {**pool, "page_table": jnp.asarray(pt)}
        logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                       jnp.asarray(slots),
                                       tokens=tokens[:, :5])
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, :5]),
                                   atol=2e-4, rtol=2e-4)
        for t in range(5, T):
            logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                           jnp.asarray(slots),
                                           tokens=tokens[:, t:t + 1])
            np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                       np.asarray(full[:, t]),
                                       atol=2e-4, rtol=2e-4)
        assert list(np.asarray(pool["seq_len"])) == [0, 9, 9]

    def test_allocator_reuse_and_exhaustion(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, n_pages=8)
        alloc = KP.PageAllocator(pcfg)
        p1 = alloc.allocate(0, 20)          # 5 pages of the 7 free
        assert not alloc.can_admit(12)      # 3 pages needed, 2 free
        with pytest.raises(MemoryError):
            alloc.allocate(1, 20)
        alloc.release(0)
        assert alloc.can_admit(20)
        p2 = alloc.allocate(1, 20)
        assert set(p2) == set(p1)           # pages recycled


def _solo(cfg, params, pcfg, prompt, max_new):
    b = ContinuousBatcher(params, cfg, pcfg)
    rid = b.submit(prompt, max_new=max_new)
    return b.run()[rid]


class TestContinuousBatching:
    def test_batched_equals_solo(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg)
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (5, 11, 3)]
        solo = [_solo(cfg, params, pcfg, p, 6) for p in prompts]
        b = ContinuousBatcher(params, cfg, pcfg)
        rids = [b.submit(p, max_new=6) for p in prompts]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want, (rid, out[rid], want)

    def test_staggered_admission(self, model):
        """More requests than slots: later requests admit as slots free,
        and page recycling must not corrupt live sequences."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=16)
        rng = np.random.default_rng(1)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (7, 4, 9, 5)]
        lens = [3, 8, 5, 4]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg)
        rids = [b.submit(p, max_new=m) for p, m in zip(prompts, lens)]
        out = b.run()
        assert len(out) == 4
        for rid, want in zip(rids, solo):
            assert out[rid] == want, (rid, out[rid], want)

    def test_eos_stops_early(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg)
        b = ContinuousBatcher(params, cfg, pcfg)
        # find the greedy first token, then use it as "eos"
        probe = _solo(cfg, params, pcfg, [5, 6, 7], 1)
        rid = b.submit([5, 6, 7], max_new=16, eos_id=probe[0])
        out = b.run()
        assert out[rid][-1] == probe[0] and len(out[rid]) == 1

    @pytest.mark.parametrize("quantum", [2, 4])
    def test_step_quantum_equals_solo(self, model, quantum):
        """step_quantum > 1 (K-token jitted decode rounds, one host
        readback per round) must produce exactly the per-token outputs:
        surplus in-round tokens after EOS/max_new are dropped host-side
        and never corrupt another request."""
        cfg, params = model
        pcfg = _pcfg(cfg)
        rng = np.random.default_rng(3)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (5, 11, 3)]
        lens = [6, 5, 7]                    # deliberately not % quantum
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=quantum)
        rids = [b.submit(p, max_new=m) for p, m in zip(prompts, lens)]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want, (rid, out[rid], want)

    def test_churn_mid_flight_equals_isolated(self, model):
        """VERDICT r3 #1 soak criterion: requests joining and leaving
        mid-flight (driven tick by tick, submissions between ticks) give
        results equal to isolated runs."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=32)
        rng = np.random.default_rng(7)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (6, 4, 9, 5, 7)]
        lens = [4, 9, 3, 6, 5]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg)
        # arrival schedule: submit request i after `arrive[i]` ticks
        arrive = [0, 0, 2, 3, 6]
        rids = {}
        ticks = 0
        while len(b.done) < len(prompts) or any(
                i not in rids for i in range(len(prompts))):
            for i, at in enumerate(arrive):
                if at == ticks and i not in rids:
                    rids[i] = b.submit(prompts[i], max_new=lens[i])
            b.tick()
            ticks += 1
            assert ticks < 200, "serving loop did not converge"
        for i, want in enumerate(solo):
            assert b.done[rids[i]] == want, (i, b.done[rids[i]], want)

    def test_soak_many_requests_small_pool(self, model):
        """Soak: 5x more requests than slots through a small pool with
        step_quantum rounds; every request completes with its solo
        output and the allocator ends empty."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=24)
        rng = np.random.default_rng(11)
        prompts = [list(rng.integers(4, cfg.vocab_size,
                                     int(rng.integers(3, 12))))
                   for _ in range(10)]
        lens = [int(rng.integers(2, 8)) for _ in range(10)]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=3)
        rids = [b.submit(p, max_new=m) for p, m in zip(prompts, lens)]
        out = b.run()
        assert len(out) == 10
        for rid, want in zip(rids, solo):
            assert out[rid] == want
        assert not b.live and not b.queue
        assert len(b.alloc.free) == pcfg.n_pages - 1  # all pages returned

    def test_oversized_request_rejected(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, max_pages_per_seq=2)   # max_ctx = 8
        b = ContinuousBatcher(params, cfg, pcfg)
        b.submit(list(range(4, 10)), max_new=8)
        with pytest.raises(ValueError):
            b.run()


class TestPagedKernelDecode:
    """The Pallas page-table decode kernel (ops/paged_attention.py) must
    equal the gather+dense decode path exactly (VERDICT round-1 item #8:
    replace the plain-jnp pool gather on the decode hot path)."""

    def test_kernel_matches_gather_path(self):
        import dataclasses

        cfg = L.tiny_config(attn_backend="ref", remat=False, dim=256,
                            n_heads=4, n_kv_heads=2, intermediate=512,
                            vocab_size=512)
        params = L.init_params(jax.random.PRNGKey(2), cfg)
        pcfg = _pcfg(cfg)
        B, T = 2, 6
        tokens = (jnp.arange(B * T).reshape(B, T) * 11) % cfg.vocab_size

        def run(decode_cfg):
            pool = KP.init_pool(pcfg)
            alloc = KP.PageAllocator(pcfg)
            slots = np.array([0, 2])
            pt = np.array(pool["page_table"])
            for s in slots:
                pages = alloc.allocate(int(s), T + 4)
                pt[s, :len(pages)] = pages
            pool = {**pool, "page_table": jnp.asarray(pt)}
            logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                           jnp.asarray(slots),
                                           tokens=tokens[:, :4])
            outs = [logits[:, -1]]
            for t in range(4, T):
                logits, pool = L.paged_forward(
                    params, decode_cfg, pool, pcfg, jnp.asarray(slots),
                    tokens=tokens[:, t:t + 1])
                outs.append(logits[:, 0])
            return np.stack([np.asarray(o) for o in outs])

        ref = run(cfg)                               # gather + dense
        kern = run(dataclasses.replace(cfg, attn_backend="interpret"))
        np.testing.assert_allclose(kern, ref, atol=2e-4, rtol=2e-4)

    def test_q8_kernel_matches_gather_path(self):
        """int8-KV pools: the q8 page-walk kernel (in-walk scale algebra)
        must equal the s8 gather + _decode_attention_step path."""
        import dataclasses

        cfg = L.tiny_config(attn_backend="ref", remat=False, dim=256,
                            n_heads=4, n_kv_heads=2, intermediate=512,
                            vocab_size=512)
        params = L.init_params(jax.random.PRNGKey(3), cfg)
        pcfg = _pcfg(cfg, quantize_kv=True)
        B, T = 2, 7
        tokens = (jnp.arange(B * T).reshape(B, T) * 13) % cfg.vocab_size

        def run(decode_cfg):
            pool = KP.init_pool(pcfg)
            alloc = KP.PageAllocator(pcfg)
            slots = np.array([0, 2])
            pt = np.array(pool["page_table"])
            for s in slots:
                pages = alloc.allocate(int(s), T + 4)
                pt[s, :len(pages)] = pages
            pool = {**pool, "page_table": jnp.asarray(pt)}
            logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                           jnp.asarray(slots),
                                           tokens=tokens[:, :4])
            outs = [logits[:, -1]]
            for t in range(4, T):
                logits, pool = L.paged_forward(
                    params, decode_cfg, pool, pcfg, jnp.asarray(slots),
                    tokens=tokens[:, t:t + 1])
                outs.append(logits[:, 0])
            return np.stack([np.asarray(o) for o in outs])

        ref = run(cfg)                               # s8 gather + dense
        kern = run(dataclasses.replace(cfg, attn_backend="interpret"))
        np.testing.assert_allclose(kern, ref, atol=5e-4, rtol=5e-4)

    def test_kernel_lane_gate(self):
        # group*head_dim not 128-divisible -> gather fallback (no crash)
        import dataclasses

        cfg = L.tiny_config(attn_backend="ref", remat=False)
        params = L.init_params(jax.random.PRNGKey(0), cfg)
        pcfg = _pcfg(cfg)
        pool = KP.init_pool(pcfg)
        alloc = KP.PageAllocator(pcfg)
        pt = np.array(pool["page_table"])
        pages = alloc.allocate(0, 8)
        pt[0, :len(pages)] = pages
        pool = {**pool, "page_table": jnp.asarray(pt)}
        logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                       jnp.asarray([0]),
                                       tokens=jnp.asarray([[5, 6]]))
        # decode step with the kernel-enabled backend: lane gate (32
        # lanes per group) forces the gather path silently
        dcfg = dataclasses.replace(cfg, attn_backend="interpret")
        logits, pool = L.paged_forward(params, dcfg, pool, pcfg,
                                       jnp.asarray([0]),
                                       tokens=jnp.asarray([[7]]))
        assert np.isfinite(np.asarray(logits)).all()


class TestQuantizedKVPool:
    def test_int8_kv_decode_close_to_fp_pool(self, model):
        """quantize_kv=True stores int8 K/V with per-(token, head)
        scales; decode logits must track the full-precision pool within
        int8-KV quantization noise (the scale corrections are exact
        algebra — see _decode_attention_step — so the only error is the
        int8 rounding of the cached rows)."""
        import dataclasses

        cfg, params = model
        B, T, n_new = 2, 9, 4
        tokens = (jnp.arange(B * (T + n_new)).reshape(B, T + n_new)
                  * 7) % cfg.vocab_size

        def run(quantize_kv):
            pcfg = dataclasses.replace(_pcfg(cfg), quantize_kv=quantize_kv)
            pool = KP.init_pool(pcfg)
            alloc = KP.PageAllocator(pcfg)
            slots = np.array([0, 1])
            pt = np.array(pool["page_table"])
            for s in slots:
                pages = alloc.allocate(int(s), T + n_new + 2)
                pt[s, :len(pages)] = pages
            pool = {**pool, "page_table": jnp.asarray(pt)}
            logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                           jnp.asarray(slots),
                                           tokens=tokens[:, :T])
            outs = [np.asarray(logits[:, -1])]
            for t in range(T, T + n_new):
                logits, pool = L.paged_forward(
                    params, cfg, pool, pcfg, jnp.asarray(slots),
                    tokens=tokens[:, t:t + 1])
                outs.append(np.asarray(logits[:, 0]))
            return np.stack(outs)

        fp = run(False)
        q8 = run(True)
        # the scale algebra itself is exact to f32 roundoff (verified
        # directly against an explicitly dequantized cache: 2e-7); what
        # remains is int8 rounding of cached rows (~0.5% per step)
        # AMPLIFIED through this chaotic random-weight 2-layer model —
        # bound the magnitude loosely and gate on ranking survival
        err = np.abs(fp - q8).max()
        scale = np.abs(fp).max()
        assert err < 0.12 * scale, (err, scale)
        assert (fp.argmax(-1) == q8.argmax(-1)).mean() > 0.9

    def test_int8_kv_paged_beam_runs(self, rng):
        """Beam generation over a quantized pool: ping-pong COW moves the
        scale arrays too; tokens are finite and the run completes."""
        from procyon_tpu.inference import generation, paged_beam
        from procyon_tpu.models import unified

        cfg = unified.tiny_config(esm=None, protein_embed_dim=16)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        B, Lp = 2, 12
        batch = {
            "input_ids": jnp.asarray(
                rng.integers(4, cfg.llama.vocab_size, (B, Lp)), jnp.int32),
            "seg_ids": jnp.ones((B, Lp), jnp.int32),
            "positions": jnp.broadcast_to(
                jnp.arange(Lp, dtype=jnp.int32), (B, Lp)),
            "soft_map": jnp.full((B, Lp), -1, jnp.int32),
            "protein_embeds": jnp.asarray(
                rng.standard_normal((2, cfg.encoder_out_dim)), jnp.float32),
        }
        gen = generation.GenerationConfig(
            max_new_tokens=7, method="beam", beam_size=4, beam_group_size=2,
            diversity_penalty=0.8, eos_token_id=2, pad_token_id=0)
        toks, scores = paged_beam.paged_beam_generate(
            params, cfg, batch, gen, page_size=4, quantize_kv=True)
        assert toks.shape == (B, 4, 7)
        assert np.isfinite(np.asarray(scores)).all()


class TestChunkedPrefill:
    def test_chunked_equals_bucketed(self, model):
        """prefill_chunk=C (fixed-shape [1, C] continuation forwards,
        one compile for all prompt lengths) must emit exactly the
        bucketed-prefill greedy tokens — prompt lengths off and on the
        chunk boundary, token and fused prompts."""
        cfg, params = model
        pcfg = _pcfg(cfg)
        rng = np.random.default_rng(23)
        # 8 = exactly 2 chunks of 4; 3 < one chunk; 9/5 ragged tails
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (8, 3, 9, 5)]
        lens = [6, 7, 4, 5]

        e = rng.standard_normal((7, cfg.dim)).astype(np.float32) * 0.3

        def run(chunk):
            b = ContinuousBatcher(params, cfg, pcfg, prefill_chunk=chunk)
            rids = [b.submit(p, max_new=m)
                    for p, m in zip(prompts, lens)]
            rids.append(b.submit_fused(e, max_new=5))
            out = b.run()
            return [out[r] for r in rids]

        assert run(4) == run(None)

    def test_single_compiled_prefill_program(self, model):
        """Chunked mode must reuse ONE prefill jit per prompt kind no
        matter the mix of prompt lengths (the point: a 20s-10min remote
        compile per bucket collapses to one)."""
        cfg, params = model
        b = ContinuousBatcher(params, cfg, _pcfg(cfg), prefill_chunk=4)
        rng = np.random.default_rng(29)
        for n in (3, 8, 11, 2):
            b.submit(list(rng.integers(4, cfg.vocab_size, n)), max_new=3)
        b.run()
        assert set(b._prefills) == {(4, False)}


class TestAsyncRounds:
    """async_rounds=True: round k+1 dispatches from the device pending
    array before round k's readback. Greedy outputs must be exactly the
    synchronous batcher's; finishes discovered one round late must never
    leak tokens into a reused slot's new request."""

    @pytest.mark.parametrize("quantum", [1, 3])
    def test_async_equals_sync(self, model, quantum):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=32)
        rng = np.random.default_rng(103)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (6, 4, 9, 5, 7)]
        lens = [4, 9, 3, 6, 5]

        def run(async_rounds):
            b = ContinuousBatcher(params, cfg, pcfg,
                                  step_quantum=quantum,
                                  async_rounds=async_rounds)
            rids = [b.submit(p, max_new=m)
                    for p, m in zip(prompts, lens)]
            out = b.run()
            return [out[r] for r in rids]

        assert run(True) == run(False)

    def test_async_equals_sync_kv8(self, model):
        """Composition gap check: the pipelined-readback round over an
        int8-quantized pool (quantize_kv dequant algebra inside the
        decode program) must emit exactly the synchronous kv8 tokens —
        same-program comparison, so exact even on quantized numerics."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=32, quantize_kv=True)
        rng = np.random.default_rng(104)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (6, 4, 9)]
        lens = [5, 8, 4]

        def run(async_rounds):
            b = ContinuousBatcher(params, cfg, pcfg, step_quantum=2,
                                  async_rounds=async_rounds)
            rids = [b.submit(p, max_new=m)
                    for p, m in zip(prompts, lens)]
            out = b.run()
            return [out[r] for r in rids]

        assert run(True) == run(False)

    def test_async_churn_and_slot_reuse(self, model):
        """Staggered arrivals through 1 slot: every reuse crosses an
        in-flight garbage round; the rid snapshot must drop it."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=1, n_pages=24)
        rng = np.random.default_rng(107)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (5, 8, 3, 6)]
        lens = [3, 5, 7, 4]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=2,
                              async_rounds=True)
        rids = {}
        ticks = 0
        while len(b.done) < 4 or any(i not in rids for i in range(4)):
            for i in range(4):
                if i * 2 == ticks and i not in rids:
                    rids[i] = b.submit(prompts[i], max_new=lens[i])
            b.tick()
            ticks += 1
            assert ticks < 300
        for i, want in enumerate(solo):
            assert b.done[rids[i]] == want, (i, b.done[rids[i]], want)
        assert not b._inflight or not b.live

    def test_async_composes_with_wave_and_prefix(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=48)
        rng = np.random.default_rng(109)
        prefix = list(rng.integers(4, cfg.vocab_size, 9))
        prompts = [prefix + list(rng.integers(4, cfg.vocab_size, t))
                   for t in (4, 7, 3)]
        solo = [_solo(cfg, params, pcfg, p, 5) for p in prompts]
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=2,
                              async_rounds=True, prefix_cache=True,
                              prefill_chunk=4, prefill_batch=2)
        rids = [b.submit(p, max_new=5) for p in prompts]
        out = b.run()
        assert [out[r] for r in rids] == solo

    def test_async_eos_stops_early(self, model):
        """EOS under async: the finish is discovered one round late but
        the emitted tokens still stop AT the eos token."""
        cfg, params = model
        pcfg = _pcfg(cfg)
        probe = _solo(cfg, params, pcfg, [5, 6, 7], 1)
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=2,
                              async_rounds=True)
        rid = b.submit([5, 6, 7], max_new=16, eos_id=probe[0])
        out = b.run()
        assert out[rid][-1] == probe[0] and len(out[rid]) == 1

    def test_async_rejects_temperature_and_spec(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg)
        with pytest.raises(ValueError):
            ContinuousBatcher(params, cfg, pcfg, async_rounds=True,
                              temperature=0.5)
        with pytest.raises(ValueError):
            ContinuousBatcher(params, cfg, pcfg, async_rounds=True,
                              spec_k=2)


class TestBatchedWavePrefill:
    """prefill_batch=W: chunks of up to W different admissions share one
    [W, C] forward (per-row slots/segs on the paged pool). Greedy tokens
    must equal the sequential chunked path exactly."""

    def test_wave_equals_sequential(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=4, n_pages=64)
        rng = np.random.default_rng(83)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (9, 3, 12, 5)]
        lens = [5, 6, 4, 5]
        e = rng.standard_normal((10, cfg.dim)).astype(np.float32) * 0.3

        def run(batch):
            b = ContinuousBatcher(params, cfg, pcfg, prefill_chunk=4,
                                  prefill_batch=batch)
            rids = [b.submit(p, max_new=m)
                    for p, m in zip(prompts, lens)]
            rids.append(b.submit_fused(e, max_new=5))
            out = b.run()
            return [out[r] for r in rids]

        assert run(3) == run(1)

    def test_wave_bounded_program_set(self, model):
        """Wave prefill compiles at most log2(W)+1 width buckets per
        prompt kind (powers of two up to prefill_batch) — small waves
        must not pay a full-width padded forward."""
        cfg, params = model
        b = ContinuousBatcher(params, cfg, _pcfg(cfg, slots=4),
                              prefill_chunk=4, prefill_batch=4)
        rng = np.random.default_rng(89)
        for n in (3, 9, 12, 2):
            b.submit(list(rng.integers(4, cfg.vocab_size, n)), max_new=3)
        b.run()
        assert all(k[0] == "wave" and k[2] is False and k[1] in (1, 2, 4)
                   for k in b._prefills), set(b._prefills)
        # a lone late request must take the width-1 program
        b.submit(list(rng.integers(4, cfg.vocab_size, 6)), max_new=3)
        b.run()
        assert ("wave", 1, False) in b._prefills

    def test_wave_with_prefix_cache_same_wave_duplicates(self, model):
        """Two identical prompts admitted in ONE wave: promotion is
        deferred past the wave's dispatches, so the second request must
        prefill privately (no read of not-yet-written pages) and still
        match its solo output; a third request in a LATER wave hits."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=48)
        rng = np.random.default_rng(97)
        prompt = list(rng.integers(4, cfg.vocab_size, 11))
        want = _solo(cfg, params, pcfg, prompt, 4)
        b = ContinuousBatcher(params, cfg, pcfg, prefill_chunk=4,
                              prefill_batch=2, prefix_cache=True)
        r = [b.submit(prompt, max_new=4) for _ in range(3)]
        out = b.run()
        assert [out[x] for x in r] == [want] * 3
        assert b.pcache.stats["hit_tokens"] > 0

    def test_wave_with_experts_and_quantum(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=3)
        rng = np.random.default_rng(101)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (7, 5, 10)]
        solo = [_solo(cfg, params, pcfg, p, 5) for p in prompts]
        b = ContinuousBatcher(params, cfg, pcfg, prefill_chunk=4,
                              prefill_batch=3, step_quantum=2)
        rids = [b.submit(p, max_new=5) for p in prompts]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want


class TestPrefixCache:
    """Automatic prefix caching (kv_pool.PrefixCache + serving wiring):
    page-aligned prompt blocks are shared across requests by content
    hash; prefill skips the shared region and shared pages cost no pool
    budget. Correctness bar: cached outputs equal uncached outputs
    exactly (CPU f32), page accounting never leaks, and sharing admits
    workloads a private-only pool cannot."""

    def _shared_prompts(self, cfg, rng, prefix_len=13, tails=(4, 7, 2, 5)):
        prefix = list(rng.integers(4, cfg.vocab_size, prefix_len))
        return [prefix + list(rng.integers(4, cfg.vocab_size, t))
                for t in tails]

    @pytest.mark.parametrize("chunk", [None, 4])
    def test_cached_equals_uncached(self, model, chunk):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=48)
        rng = np.random.default_rng(41)
        # page_size=4: a 13-token shared prefix = 3 shareable full blocks
        prompts = self._shared_prompts(cfg, rng)
        lens = [5, 3, 6, 4]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True,
                              prefill_chunk=chunk)
        rids = [b.submit(p, max_new=m) for p, m in zip(prompts, lens)]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want, (rid, out[rid], want)
        # later requests must actually have hit the cached prefix
        assert b.pcache.stats["hit_tokens"] >= 3 * 4 * (len(prompts) - 1)

    def test_fused_prompts_share_prefix(self, model):
        """Fused (soft-token) prompts sharing an instruction-prefix
        embedding block reuse its pages; outputs match uncached runs."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=48)
        rng = np.random.default_rng(43)
        prefix = rng.standard_normal((9, cfg.dim)).astype(np.float32) * .3
        tails = [rng.standard_normal((t, cfg.dim)).astype(np.float32) * .3
                 for t in (3, 6, 2)]
        embeds = [np.concatenate([prefix, t]) for t in tails]

        def run(cache):
            b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=cache)
            rids = [b.submit_fused(e, max_new=5) for e in embeds]
            out = b.run()
            return [out[r] for r in rids], b

        want, _ = run(False)
        got, b = run(True)
        assert got == want
        # 9-row prefix = 2 full pages shared by requests 2 and 3
        assert b.pcache.stats["hit_tokens"] == 2 * 4 * 2

    def test_kv8_pool_shares_scales(self, model):
        """int8-KV pools share quantized pages AND their scale slabs
        through the same page ids; cached == uncached."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=48, quantize_kv=True)
        rng = np.random.default_rng(47)
        prompts = self._shared_prompts(cfg, rng)
        lens = [4, 5, 3, 6]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True)
        rids = [b.submit(p, max_new=m) for p, m in zip(prompts, lens)]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want

    def test_speculative_over_cached_prefix(self, model):
        """spec_k decode on top of a cache-hit prefix stays exact (the
        verify writes land past the prompt, never on shared pages)."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=48)
        rng = np.random.default_rng(53)
        prompts = self._shared_prompts(cfg, rng, tails=(4, 6))
        lens = [6, 7]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]
        b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True,
                              spec_k=3)
        rids = [b.submit(p, max_new=m) for p, m in zip(prompts, lens)]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want

    def test_page_accounting_and_eviction(self, model):
        """Soak through a small pool: cached pages evict LRU when
        admission needs them, refcounts gate eviction, and after the
        drain every page is either free or idle-cached (none leaked)."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=12, max_pages_per_seq=6)
        rng = np.random.default_rng(59)
        # three distinct 2-block prefixes x two tails each: the 12-page
        # pool cannot hold all three prefix chains + live tails at once
        outs = {}
        b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True)
        reqs = []
        for _ in range(3):
            prefix = list(rng.integers(4, cfg.vocab_size, 9))
            for t in (3, 5):
                p = prefix + list(rng.integers(4, cfg.vocab_size, t))
                reqs.append((p, 4))
        solo = [_solo(cfg, params, pcfg, p, m) for p, m in reqs]
        rids = [b.submit(p, max_new=m) for p, m in reqs]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want
        assert not b.live and not b.queue
        cached = len(b.pcache.meta)
        assert all(m["ref"] == 0 for m in b.pcache.meta.values())
        assert len(b.alloc.free) + cached == pcfg.n_pages - 1
        assert b.pcache.stats["evicted"] > 0 or cached <= 6

    def test_prefix_cache_unit_eviction_order_and_orphans(self):
        """PrefixCache bookkeeping without a model: LRU eviction skips
        referenced pages, evicting a middle block orphans (but keeps
        evictable) its chain tail, and stats count evictions."""
        pc = KP.PrefixCache(page_size=4)
        digests = [bytes([i]) * 16 for i in range(3)]
        _, keys = pc.match(digests)
        for k, page in zip(keys, (10, 11, 12)):
            assert pc.promote(k, page)
        pc.release([10, 11, 12])               # writer finished: refs 0
        hit, _ = pc.match(digests)
        assert hit == [10, 11, 12]
        pc.acquire([10])                       # a live user of block 0
        assert pc.evict(1) == [11]             # LRU zero-ref: middle
        # chain now broken at block 1: match stops before it,
        # the orphan tail (12) stays evictable
        hit, _ = pc.match(digests)
        assert hit == [10]
        assert pc.n_evictable() == 1
        assert pc.evict(5) == [12]             # 10 is referenced: kept
        pc.release([10])
        assert pc.evict(5) == [10]
        assert pc.stats["evicted"] == 3 and not pc.chain and not pc.meta

    def test_sharing_admits_what_private_cannot(self, model):
        """Capacity win: a pool too small to hold two private copies of
        a long prompt serves both when the prefix is shared."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2, n_pages=8, max_pages_per_seq=6)
        rng = np.random.default_rng(61)
        prompt = list(rng.integers(4, cfg.vocab_size, 17))  # 5 pages
        # private: 2 x 5 pages > 7 free pages -> requests serialize
        b0 = ContinuousBatcher(params, cfg, pcfg)
        r0 = [b0.submit(prompt, max_new=3), b0.submit(prompt, max_new=3)]
        b0._admit()
        assert len(b0.live) == 1  # second waits for pages
        out0 = b0.run()
        # shared: 4 prefix pages + 1 private tail each -> both fit live
        b1 = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True)
        r1 = [b1.submit(prompt, max_new=3), b1.submit(prompt, max_new=3)]
        b1._admit()
        assert len(b1.live) == 2  # concurrent under sharing
        out1 = b1.run()
        assert out1[r1[0]] == out1[r1[1]] == out0[r0[0]] == out0[r0[1]]

    def test_eviction_pressure_never_reclaims_matched_pages(self, model):
        """Admission-pressure eviction must not reclaim the zero-ref
        pages the admission itself just matched (ADVICE r4: evict() ran
        before acquire(), popping the matched pages' meta -> KeyError
        mid-run). The matched chain is pinned first, so eviction falls
        on OTHER idle chains and the hit still prefill-skips."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=1, n_pages=8, max_pages_per_seq=8)
        rng = np.random.default_rng(89)
        pa = list(rng.integers(4, cfg.vocab_size, 9))   # 2 full blocks
        pb = list(rng.integers(4, cfg.vocab_size, 9))
        solo = _solo(cfg, params, pcfg, pa, 12)
        b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True)
        b.submit(pa, max_new=3)
        b.submit(pb, max_new=3)
        b.run()                          # caches A then B; all refs 0
        assert len(b.alloc.free) == 3 and len(b.pcache.meta) == 4
        # budget 21 -> 6 pages: 2 matched + 4 private > 3 free, so
        # eviction pressure lands while A's matched pages are the
        # LEAST-recently-used zero-ref victims
        r3 = b.submit(pa, max_new=12)
        out = b.run()
        assert out[r3] == solo
        assert b.pcache.stats["hit_tokens"] >= 8   # the hit survived
        assert b.pcache.stats["evicted"] >= 1      # pressure was real


class TestWasteTelemetry:
    """Round-granularity waste accounting (VERDICT r4 #7): `waste`
    measures decode positions the device computed whose tokens were
    discarded host-side. Invariants asserted here turn the docstring
    bounds (serving.py module docstring + async_rounds comment) into
    checked numbers:
      * every decode round computes exactly K positions per live slot,
        so emitted + dropped is a multiple of K (sync AND async);
      * sync: a finish wastes at most K-1 positions -> dropped <=
        finishes * (K-1);
      * async: finishes are discovered one round late, adding at most
        one K-token garbage round -> dropped <= finishes * (2K-1)."""

    def _short_gen_workload(self, cfg, b, rng, n=6):
        # EOS-heavy churn: generation lengths ~ U[2, K+1] (mean ~ K/2
        # decode tokens after the prefill token — the worst case for
        # round-granularity waste)
        k = b.step_quantum
        rids = []
        for _ in range(n):
            prompt = list(rng.integers(4, cfg.vocab_size, 5))
            rids.append(b.submit(prompt,
                                 max_new=int(rng.integers(2, k + 2))))
        return rids

    def test_sync_waste_bound(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2)
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=4)
        rng = np.random.default_rng(11)
        self._short_gen_workload(cfg, b, rng)
        b.run()
        k, n_fin = 4, len(b.done)
        emitted, dropped = b.waste["emitted"], b.waste["dropped"]
        assert dropped > 0                       # churn makes waste real
        assert dropped <= n_fin * (k - 1)
        assert (emitted + dropped) % k == 0      # K positions/slot-round
        # every kept decode token is counted once (prefill's first token
        # is not a decode position)
        assert emitted == sum(len(v) for v in b.done.values()) - n_fin

    def test_async_waste_bound(self, model):
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2)
        b = ContinuousBatcher(params, cfg, pcfg, step_quantum=4,
                              async_rounds=True)
        rng = np.random.default_rng(11)
        self._short_gen_workload(cfg, b, rng)
        b.run()
        k, n_fin = 4, len(b.done)
        emitted, dropped = b.waste["emitted"], b.waste["dropped"]
        assert dropped > 0
        assert dropped <= n_fin * (2 * k - 1)    # + one garbage round
        assert (emitted + dropped) % k == 0
        assert emitted == sum(len(v) for v in b.done.values()) - n_fin

    def test_async_waste_exceeds_sync_on_churn(self, model):
        """The one-round-late finish discovery is the async mode's real
        cost: on the same EOS-heavy workload async must drop at least as
        many positions as sync (it adds garbage rounds on top of the
        same mid-round surplus) while emitting identical tokens."""
        cfg, params = model
        pcfg = _pcfg(cfg, slots=2)
        outs, waste = [], []
        for async_rounds in (False, True):
            b = ContinuousBatcher(params, cfg, pcfg, step_quantum=4,
                                  async_rounds=async_rounds)
            rng = np.random.default_rng(13)
            self._short_gen_workload(cfg, b, rng)
            outs.append(b.run())
            waste.append(dict(b.waste))
        assert outs[0] == outs[1]                # greedy-exact
        assert waste[1]["emitted"] == waste[0]["emitted"]
        assert waste[1]["dropped"] >= waste[0]["dropped"]


class TestMultiTenantLoRA:
    """Per-request task-LoRA adapter serving: requests tagged with
    different expert-bank indices share one decode batch
    (lora.apply_routed one-hot mixing — the reference can only switch
    adapters globally, procyon/model/mlora.py set_lora_group)."""

    @pytest.fixture(scope="class")
    def lora_model(self):
        from procyon_tpu.models import lora as lora_mod
        cfg = L.tiny_config(
            attn_backend="ref", remat=False,
            lora=lora_mod.LoRAConfig(rank=4, num_experts=3,
                                     dtype=jnp.float32))
        params = L.init_params(jax.random.PRNGKey(5), cfg)
        # distinct nonzero B per expert so adapters actually differ
        rng = np.random.default_rng(67)
        for name in ("lora_wq", "lora_wv"):
            b = params["layers"][name]["B"]
            params["layers"][name]["B"] = jnp.asarray(
                rng.standard_normal(b.shape) * 0.1, b.dtype)
        return cfg, params

    def _solo_expert(self, cfg, params, pcfg, prompt, max_new, expert,
                     **kw):
        b = ContinuousBatcher(params, cfg, pcfg, **kw)
        rid = b.submit(prompt, max_new=max_new, lora_expert=expert)
        return b.run()[rid]

    def test_mixed_experts_equal_solo(self, lora_model):
        cfg, params = lora_model
        pcfg = _pcfg(cfg, slots=4)
        rng = np.random.default_rng(71)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (5, 7, 4, 6)]
        experts = [0, 1, 2, 1]
        solo = [self._solo_expert(cfg, params, pcfg, p, 5, e)
                for p, e in zip(prompts, experts)]
        b = ContinuousBatcher(params, cfg, pcfg)
        rids = [b.submit(p, max_new=5, lora_expert=e)
                for p, e in zip(prompts, experts)]
        out = b.run()
        for rid, want in zip(rids, solo):
            assert out[rid] == want, (rid, out[rid], want)
        # sanity: the adapters genuinely change behavior on this prompt
        other = self._solo_expert(cfg, params, pcfg, prompts[0], 5, 2)
        assert other != solo[0] or self._solo_expert(
            cfg, params, pcfg, prompts[1], 5, 0) != solo[1]

    def test_experts_with_quantum_and_spec(self, lora_model):
        """Expert routing composes with K-step rounds and speculative
        verify (the expert table rides every serving jit)."""
        cfg, params = lora_model
        pcfg = _pcfg(cfg, slots=3)
        rng = np.random.default_rng(73)
        prompts = [list(rng.integers(4, cfg.vocab_size, n))
                   for n in (6, 4, 8)]
        experts = [2, 0, 1]
        solo = [self._solo_expert(cfg, params, pcfg, p, 6, e)
                for p, e in zip(prompts, experts)]
        for kw in ({"step_quantum": 3}, {"spec_k": 2},
                   {"spec_k": 2, "spec_quantum": 2}):
            b = ContinuousBatcher(params, cfg, pcfg, **kw)
            rids = [b.submit(p, max_new=6, lora_expert=e)
                    for p, e in zip(prompts, experts)]
            out = b.run()
            for rid, want in zip(rids, solo):
                assert out[rid] == want, (kw, rid, out[rid], want)

    def test_prefix_cache_isolates_experts(self, lora_model):
        """Cached prefix pages hold the WRITER expert's lora_wk/lora_wv
        deltas: a request routed to a different expert must not reuse
        them (the digest domain folds the expert id in), while
        same-expert requests still share (ADVICE r4: expert 2 silently
        reused expert 1's KV with hit_tokens=12 and diverged from its
        solo run)."""
        cfg, params = lora_model
        pcfg = _pcfg(cfg, slots=1, n_pages=48)
        rng = np.random.default_rng(83)
        prompt = list(rng.integers(4, cfg.vocab_size, 13))  # 3 blocks
        solo = {e: self._solo_expert(cfg, params, pcfg, prompt, 6, e)
                for e in (1, 2)}
        b = ContinuousBatcher(params, cfg, pcfg, prefix_cache=True)
        r1 = b.submit(prompt, max_new=6, lora_expert=1)
        r2 = b.submit(prompt, max_new=6, lora_expert=2)
        r3 = b.submit(prompt, max_new=6, lora_expert=1)
        out = b.run()
        assert out[r1] == solo[1]
        assert out[r2] == solo[2], "expert 2 reused expert 1's KV pages"
        assert out[r3] == solo[1]
        # only the same-expert repeat (r3) may hit the cached chain
        assert b.pcache.stats["hit_tokens"] == 12

    def test_slot_reuse_resets_expert(self, lora_model):
        """A slot freed by an expert-2 request must serve a later
        expert-0 request with expert 0 (the finish path resets the
        expert table)."""
        cfg, params = lora_model
        pcfg = _pcfg(cfg, slots=1)
        rng = np.random.default_rng(79)
        p1 = list(rng.integers(4, cfg.vocab_size, 5))
        p2 = list(rng.integers(4, cfg.vocab_size, 7))
        want = self._solo_expert(cfg, params, pcfg, p2, 5, 0)
        b = ContinuousBatcher(params, cfg, pcfg)
        r1 = b.submit(p1, max_new=4, lora_expert=2)
        r2 = b.submit(p2, max_new=5, lora_expert=0)
        out = b.run()
        assert out[r2] == want and r1 in out


class TestGenerateEndpoint:
    def test_concurrent_http_generate_equals_solo(self, model):
        """POST /generate from concurrent clients through one
        ContinuousBatcher (GenerationService driver thread) returns each
        request's solo greedy tokens — the serving-API completion of the
        reference's retrieval-only, one-request-per-forward app
        (/root/reference/procyon/app/main.py:56-80)."""
        import json as _json
        import threading
        import urllib.request

        from procyon_tpu.app import server as srv

        cfg, params = model
        pcfg = _pcfg(cfg)
        rng = np.random.default_rng(31)
        prompts = [list(map(int, rng.integers(4, cfg.vocab_size, n)))
                   for n in (5, 9, 4, 7)]
        lens = [6, 4, 8, 5]
        solo = [_solo(cfg, params, pcfg, p, m)
                for p, m in zip(prompts, lens)]

        gen = srv.GenerationService(ContinuousBatcher(params, cfg, pcfg))
        httpd = srv.serve(None, port=0, gen=gen, background=True)
        port = httpd.server_address[1]
        try:
            results = [None] * len(prompts)

            def post(i):
                body = _json.dumps({"tokens": prompts[i],
                                    "max_new": lens[i]}).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate", data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    results[i] = _json.loads(r.read())["tokens"]

            threads = [threading.Thread(target=post, args=(i,))
                       for i in range(len(prompts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert results == solo
            # retrieval-only paths still respond
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
                assert _json.loads(r.read())["ok"]
        finally:
            httpd.shutdown()
