"""Unified fusion-model tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.models import esm2, unified


def make_batch(cfg, rng, B=2, L=16, U=3):
    d_enc = cfg.encoder_out_dim
    input_ids = jnp.asarray(
        rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32)
    soft_map = np.full((B, L), -1, np.int32)
    soft_map[0, 2] = 0  # row 0 has protein 0's soft token at position 2
    soft_map[1, 3] = 1
    labels = np.asarray(rng.integers(0, cfg.llama.vocab_size, (B, L)),
                        np.int32)
    labels[:, :4] = -100
    return {
        "input_ids": input_ids,
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L), (B, L)).astype(jnp.int32),
        "soft_map": jnp.asarray(soft_map),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((U, d_enc)), jnp.float32),
        "labels": jnp.asarray(labels),
        "ret_pos": jnp.asarray([L - 1] * B, jnp.int32),
        "ret_target_pos": jnp.asarray(np.arange(B) % U, jnp.int32),
        "ret_valid": jnp.ones((B,), bool),
    }


class TestUnified:
    def setup_method(self):
        self.cfg = unified.tiny_config()
        self.params = unified.init_params(jax.random.PRNGKey(0), self.cfg)

    def test_lm_forward(self, rng):
        batch = make_batch(self.cfg, rng)
        out = unified.forward(self.params, self.cfg, batch)
        assert out["logits"].shape == (2, 16, self.cfg.llama.vocab_size)
        assert np.isfinite(float(out["lm_loss"]))

    def test_soft_token_injection_changes_output(self, rng):
        batch = make_batch(self.cfg, rng)
        out_a = unified.forward(self.params, self.cfg, batch)
        batch2 = dict(batch)
        batch2["protein_embeds"] = batch["protein_embeds"] + 10.0
        out_b = unified.forward(self.params, self.cfg, batch2)
        # position (0, 2) holds a soft token -> its logits must change
        assert not np.allclose(np.asarray(out_a["logits"][0, 2]),
                               np.asarray(out_b["logits"][0, 2]))
        # a row/pos with no soft token and no attention path from one before
        # it (position 1 precedes the soft token causally) is unchanged
        np.testing.assert_allclose(np.asarray(out_a["logits"][0, 1]),
                                   np.asarray(out_b["logits"][0, 1]),
                                   atol=1e-5)

    def test_retrieval_mode(self, rng):
        batch = make_batch(self.cfg, rng)
        out = unified.forward(self.params, self.cfg, batch, retrieval=True)
        assert out["query_embeds"].shape == (2, self.cfg.retrieval_dim)
        assert out["target_embeds"].shape == (2, self.cfg.retrieval_dim)
        assert np.isfinite(float(out["retrieval_loss"]))

    def test_encode_proteins_with_chunks(self, rng):
        tokens = np.full((4, 10), esm2.PAD_IDX, np.int32)
        for r in range(4):
            n = 5 + r
            tokens[r, 0] = esm2.CLS_IDX
            tokens[r, 1:n - 1] = rng.integers(4, 24, n - 2)
            tokens[r, n - 1] = esm2.EOS_IDX
        group_ids = jnp.asarray([0, 0, 1, 2])  # protein 0 split in two rows
        emb = unified.encode_proteins(
            self.params, self.cfg, jnp.asarray(tokens),
            group_ids=group_ids, num_groups=3)
        assert emb.shape == (3, self.cfg.esm.dim)
        assert np.isfinite(np.asarray(emb)).all()

    def test_protein_embed_fn_matches_eager_sweep(self, rng):
        """The jitted all-protein sweep (protein_embed_fn over a
        shape-bucketed batch) must equal the eager
        encode_proteins + target_protein_embeddings chain, including
        chunk-split regrouping and bucket-pad rows."""
        from procyon_tpu.data import protein_tokenizer as pt

        seqs = ["".join("ACDEFGHIKL"[i % 10] for i in range(n))
                for n in (5, 23, 9)]  # middle one splits at max_len 16
        pb = pt.batch_encode(seqs, max_len=16)
        eager = unified.target_protein_embeddings(
            self.params, self.cfg, unified.encode_proteins(
                self.params, self.cfg, jnp.asarray(pb.tokens),
                group_ids=jnp.asarray(pb.group_ids),
                num_groups=pb.num_groups,
                row_valid=jnp.asarray(pb.row_valid)))
        pbb = pt.bucket_protein_batch(pb, width=18, row_bucket=8)
        assert pbb.tokens.shape == (8, 18)
        fn = unified.protein_embed_fn(self.cfg)
        jitted = fn(self.params, jnp.asarray(pbb.tokens),
                    jnp.asarray(pbb.group_ids),
                    jnp.asarray(pbb.row_valid),
                    pbb.tokens.shape[0])[:pbb.num_groups]
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                                   atol=2e-5, rtol=2e-5)

    def test_mlm_logits(self, rng):
        tokens = jnp.asarray(
            [[esm2.CLS_IDX, 5, esm2.MASK_IDX, 7, esm2.EOS_IDX]], jnp.int32)
        logits = unified.protein_mlm_logits(self.params, self.cfg, tokens)
        assert logits.shape == (1, 5, esm2.VOCAB)

    def test_grads_flow_to_all_components(self, rng):
        batch = make_batch(self.cfg, rng)

        def loss_fn(params):
            out = unified.forward(params, self.cfg, batch, retrieval=True)
            return out["lm_loss"] + out["retrieval_loss"]

        grads = jax.grad(loss_fn)(self.params)
        flat, _ = jax.tree_util.tree_flatten_with_path(grads)
        nonzero = {jax.tree_util.keystr(k[:2]) for k, g in flat
                   if float(jnp.abs(g).max()) > 0}
        assert any("llama" in k for k in nonzero)
        assert any("token_projector" in k for k in nonzero)
        assert any("lm_projector" in k for k in nonzero)
        assert any("shared_projector" in k for k in nonzero)
        assert any("contrastive" in k for k in nonzero)


class TestExplicitNegatives:
    def test_explicit_negative_path(self, rng):
        from procyon_tpu.models import contrastive
        cfg = unified.tiny_config()
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        batch = make_batch(cfg, rng, B=2, L=16, U=5)
        batch["ret_negative_pos"] = jnp.asarray([[2, 3], [3, 4]], jnp.int32)
        out = unified.forward(params, cfg, batch, retrieval=True)
        assert np.isfinite(float(out["retrieval_loss"]))

    def test_explicit_nce_prefers_aligned(self, rng):
        from procyon_tpu.models import contrastive
        ccfg = contrastive.InfoNCEConfig(temperature=0.05)
        p = contrastive.init_params(ccfg)
        z = jnp.eye(4, 8)
        negs = jnp.asarray(rng.standard_normal((4, 3, 8)), jnp.float32)
        loss_good, m = contrastive.info_nce_explicit(p, ccfg, z, z, negs)
        z_bad = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
        loss_bad, _ = contrastive.info_nce_explicit(p, ccfg, z_bad, z, negs)
        assert float(loss_good) < float(loss_bad)
        assert float(m["contrastive_acc"]) == 1.0
