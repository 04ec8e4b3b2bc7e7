"""Aux subsystems: profiling utils, dataset tracker, eval data loading,
drug modality."""
import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.data.dataset_tracker import DatasetTracker
from procyon_tpu.evaluate import data_loading
from procyon_tpu.utils.profiling import StepTimer, device_memory_stats


class TestStepTimer:
    def test_rates(self):
        t = StepTimer(window=10)
        import time
        for _ in range(3):
            t.tick()
            time.sleep(0.01)
        t.tick()
        assert t.steps_per_sec > 0
        assert t.mean_step_ms >= 10


class TestDeviceMemory:
    def test_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)  # may be empty on CPU


class TestDatasetTracker:
    def test_proportional_sampling(self):
        tr = DatasetTracker(budgets={"a": 100, "b": 0})
        rng = np.random.default_rng(0)
        picks = {tr.sample(rng) for _ in range(20)}
        assert picks == {"a"}

    def test_budget_exhaustion(self):
        tr = DatasetTracker(budgets={"a": 10})
        tr.record("a", 10)
        assert tr.remaining("a") == 0
        assert tr.exhausted()

    def test_serialization_roundtrip(self):
        tr = DatasetTracker(budgets={"a": 10, "b": 5}, world_size=4)
        tr.record("a", 3)
        tr2 = DatasetTracker.from_dict(tr.to_dict())
        assert tr2.remaining("a") == 7
        assert tr2.world_size == 4


class TestEvalDataLoading:
    def test_build_retrieval_entry(self):
        eval_rel = [(1, 100), (2, 100), (3, 101)]
        train_rel = [(4, 100)]
        e = data_loading.build_eval_dataset(
            eval_relations=eval_rel, train_relations=train_rel,
            all_protein_ids=[1, 2, 3, 4], task="retrieval")
        assert e["query_order"] == [100, 101]
        # protein 4 is a train positive for text 100 -> leak pair (q=0,t=3)
        assert (0, 3) in e["train_leak_pairs"]

    def test_build_qa_entry_negatives_avoid_positives(self):
        eval_rel = [(1, 100)]
        e = data_loading.build_eval_dataset(
            eval_relations=eval_rel, train_relations=[(2, 100)],
            all_protein_ids=[1, 2, 3, 4, 5], task="qa",
            qa_negatives_per_positive=3)
        pos = [(a, t) for a, t, y in e["qa_samples"] if y == 1]
        negs = [a for a, t, y in e["qa_samples"] if y == 0]
        assert pos == [(1, 100)]
        assert 1 not in negs and 2 not in negs


class TestDrugModality:
    def test_drug_soft_tokens(self, rng):
        from procyon_tpu.models import unified

        cfg = unified.tiny_config(esm=None, protein_embed_dim=16,
                                  use_drug_embeddings=True,
                                  drug_embed_dim=8)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        assert "drug_projector" in params["projectors"]
        B, L, U, Ud = 2, 12, 2, 2
        soft_map = np.full((B, L), -1, np.int32)
        soft_map[0, 2] = 0       # protein 0
        soft_map[1, 3] = U + 1   # drug 1 (drug rows follow protein rows)
        batch = {
            "input_ids": jnp.asarray(
                rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32),
            "seg_ids": jnp.ones((B, L), jnp.int32),
            "positions": jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32), (B, L)),
            "soft_map": jnp.asarray(soft_map),
            "protein_embeds": jnp.asarray(
                rng.standard_normal((U, 16)), jnp.float32),
            "drug_embeds": jnp.asarray(
                rng.standard_normal((Ud, 8)), jnp.float32),
        }
        out_a = unified.forward(params, cfg, batch)
        batch2 = dict(batch)
        batch2["drug_embeds"] = batch["drug_embeds"] + 5.0
        out_b = unified.forward(params, cfg, batch2)
        # drug soft token at (1, 3) must change
        assert not np.allclose(np.asarray(out_a["logits"][1, 3]),
                               np.asarray(out_b["logits"][1, 3]))
        # row 0 has no drug token -> unchanged
        np.testing.assert_allclose(np.asarray(out_a["logits"][0]),
                                   np.asarray(out_b["logits"][0]),
                                   atol=1e-5)


class TestPerturbationCI:
    def test_perturb_variants(self):
        from procyon_tpu.inference.prompts import perturb_description
        rng = np.random.default_rng(0)
        vs = perturb_description("a b c d e f g h", rng, n_variants=4)
        assert len(vs) == 4
        assert all(len(v.split()) >= 1 for v in vs)

    def test_rank_stability_on_synthetic_service(self):
        from procyon_tpu.data import datasets
        from procyon_tpu.data.text_tokenizer import load_tokenizer
        from procyon_tpu.inference.prompts import retrieval_rank_stability
        from procyon_tpu.inference.retrieval_service import startup_retrieval
        from procyon_tpu.models import llama, unified
        cfg = unified.UnifiedConfig(
            llama=llama.tiny_config(vocab_size=4096, attn_backend="ref",
                                    remat=False),
            esm=None, protein_embed_dim=32, token_projector_layers=1,
            token_projector_hidden=32, retrieval_dim=16, dtype=jnp.float32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = datasets.SyntheticStore(n_proteins=32, embed_dim=32)
        tok = load_tokenizer(vocab_size=4096)
        svc = startup_retrieval(params, cfg, tok, store, list(range(32)))
        r = retrieval_rank_stability(
            svc, task_id="disgenet_all_retrieval",
            description="progressive neurological decline with seizures",
            k=5, n_variants=2)
        assert 0.0 <= r["mean_jaccard"] <= 1.0


class TestResizeEmbeddings:
    def test_grow_and_shrink(self):
        from procyon_tpu.models import checkpoint_io, llama
        cfg = llama.tiny_config()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        grown = checkpoint_io.resize_token_embeddings(params, 300)
        assert grown["embed"].shape == (300, cfg.dim)
        assert grown["lm_head"].shape == (cfg.dim, 300)
        np.testing.assert_array_equal(
            np.asarray(grown["embed"][:256]), np.asarray(params["embed"]))
        shrunk = checkpoint_io.resize_token_embeddings(params, 200)
        assert shrunk["embed"].shape == (200, cfg.dim)
