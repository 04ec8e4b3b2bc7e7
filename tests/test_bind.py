"""ProCyon-Bind (peptide binding) end-to-end: tracked workload #4.

Reference: examples/training/procyon_peptide_tune.sh + configs/
peptide_tune.yml + peptide_all_qa.json — peptide aaseq entries ride their
own sequence/embedding tables (aaseq_type: peptide) through the QA and
retrieval collators; fine-tuning must produce a learning signal.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.data import collators as C
from procyon_tpu.data import data_config, datasets, instruct
from procyon_tpu.data.text_tokenizer import WordTokenizer
from procyon_tpu.evaluate import retrieval as ret_eval
from procyon_tpu.models import llama, unified
from procyon_tpu.training import train_step as ts
from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer


class ClusteredPeptideStore(datasets.SyntheticStore):
    """Peptides in cluster c share an embedding direction; texts name the
    binding class — retrieval is learnable."""

    def __init__(self, n_clusters=4, per=16, embed_dim=32, seed=0):
        super().__init__(n_proteins=n_clusters * per, n_texts=n_clusters,
                         embed_dim=embed_dim, seed=seed, min_len=8,
                         max_len=30)
        rng = np.random.default_rng(seed + 1)
        centers = rng.standard_normal((n_clusters, embed_dim)) * 3
        self._embeds = np.stack([
            centers[i // per] + rng.standard_normal(embed_dim) * 0.3
            for i in range(n_clusters * per)]).astype(np.float32)
        self.n_clusters = n_clusters
        self.per = per

    def text(self, idx):
        c = idx % self.n_clusters
        return (f"binds the receptorfamily{c} pocket via "
                f"ligandclass{c} contacts motif{c}")


class TestEntryStoreRouting:
    def test_peptide_entry_gets_own_synthetic_store(self):
        base = datasets.SyntheticStore(n_proteins=64, n_texts=64,
                                       embed_dim=32)
        entry = data_config.DatasetEntry(aaseq_type="peptide",
                                         text_type="peptide",
                                         tasks=["qa", "retrieval"])
        cache = {}
        st = data_config.resolve_entry_store(base, entry, synthetic=True,
                                             _cache=cache)
        assert st is not base
        # peptides are short (8-30 aa)
        lens = [len(st.protein_sequence(i)) for i in range(20)]
        assert max(lens) <= 30 and min(lens) >= 8
        # cached: same store object for a second peptide entry
        st2 = data_config.resolve_entry_store(base, entry, synthetic=True,
                                              _cache=cache)
        assert st2 is st

    def test_protein_entry_keeps_base_store(self):
        base = datasets.SyntheticStore()
        entry = data_config.DatasetEntry()
        st = data_config.resolve_entry_store(base, entry, synthetic=True)
        assert st is base

    def test_real_store_routes_embedding_file(self, tmp_path):
        # a ProCyonDataStore peptide view with an explicit embedding table
        emb = np.random.default_rng(0).standard_normal((8, 16)).astype(
            np.float32)
        path = tmp_path / "pep.npy"
        np.save(path, emb)
        base = datasets.ProCyonDataStore(str(tmp_path))
        entry = data_config.DatasetEntry(aaseq_type="peptide",
                                         text_type="peptide")
        st = data_config.resolve_entry_store(
            base, entry, data_dir=str(tmp_path),
            aaseq_embedding_files={"peptide": str(path)})
        assert isinstance(st, datasets.ProCyonDataStore)
        assert st.aaseq_type == "peptide"
        np.testing.assert_allclose(st.protein_embedding(2), emb[2])


class TestBindStreams:
    def test_peptide_mix_builds_qa_and_retrieval(self):
        mix = data_config.MultiDatasetConfig.load_from_yaml(
            "configs/data_configs/peptide_mix.yml")
        store = datasets.SyntheticStore(n_proteins=64, n_texts=64,
                                        embed_dim=32)
        ccfg = C.CollatorConfig(max_text_len=128, protein_embed_dim=32)
        streams, mixers, _ = data_config.build_task_streams(
            mix, store=store, tokenizer=WordTokenizer(4096),
            collator_cfg=ccfg, batch_sizes={"qa": 4, "retrieval": 4},
            synthetic=True)
        assert set(streams) == {"qa", "retrieval"}
        # peptide + domain datasets both feed the mixers
        keys = set(mixers["qa"].datasets)
        assert any(k.startswith("peptide_all_qa") for k in keys)
        assert any(k.startswith("domain_go_process_qa") for k in keys)
        b = streams["qa"]()
        assert b["input_ids"].shape[0] == 4
        assert "protein_embeds" in b


def test_bind_finetune_improves_retrieval_auroc(rng):
    """The ProCyon-Bind learning signal: peptide retrieval AUROC improves
    under fine-tuning (the peptide analogue of test_e2e_learning)."""
    store = ClusteredPeptideStore()
    tok = WordTokenizer(2048)
    lib = instruct.TaskLibrary()
    task = lib.get("peptide_all_retrieval")
    prompt = instruct.get_prompt(task, num_examples=1,
                                 aaseq_type="peptide")
    ccfg = C.CollatorConfig(max_text_len=96, protein_embed_dim=32)
    coll = C.RetrievalCollator(ccfg, tok, store, task)

    cfg = unified.UnifiedConfig(
        llama=llama.tiny_config(vocab_size=2048, dim=64, n_layers=2,
                                attn_backend="ref", remat=False),
        esm=None, protein_embed_dim=32, token_projector_layers=1,
        token_projector_hidden=32, retrieval_dim=16, dtype=jnp.float32)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    opt = build_optimizer(OptimizerConfig(lr=1e-3, contrastive_lr=0.0,
                                          warmup_steps=0, total_steps=500,
                                          schedule="constant"), params)
    step = ts.make_train_step(cfg, opt, "retrieval", donate=False)
    state = ts.init_train_state(params, opt)

    relations = [(p, 1000 + p // store.per) for p in range(store.n_proteins)]
    train_rel = [r for i, r in enumerate(relations) if i % 2 == 0]
    test_rel = [r for i, r in enumerate(relations) if i % 2 == 1]
    queries = sorted({t for _, t in test_rel})

    class Model(ret_eval.AbstractRetrievalModel):
        name = "bind-e2e"

        def __init__(self, params):
            self.params = params

        def get_predictions(self, query_order, target_order, dataset=None):
            samples = [(0, t % 1000) for t in query_order]
            b = coll(samples, prompt)
            dev = {k: jnp.asarray(v) for k, v in b.items()
                   if k != "reference_indices"}
            q = np.asarray(unified.retrieval_query_embedding(
                self.params, cfg, dev))
            raw = jnp.asarray(np.stack([store.protein_embedding(a)
                                        for a in target_order]))
            t = np.asarray(unified.target_protein_embeddings(
                self.params, cfg, raw))
            qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                                1e-8)
            tn = t / np.maximum(np.linalg.norm(t, axis=1, keepdims=True),
                                1e-8)
            return qn @ tn.T

    ecfg = ret_eval.RetrievalEvalConfig(top_ks=(10,), bootstrap=False)

    def auroc(params):
        m = ret_eval.run_retrieval_eval(
            Model(params), None,
            all_protein_ids=list(range(store.n_proteins)),
            eval_relations=test_rel, query_order=queries, cfg=ecfg)
        return m["auroc"]

    before = auroc(state["params"])
    data_rng = np.random.default_rng(0)
    best = before
    for i in range(120):
        idx = data_rng.choice(len(train_rel), 8, replace=False)
        samples = [train_rel[i2] for i2 in idx]
        batch = coll(samples, prompt)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "reference_indices"}
        state, m = step(state, dev)
        if i in (59, 119):
            best = max(best, auroc(state["params"]))

    assert best > before + 0.1, (before, best)
    assert best > 0.7, (before, best)
