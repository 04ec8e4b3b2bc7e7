"""End-to-end learning signal: training the fusion model on synthetic
structured relations must improve retrieval quality measured by the eval
framework. This is the integration test the reference never had — data
factory -> collators -> train steps -> eval framework in one loop.
"""
import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.data import collators as C
from procyon_tpu.data import datasets, instruct
from procyon_tpu.data.text_tokenizer import WordTokenizer
from procyon_tpu.evaluate import retrieval as ret_eval
from procyon_tpu.models import llama, unified
from procyon_tpu.training import train_step as ts
from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer


class ClusteredStore(datasets.SyntheticStore):
    """Proteins in cluster c share an embedding direction; texts describe
    clusters — retrieval is learnable."""

    def __init__(self, n_clusters=4, per=16, embed_dim=32, seed=0):
        super().__init__(n_proteins=n_clusters * per, n_texts=n_clusters,
                         embed_dim=embed_dim, seed=seed)
        rng = np.random.default_rng(seed + 1)
        centers = rng.standard_normal((n_clusters, embed_dim)) * 3
        self._embeds = np.stack([
            centers[i // per] + rng.standard_normal(embed_dim) * 0.3
            for i in range(n_clusters * per)]).astype(np.float32)
        self.n_clusters = n_clusters
        self.per = per

    def text(self, idx):
        return (f"cluster {idx % self.n_clusters} phenotype involving "
                f"pathway p{idx % self.n_clusters}")


def test_training_improves_retrieval_auroc(rng):
    store = ClusteredStore()
    tok = WordTokenizer(2048)
    lib = instruct.TaskLibrary()
    task = lib.get("go_process_retrieval")
    prompt = instruct.get_prompt(task, num_examples=1)
    ccfg = C.CollatorConfig(max_text_len=96, protein_embed_dim=32)
    coll = C.RetrievalCollator(ccfg, tok, store, task)

    cfg = unified.UnifiedConfig(
        llama=llama.tiny_config(vocab_size=2048, dim=64, n_layers=2,
                                attn_backend="ref", remat=False),
        esm=None, protein_embed_dim=32, token_projector_layers=1,
        token_projector_hidden=32, retrieval_dim=16, dtype=jnp.float32)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    # frozen temperature: at toy scale the learnable temperature races to
    # its clamp and collapses the logits before the encoders learn
    opt = build_optimizer(OptimizerConfig(lr=1e-3, contrastive_lr=0.0,
                                          warmup_steps=0, total_steps=500,
                                          schedule="constant"), params)
    step = ts.make_train_step(cfg, opt, "retrieval", donate=False)
    state = ts.init_train_state(params, opt)

    relations = [(p, 1000 + p // store.per)
                 for p in range(store.n_proteins)]
    train_rel = [r for i, r in enumerate(relations) if i % 2 == 0]
    test_rel = [r for i, r in enumerate(relations) if i % 2 == 1]
    queries = sorted({t for _, t in test_rel})

    class Model(ret_eval.AbstractRetrievalModel):
        name = "procyon-e2e"

        def __init__(self, params):
            self.params = params

        def get_predictions(self, query_order, target_order, dataset=None):
            # query embeddings via prompts (text index == cluster id),
            # targets via the shared projector
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
            Model(params), None, all_protein_ids=list(range(
                store.n_proteins)),
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
