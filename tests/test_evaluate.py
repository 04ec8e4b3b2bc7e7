"""Eval framework tests, following the reference testing.py pattern
(hand-computed metric expectations + kNN blob positive control)."""
import numpy as np
import pytest

from procyon_tpu.evaluate import caption, core, metrics, qa, retrieval, utils
from procyon_tpu.evaluate.baselines import (KNNQAModel, KNNRetrievalModel,
                                            MLPRetrievalModel, RandomQAModel,
                                            RandomRetrievalModel,
                                            ScoreMatrixRetrievalModel)


class TestMetrics:
    def test_precision_recall_topk_hand_computed(self):
        labels = np.array([[1, 0, 1, 0], [0, 0, 0, 1]], float)
        scores = np.array([[0.9, 0.8, 0.1, 0.0], [0.1, 0.2, 0.3, 0.9]])
        p, r = metrics.precision_recall_topk(labels, scores, 2)
        # q0: top2 = {0, 1}, hits=1 -> p=0.5, r=1/2; q1: top2={3,2}, hits=1
        # -> p=0.5, r=1
        assert abs(p - 0.5) < 1e-9
        assert abs(r - 0.75) < 1e-9

    def test_topk_nan_exclusion(self):
        labels = np.array([[1, np.nan, 0, 0]], float)
        scores = np.array([[0.1, 0.99, 0.5, 0.2]])
        p, r = metrics.precision_recall_topk(labels, scores, 1)
        # NaN col excluded; top1 among valid = col2 (0.5), miss
        assert p == 0.0
        labels2 = np.array([[1, np.nan, 0, 0]], float)
        scores2 = np.array([[0.9, 0.99, 0.5, 0.2]])
        p2, _ = metrics.precision_recall_topk(labels2, scores2, 1)
        assert p2 == 1.0

    def test_fmax_perfect_scores(self):
        labels = np.array([[1, 0, 0], [0, 1, 0]], float)
        scores = labels.copy()
        f, t = metrics.fmax_score(labels, scores)
        assert abs(f - 1.0) < 1e-9

    def test_fmax_random_below_perfect(self):
        rng = np.random.default_rng(0)
        labels = (rng.random((20, 50)) < 0.1).astype(float)
        scores = rng.random((20, 50))
        f, _ = metrics.fmax_score(labels, scores)
        assert 0 < f < 0.5

    def test_per_query_auroc(self):
        labels = np.array([[1, 0, 0, 1]], float)
        scores = np.array([[0.9, 0.1, 0.2, 0.8]])
        auroc, auprc = metrics.per_query_auroc_auprc(labels, scores)
        assert auroc == 1.0 and auprc == 1.0

    def test_bootstrap_ci_contains_mean(self):
        vals = np.random.default_rng(0).random(200)
        point, lo, hi = metrics.bootstrap_ci(vals)
        assert lo <= point <= hi
        assert hi - lo < 0.2

    def test_rouge_l_identity(self):
        assert metrics.rouge_l("a b c d", "a b c d") == 1.0
        assert metrics.rouge_l("a b c d", "x y z w") == 0.0
        mid = metrics.rouge_l("a b c d", "a b x y")
        assert 0 < mid < 1

    def test_bleu_identity(self):
        assert metrics.bleu("a b c d e f", "a b c d e f") > 0.99
        assert metrics.bleu("a b c d e f", "x y z w v u") < 0.1

    def test_multi_reference_picks_best(self):
        score = metrics.rouge_l("the protein binds atp",
                                ["unrelated text here",
                                 "the protein binds atp"])
        assert score == 1.0


class TestRetrievalEval:
    def test_label_matrix_and_leak_masking(self):
        rels = [(10, 100), (11, 100), (12, 101)]
        labels = retrieval.prep_for_retrieval_eval(
            rels, query_order=[100, 101], target_order=[10, 11, 12],
            train_leak_pairs={(0, 2)})
        assert labels[0, 0] == 1 and labels[0, 1] == 1
        assert labels[1, 2] == 1
        assert np.isnan(labels[0, 2])
        assert labels[1, 0] == 0

    def test_target_set_includes_positives(self):
        cfg = retrieval.RetrievalEvalConfig(target_subset=[1, 2, 3])
        ts = retrieval.get_target_set([1, 2, 3, 4, 5], [(5, 100)], cfg)
        assert 5 in ts

    def test_run_retrieval_eval_with_random_model(self, tmp_path):
        rels = [(i, 100 + i) for i in range(5)]
        m = retrieval.run_retrieval_eval(
            RandomRetrievalModel(), None,
            all_protein_ids=list(range(20)),
            eval_relations=rels, query_order=[100 + i for i in range(5)],
            cfg=retrieval.RetrievalEvalConfig(top_ks=(5,), n_boot=50),
            cache=utils.PredictionCache(str(tmp_path)))
        assert 0 <= m["auroc"] <= 1
        # second run hits the cache, same numbers
        m2 = retrieval.run_retrieval_eval(
            RandomRetrievalModel(seed=999), None,
            all_protein_ids=list(range(20)),
            eval_relations=rels, query_order=[100 + i for i in range(5)],
            cfg=retrieval.RetrievalEvalConfig(top_ks=(5,), n_boot=50),
            cache=utils.PredictionCache(str(tmp_path)))
        assert m2["auroc"] == m["auroc"]


def make_blobs(n_clusters=3, per=20, dim=16, seed=0):
    """Cluster fixture: proteins in cluster c relate to text c (the kNN
    positive control from testing.py:640)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 5
    embeds, relations = {}, []
    pid = 0
    for c in range(n_clusters):
        for _ in range(per):
            embeds[pid] = centers[c] + rng.standard_normal(dim) * 0.3
            relations.append((pid, 1000 + c))
            pid += 1
    return embeds, relations


class TestKNNPositiveControl:
    def test_knn_separates_blobs(self):
        embeds, relations = make_blobs()
        train = [r for i, r in enumerate(relations) if i % 2 == 0]
        test = [r for i, r in enumerate(relations) if i % 2 == 1]
        model = KNNRetrievalModel(embeds, train, k=5)
        # mask train positives out of the label matrix (leak masking):
        # without it the train proteins rank top with label 0
        leaks = utils.get_train_relations_for_eval(
            train, [1000, 1001, 1002], list(embeds))
        m = retrieval.run_retrieval_eval(
            model, None, all_protein_ids=list(embeds),
            eval_relations=test, query_order=[1000, 1001, 1002],
            cfg=retrieval.RetrievalEvalConfig(top_ks=(10,), bootstrap=False),
            train_leak_pairs=leaks)
        assert m["auroc"] > 0.95, m

    def test_knn_qa_positive_control(self):
        embeds, relations = make_blobs()
        train = [r for i, r in enumerate(relations) if i % 2 == 0]
        rng = np.random.default_rng(0)
        qa_samples = []
        for i, (a, t) in enumerate(relations):
            if i % 2 == 1:
                qa_samples.append((a, t, 1))
                wrong_t = 1000 + (t - 1000 + 1) % 3
                qa_samples.append((a, wrong_t, 0))
        model = KNNQAModel(embeds, train, k=5)
        m = qa.run_qa_eval(model, qa_samples)
        assert m["accuracy"] > 0.9, m

    def test_mlp_beats_random(self):
        embeds, relations = make_blobs()
        train = [r for i, r in enumerate(relations) if i % 2 == 0]
        test = [r for i, r in enumerate(relations) if i % 2 == 1]
        kwargs = dict(all_protein_ids=list(embeds), eval_relations=test,
                      query_order=[1000, 1001, 1002],
                      cfg=retrieval.RetrievalEvalConfig(top_ks=(10,),
                                                        bootstrap=False))
        m_mlp = retrieval.run_retrieval_eval(
            MLPRetrievalModel(embeds, train), None, **kwargs)
        m_rnd = retrieval.run_retrieval_eval(
            RandomRetrievalModel(), None, **kwargs)
        assert m_mlp["auroc"] > m_rnd["auroc"] + 0.2

    def test_score_matrix_model(self):
        embeds, relations = make_blobs()
        ids = sorted(embeds)
        X = np.stack([embeds[i] for i in ids])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T  # similarity as a stand-in for BLAST bit scores
        train = [r for i, r in enumerate(relations) if i % 2 == 0]
        test = [r for i, r in enumerate(relations) if i % 2 == 1]
        model = ScoreMatrixRetrievalModel(S, {i: j for j, i in
                                              enumerate(ids)}, train)
        leaks = utils.get_train_relations_for_eval(
            train, [1000, 1001, 1002], ids)
        m = retrieval.run_retrieval_eval(
            model, None, all_protein_ids=ids, eval_relations=test,
            query_order=[1000, 1001, 1002],
            cfg=retrieval.RetrievalEvalConfig(top_ks=(10,), bootstrap=False),
            train_leak_pairs=leaks)
        assert m["auroc"] > 0.95


class TestQAMetrics:
    def test_hand_computed(self):
        yes = np.array([0.9, 0.2, 0.7, 0.4])
        labels = np.array([1, 0, 0, 0])
        m = qa.calc_qa_metrics(yes, labels, bootstrap=False)
        assert abs(m["accuracy"] - 0.75) < 1e-9

    def test_qa_yes_prob(self):
        logits = np.zeros((2, 10))
        logits[0, 3] = 5.0  # yes id 3
        logits[1, 4] = 5.0  # no id 4
        p = qa.qa_yes_prob(logits, 3, 4)
        assert p[0] > 0.99 and p[1] < 0.01


class TestCaptionEval:
    def test_merge_and_score(self):
        refs = caption.merge_references(
            [(1, "protein binds atp"), (1, "catalyzes phosphorylation"),
             (2, "membrane transporter")])
        preds = {1: "protein binds atp", 2: "nuclear localization"}
        m = caption.calc_caption_metrics(preds, refs, bootstrap=False)
        assert m["rouge_l"] == pytest.approx((1.0 + 0.0) / 2)


class TestCore:
    def test_run_evaluation_end_to_end(self, tmp_path):
        embeds, relations = make_blobs()
        train = [r for i, r in enumerate(relations) if i % 2 == 0]
        test = [r for i, r in enumerate(relations) if i % 2 == 1]
        args = core.EvalArgs(
            tasks=("retrieval", "qa"), models=("random", "knn"),
            output_dir=str(tmp_path), cache_dir=str(tmp_path / "cache"),
            retrieval=retrieval.RetrievalEvalConfig(top_ks=(10,),
                                                    bootstrap=False))
        qa_samples = [(a, t, 1) for a, t in test[:10]] + \
                     [(a, 1000 + (t - 999) % 3, 0) for a, t in test[:10]]
        datasets = {
            "blobs_ret": {"task": "retrieval", "eval_relations": test,
                          "query_order": [1000, 1001, 1002],
                          "all_protein_ids": list(embeds)},
            "blobs_qa": {"task": "qa", "qa_samples": qa_samples},
        }
        results = core.run_evaluation(args, datasets, model_context={
            "protein_embeddings": embeds, "train_relations": train})
        assert len(results) == 4  # 2 tasks x 2 models
        by = {(r["task"], r["model"]): r["metrics"] for r in results}
        assert by[("retrieval", "knn")]["auroc"] > \
            by[("retrieval", "random")]["auroc"]
        rows = utils.read_metrics(str(tmp_path), "retrieval")
        assert any(r["metric"] == "auroc" for r in rows)
