"""Native third-party baseline models (BioTranslator / ProtST /
PubMedBERT-SimCSE text encoders / ProtLLM QA).

Reference surfaces: procyon/evaluate/framework/biotranslator.py,
protst.py + baseline_models/protst.py, model/{pubmedbert,simcse}.py,
evaluate/framework/ProtLLMQA.py. The CNN tower is pinned against a live
torch conv1d with identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.evaluate.baselines import text_models as tm
from procyon_tpu.evaluate.baselines.protllm import ProtLLMQAEval


class FakeStore:
    """Minimal text+sequence store for baseline models."""

    def __init__(self, n_proteins=8, n_texts=6, seed=0):
        rng = np.random.default_rng(seed)
        aas = "ARNDCQEGHILKMFPSTWYV"
        self.seqs = ["".join(rng.choice(list(aas), 20 + 5 * i))
                     for i in range(n_proteins)]
        self.texts = {i: f"phenotype description number {i} protein "
                         f"function term{i}" for i in range(n_texts)}

    def protein_sequence(self, idx):
        return self.seqs[idx]

    def text(self, idx):
        return self.texts[idx]


class TestOneHot:
    def test_known_residues_set_their_channel(self):
        x = tm.one_hot_protein("AR", max_len=4)
        assert x.shape == (4, 21)
        assert x[0, tm.AAINDEX["A"]] == 1.0
        assert x[1, tm.AAINDEX["R"]] == 1.0
        # padding + unknown map to channel 0
        assert x[2, 0] == 1.0 and x[3, 0] == 1.0
        assert tm.one_hot_protein("X", max_len=2)[0, 0] == 1.0

    def test_row_sums_are_one(self):
        x = tm.one_hot_protein("ARNDX", max_len=10)
        np.testing.assert_allclose(x.sum(axis=1), 1.0)


class TestCNNTower:
    def test_parity_with_torch_conv1d(self):
        torch = pytest.importorskip("torch")
        cfg = tm.CNNConfig(out_channels=8, max_kernel=25, seq_length=64,
                           hidden_dim=16)
        params = tm.init_cnn_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, cfg.seq_length, 21)).astype(np.float32)
        got = np.asarray(tm.cnn_forward(params, cfg, jnp.asarray(x)))

        # torch reference: conv1d [C_out, C_in, k] on [B, C_in, L] + global
        # max + Linear + LeakyReLU (biotranslator.py:120-149)
        feats = []
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        for i, k in enumerate(cfg.kernels):
            conv = torch.nn.Conv1d(21, cfg.out_channels, k)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(
                    np.asarray(params["convs"][i]["w"]).transpose(2, 1, 0)))
                conv.bias.copy_(torch.from_numpy(
                    np.asarray(params["convs"][i]["b"])))
                feats.append(conv(xt).max(dim=2).values)
        h = torch.cat(feats, dim=1)
        with torch.no_grad():
            want = torch.nn.functional.leaky_relu(
                h @ torch.from_numpy(np.asarray(params["fc_w"]))
                + torch.from_numpy(np.asarray(params["fc_b"])),
                negative_slope=0.01).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_output_shape(self):
        cfg = tm.CNNConfig(out_channels=4, max_kernel=17, seq_length=32,
                           hidden_dim=12)
        params = tm.init_cnn_params(jax.random.PRNGKey(1), cfg)
        y = tm.cnn_forward(params, cfg, jnp.zeros((3, 32, 21)))
        assert y.shape == (3, 12)


class TestProjections:
    def test_mlp_proj_shapes_and_hidden(self):
        p = tm.init_mlp_proj(jax.random.PRNGKey(0), 64, 16, kind="mlp")
        assert p.ws[0].shape == (64, 40)  # (64+16)//2 hidden
        assert p.ws[1].shape == (40, 16)
        assert p.bs == [None, None]
        y = tm.apply_proj(p, jnp.ones((2, 64)))
        assert y.shape == (2, 16)

    def test_tower_mlp_has_biases(self):
        p = tm.init_mlp_proj(jax.random.PRNGKey(0), 32, 8,
                             kind="tower_mlp")
        assert p.ws[0].shape == (32, 32) and p.ws[1].shape == (32, 8)
        assert p.bs[0] is not None

    def test_proj_is_jittable_argument(self):
        p = tm.init_mlp_proj(jax.random.PRNGKey(0), 8, 4, kind="mlp")
        f = jax.jit(lambda proj, x: tm.apply_proj(proj, x))
        y = f(p, jnp.ones((1, 8)))
        assert y.shape == (1, 4)


class TestRetrievalBaselines:
    @pytest.fixture(scope="class")
    def store(self):
        return FakeStore()

    def test_biotranslator_end_to_end(self, store):
        model = tm.BioTranslatorRetrievalEval.synthetic(store)
        sims = model.get_predictions([0, 1, 2], [0, 1, 2, 3])
        assert sims.shape == (3, 4)
        assert np.isfinite(sims).all()
        assert np.abs(sims).max() <= 1.0 + 1e-5

    def test_protst_end_to_end(self, store):
        model = tm.ProtSTRetrievalEval.synthetic(store)
        sims = model.get_predictions([0, 1], [0, 1, 2])
        assert sims.shape == (2, 3)
        assert np.isfinite(sims).all()

    def test_text_encoder_end_to_end(self, store):
        model = tm.TextEncoderRetrievalEval.synthetic(
            store, lambda a: " ".join(store.protein_sequence(a)))
        sims = model.get_predictions([0, 1], [0, 1, 2, 3])
        assert sims.shape == (2, 4)
        # identical text on both sides must produce sim 1 on that pair
        model2 = tm.TextEncoderRetrievalEval.synthetic(
            store, lambda a: store.text(0))
        sims2 = model2.get_predictions([0], [5])
        np.testing.assert_allclose(sims2[0, 0], 1.0, atol=1e-5)

    def test_deterministic_across_calls(self, store):
        model = tm.BioTranslatorRetrievalEval.synthetic(store)
        a = model.get_predictions([0, 1], [0, 1])
        b = model.get_predictions([0, 1], [0, 1])
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestProtLLMQA:
    def test_end_to_end_probs(self):
        store = FakeStore()
        model = ProtLLMQAEval.synthetic(store)
        data = [(0, 0, True), (1, 1, False), (2, 2, True)]
        probs, labels = model.get_predictions(data)
        assert probs.shape == (3,)
        assert ((probs >= 0) & (probs <= 1)).all()
        assert list(labels) == [True, False, True]

    def test_protein_embedding_affects_output(self):
        """The spliced protein soft token must actually reach the LM."""
        store = FakeStore()
        model = ProtLLMQAEval.synthetic(store)
        p1, _ = model.get_predictions([(0, 0, True)])
        # different protein, same text
        p2, _ = model.get_predictions([(7, 0, True)])
        assert abs(float(p1[0]) - float(p2[0])) > 1e-6


class TestZooRegistration:
    def test_run_evaluation_with_new_baselines(self, tmp_path):
        from procyon_tpu.evaluate import core

        store = FakeStore(n_proteins=6, n_texts=4)
        rels = [(a, a % 4) for a in range(6)]
        datasets = {
            "synth_retrieval": {
                "task": "retrieval",
                "eval_relations": rels,
                "query_order": [0, 1, 2, 3],
                "all_protein_ids": list(range(6)),
                "store": store,
            },
            "synth_qa": {
                "task": "qa",
                "qa_samples": [(a, a % 4, a % 2 == 0) for a in range(6)],
                "store": store,
            },
        }
        args = core.EvalArgs(
            tasks=("retrieval", "qa"),
            models=("biotranslator", "protst", "simcse", "pubmedbert",
                    "protllm"),
            output_dir=str(tmp_path / "out"), cache_dir=None)
        results = core.run_evaluation(args, datasets, model_context={})
        combos = {(r["task"], r["model"]) for r in results}
        assert ("retrieval", "biotranslator") in combos
        assert ("retrieval", "protst") in combos
        assert ("retrieval", "simcse") in combos
        assert ("retrieval", "pubmedbert") in combos
        assert ("qa", "protllm") in combos
        for r in results:
            if r["task"] == "retrieval":
                assert 0.0 <= r["metrics"]["auprc"] <= 1.0
