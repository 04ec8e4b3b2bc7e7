"""Drug / struct soft-token modality end-to-end (VERDICT round-1 Missing
#3/#5): collators emit struct_embeds/drug_embeds + correctly-offset
soft_map rows, and training gradients reach the struct/drug projectors.

Reference: struct injection model_unified.py:421-460; drug injection
inference_utils.py:770-803.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procyon_tpu.data import collators as C
from procyon_tpu.data import datasets as D
from procyon_tpu.data import instruct
from procyon_tpu.data.text_tokenizer import load_tokenizer
from procyon_tpu.models import esm2, llama, unified


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer(vocab_size=4096)


@pytest.fixture(scope="module")
def store():
    return D.SyntheticStore(n_proteins=16, n_texts=32, embed_dim=24,
                            struct_dim=20, drug_dim=12)


@pytest.fixture(scope="module")
def task():
    lib = instruct.TaskLibrary()
    return lib.get("drugbank_drug_target_qa")


def _cfg(**kw):
    base = dict(
        llama=llama.LlamaConfig(vocab_size=4096, dim=32, n_layers=2,
                                n_heads=2, n_kv_heads=2, intermediate=64,
                                max_seq_len=512, dtype=jnp.float32,
                                attn_backend="ref", remat=False),
        esm=None, protein_embed_dim=24, token_projector_layers=2,
        token_projector_hidden=16, retrieval_dim=16,
        use_protein_struct=True, struct_embed_dim=20,
        use_drug_embeddings=True, drug_embed_dim=12, dtype=jnp.float32)
    base.update(kw)
    return unified.UnifiedConfig(**base)


def _ccfg(**kw):
    base = dict(max_text_len=256, protein_embed_dim=24,
                use_protein_struct=True, struct_dropout=0.0,
                struct_embed_dim=20, use_drug_embeddings=True,
                drug_embed_dim=12)
    base.update(kw)
    return C.CollatorConfig(**base)


class TestModalityCollation:
    def test_qa_batch_has_struct_and_drug_rows(self, tok, store, task):
        coll = C.QACollator(_ccfg(), tok, store, task)
        prompt = instruct.get_prompt(task, num_examples=1)
        # text ids 0/2 have drugs (SyntheticStore.has_drug: even ids)
        batch = coll([(1, 0, True), (2, 2, False), (3, 1, True)], prompt)
        U = batch["protein_embeds"].shape[0]
        assert batch["struct_embeds"].shape == (U, 20)
        # drug slots: ICL example text + query texts 0 and 2 (if even)
        assert "drug_embeds" in batch
        sm = batch["soft_map"]
        # struct rows live in [U, 2U); drug rows in [2U, ...)
        assert ((sm >= U) & (sm < 2 * U)).any(), "no struct soft tokens"
        assert (sm >= 2 * U).any(), "no drug soft tokens"
        # struct token directly follows its protein token
        b, p = np.argwhere((sm >= U) & (sm < 2 * U))[0]
        assert sm[b, p - 1] == sm[b, p] - U

    def test_struct_dropout_removes_struct_tokens(self, tok, store, task):
        coll = C.QACollator(_ccfg(struct_dropout=1.0), tok, store, task)
        prompt = instruct.get_prompt(task, num_examples=1)
        batch = coll([(1, 0, True)], prompt)
        U = batch["protein_embeds"].shape[0]
        sm = batch["soft_map"]
        assert not ((sm >= U) & (sm < 2 * U)).any()
        # bank offsets stay stable (struct bank still emitted)
        assert batch["struct_embeds"].shape[0] == U

    def test_retrieval_batch_skips_struct_keeps_drug(self, tok, store):
        lib = instruct.TaskLibrary()
        task = lib.get("drugbank_drug_target_retrieval")
        coll = C.RetrievalCollator(_ccfg(), tok, store, task)
        prompt = instruct.get_prompt(task, num_examples=1)
        batch = coll([(1, 0), (2, 2)], prompt)
        U = batch["protein_embeds"].shape[0]
        sm = batch["soft_map"]
        # retrieval never injects struct (model_unified.py:511-512)
        assert not ((sm >= U) & (sm < 2 * U)).any()
        assert (sm >= 2 * U).any(), "drug soft tokens missing"

    def test_forward_consumes_modalities(self, tok, store, task):
        cfg = _cfg()
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        coll = C.QACollator(_ccfg(), tok, store, task)
        prompt = instruct.get_prompt(task, num_examples=1)
        batch = coll([(1, 0, True), (2, 2, False)], prompt)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "reference_indices"}
        out = unified.forward(params, cfg, dev)
        assert np.isfinite(float(out["lm_loss"]))
        # perturbing drug embeddings must change the logits at drug slots
        dev2 = dict(dev)
        dev2["drug_embeds"] = dev["drug_embeds"] + 3.0
        out2 = unified.forward(params, cfg, dev2)
        assert not np.allclose(np.asarray(out["logits"]),
                               np.asarray(out2["logits"]))
        dev3 = dict(dev)
        dev3["struct_embeds"] = dev["struct_embeds"] - 2.0
        out3 = unified.forward(params, cfg, dev3)
        assert not np.allclose(np.asarray(out["logits"]),
                               np.asarray(out3["logits"]))

    def test_gradients_reach_modality_projectors(self, tok, store, task):
        cfg = _cfg()
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        coll = C.QACollator(_ccfg(), tok, store, task)
        prompt = instruct.get_prompt(task, num_examples=1)
        batch = coll([(1, 0, True), (2, 2, False)], prompt)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "reference_indices"}

        def loss_fn(p):
            return unified.forward(p, cfg, dev)["lm_loss"]

        grads = jax.grad(loss_fn)(params)
        gd = grads["projectors"]["drug_projector"]
        gs = grads["projectors"]["struct_projector"]
        gp = grads["projectors"]["token_projector"]
        assert float(sum(jnp.abs(l["w"]).sum() for l in gd)) > 0
        assert float(sum(jnp.abs(l["w"]).sum() for l in gs)) > 0
        assert float(sum(jnp.abs(l["w"]).sum() for l in gp)) > 0
        # drug and struct projector grads are distinct parameter groups
        assert gd[0]["w"].shape != gs[0]["w"].shape or not np.allclose(
            np.asarray(gd[0]["w"]), np.asarray(gs[0]["w"]))

    def test_store_without_drugs_degrades_gracefully(self, tok, task):
        class NoDrugStore(D.SyntheticStore):
            def has_drug(self, text_idx):
                return False

        store = NoDrugStore(n_proteins=8, n_texts=8, embed_dim=24,
                            struct_dim=20)
        coll = C.QACollator(_ccfg(max_unique_drugs=0), tok, store, task)
        prompt = instruct.get_prompt(task, num_examples=1)
        batch = coll([(1, 0, True)], prompt)
        assert "drug_embeds" not in batch
        U = batch["protein_embeds"].shape[0]
        assert not (batch["soft_map"] >= 2 * U).any()
