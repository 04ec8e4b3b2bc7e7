"""Context augmentation + PPI collator tests."""
import numpy as np

from procyon_tpu.data import collators, context, datasets, instruct
from procyon_tpu.data.text_tokenizer import WordTokenizer


def setup():
    store = datasets.SyntheticStore(embed_dim=32)
    cfg = collators.CollatorConfig(max_text_len=256, protein_embed_dim=32)
    tok = WordTokenizer()
    lib = instruct.TaskLibrary()
    return store, cfg, tok, lib


class TestContext:
    def test_ontology_ancestors(self):
        prov = context.OntologyAncestorContext(
            parents={5: [3], 3: [1]}, names={3: "kinase activity",
                                             1: "catalytic activity"})
        c = prov.context("go", 5)
        assert "kinase activity" in c and "catalytic activity" in c
        assert prov.context("go", 99) == ""

    def test_entity_description(self):
        prov = context.EntityDescriptionContext({7: "a rare disease"})
        assert "a rare disease" in prov.context("omim", 7)
        assert prov.context("omim", 8) == ""

    def test_composed(self):
        p = context.ComposedContext([
            context.EntityDescriptionContext({1: "alpha"}),
            context.EntityDescriptionContext({1: "beta"})])
        c = p.context("x", 1)
        assert "alpha" in c and "beta" in c

    def test_collator_splices_context(self):
        store, cfg, tok, lib = setup()
        task = lib.get("omim_all_qa")
        prompt = instruct.get_prompt(task, num_examples=1)
        prov = context.EntityDescriptionContext(
            {11: "distinctivecontextmarker progressive weakness"})
        coll = collators.QACollator(cfg, tok, store, task,
                                    context_provider=prov)
        batch = coll([(5, 11, True)], prompt)
        marker_id = tok.encode("distinctivecontextmarker")[0]
        assert marker_id in batch["input_ids"][0].tolist()
        # without provider the marker is absent
        coll2 = collators.QACollator(cfg, tok, store, task)
        batch2 = coll2([(5, 11, True)], prompt)
        assert marker_id not in batch2["input_ids"][0].tolist()


class TestPPICollators:
    def test_ppi_qa(self):
        store, cfg, tok, lib = setup()
        task = lib.get("protein_experiments_qa")
        prompt = instruct.get_prompt(task, num_examples=1, is_ppi=True)
        coll = collators.PPIQACollator(cfg, tok, store, task)
        batch = coll([(3, 4, True), (5, 6, False)], prompt)
        # 2 example pairs x2 + query pair = 6 protein slots per row
        assert (batch["soft_map"][0] >= 0).sum() == 6
        sup = batch["labels"] != -100
        assert sup.sum() > 0
        assert tok.spec.yes_id in batch["labels"][0][sup[0]].tolist()
        assert tok.spec.no_id in batch["labels"][1][sup[1]].tolist()

    def test_ppi_retrieval(self):
        store, cfg, tok, lib = setup()
        task = lib.get("protein_experiments_retrieval")
        prompt = instruct.get_prompt(task, num_examples=1, is_ppi=True)
        coll = collators.PPIRetrievalCollator(cfg, tok, store, task)
        batch = coll([(3, 4), (5, 6)], prompt)
        for b in range(2):
            assert batch["input_ids"][b, batch["ret_pos"][b]] == \
                tok.spec.prot_query_id
        # targets are the second proteins
        embeds = batch["protein_embeds"]
        t0 = embeds[batch["ret_target_pos"][0]]
        np.testing.assert_allclose(t0, store.protein_embedding(4))

    def test_ppi_retrieval_conflict_on_known_pair(self):
        store, cfg, tok, lib = setup()
        task = lib.get("protein_experiments_retrieval")
        prompt = instruct.get_prompt(task, num_examples=1, is_ppi=True)
        coll = collators.PPIRetrievalCollator(cfg, tok, store, task)
        # (3,6) is in-batch: row0 query=3, row1 target=6; since (3,6) is a
        # batch pair... use duplicate pair to force conflict
        batch = coll([(3, 4), (3, 4)], prompt)
        assert batch["conflict_mask"][0, 1] == 0
