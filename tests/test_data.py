"""Data-layer tests: tokenizers, prompts, collators, mixing."""
import numpy as np
import pytest

from procyon_tpu.data import collators, datasets, instruct, mixing
from procyon_tpu.data import protein_tokenizer as pt
from procyon_tpu.data.text_tokenizer import WordTokenizer


class TestProteinTokenizer:
    def test_roundtrip_alphabet(self):
        ids = pt.encode("MKVLA")
        assert ids.tolist() == [pt.TOK_TO_IDX[c] for c in "MKVLA"]

    def test_batch_encode_shapes(self):
        b = pt.batch_encode(["MKVLA", "GG"])
        assert b.tokens.shape[0] == 2
        assert b.tokens[0, 0] == pt.CLS_IDX
        assert b.tokens[0, 6] == pt.EOS_IDX
        assert b.tokens[1, 3] == pt.EOS_IDX
        assert (b.group_ids == [0, 1]).all()

    def test_long_protein_split(self):
        seq = "A" * 25
        b = pt.batch_encode([seq, "GG"], max_len=10)
        # 25 residues -> 3 chunks + 1 row for GG
        assert b.tokens.shape[0] == 4
        assert b.group_ids.tolist() == [0, 0, 0, 1]
        assert b.num_groups == 2

    def test_mlm_masking(self):
        rng = np.random.default_rng(0)
        b = pt.batch_encode(["MKVLAMKVLAMKVLAMKVLA"] * 4)
        masked, labels = pt.mask_for_mlm(b.tokens, rng)
        sel = labels != -100
        assert sel.sum() > 0
        # unselected positions unchanged
        assert (masked[~sel] == b.tokens[~sel]).all()
        # labels hold original tokens
        assert (labels[sel] == b.tokens[sel]).all()
        # cls/eos/pad never masked
        assert not np.isin(b.tokens[sel],
                           [pt.PAD_IDX, pt.CLS_IDX, pt.EOS_IDX]).any()


class TestInstruct:
    def setup_method(self):
        self.lib = instruct.TaskLibrary()

    def test_library_has_all_families(self):
        avail = self.lib.available()
        assert len(avail) == 65
        for stem in ["go_process_qa", "drugbank_drug_target_retrieval",
                     "omim_all_caption", "protein_experiments_qa",
                     "peptide_all_retrieval"]:
            assert stem in avail

    def test_qa_prompt_structure(self):
        task = self.lib.get("go_process_qa")
        p = instruct.get_prompt(task, num_examples=1)
        assert p.text.startswith("Definition: ")
        assert "Positive example 1" in p.text
        assert "Negative example 1" in p.text
        assert "Now, complete the following instance" in p.text
        assert p.text.endswith("[ANSWER] {answer}")
        # 1 pos + 1 neg example protein + 1 query protein
        assert p.n_protein_slots == 3
        assert p.n_ext_slots == 3

    def test_retrieval_prompt_has_prot_token(self):
        task = self.lib.get("go_process_retrieval")
        p = instruct.get_prompt(task, num_examples=1)
        assert "[PROT]" in p.text
        assert p.text.count("<|protein|>") == 1  # only the ICL example

    def test_caption_prompt_ends_with_ext(self):
        task = self.lib.get("omim_all_caption")
        p = instruct.get_prompt(task, num_examples=1)
        assert p.text.endswith("Output: [ANSWER] [EXT]")

    def test_ppi_prompt(self):
        task = self.lib.get("protein_experiments_qa")
        p = instruct.get_prompt(task, num_examples=1, is_ppi=True)
        assert p.text.count("<|protein|>") == 2 * 2 + 2  # 2/example + query

    def test_construct_task_id(self):
        assert instruct.construct_task_id(
            "protein", "go", "process", "qa") == "go_process_qa"
        assert instruct.construct_task_id(
            "domain", "pfam", "all", "qa") == "domain_pfam_all_qa"


def make_collator(cls, **kw):
    store = datasets.SyntheticStore(embed_dim=32)
    cfg = collators.CollatorConfig(max_text_len=256, protein_embed_dim=32,
                                   **kw)
    tok = WordTokenizer()
    lib = instruct.TaskLibrary()
    return store, cfg, tok, lib


class TestQACollator:
    def test_batch_contract(self):
        store, cfg, tok, lib = make_collator(collators.QACollator)
        task = lib.get("go_process_qa")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.QACollator(cfg, tok, store, task)
        batch = coll([(5, 7, True), (9, 11, False)], prompt)
        B, L = batch["input_ids"].shape
        assert (B, L) == (2, 256)
        assert batch["seg_ids"].shape == (2, 256)
        assert batch["soft_map"].max() >= 0
        # labels only after [ANSWER]
        sup = batch["labels"] != -100
        assert sup.sum() > 0
        for b in range(B):
            ans = batch["answer_pos"][b]
            assert not sup[b, :ans + 1].any()
        # yes/no answer token present in supervised region
        row0 = batch["labels"][0][sup[0]]
        assert tok.spec.yes_id in row0.tolist()
        row1 = batch["labels"][1][sup[1]]
        assert tok.spec.no_id in row1.tolist()

    def test_unique_protein_dedup(self):
        store, cfg, tok, lib = make_collator(collators.QACollator)
        task = lib.get("go_process_qa")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.QACollator(cfg, tok, store, task)
        # both rows query protein 5 -> ICL example proteins + 1 unique query
        batch = coll([(5, 7, True), (5, 11, False)], prompt)
        n_unique = len(set(prompt.example_aaseq_ids) | {5})
        assert batch["protein_embeds"].shape[0] == n_unique

    def test_live_encoder_mode(self):
        store, cfg, tok, lib = make_collator(
            collators.QACollator, use_protein_tokens=True)
        task = lib.get("go_process_qa")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.QACollator(cfg, tok, store, task)
        batch = coll([(5, 7, True)], prompt)
        assert "protein_tokens" in batch
        assert batch["protein_tokens"][0, 0] == pt.CLS_IDX


class TestRetrievalCollator:
    def test_batch_contract(self):
        store, cfg, tok, lib = make_collator(collators.RetrievalCollator)
        task = lib.get("go_process_retrieval")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.RetrievalCollator(cfg, tok, store, task)
        batch = coll([(3, 4), (5, 6), (7, 8)], prompt)
        assert batch["ret_pos"].shape == (3,)
        # [PROT] token sits at ret_pos
        for b in range(3):
            assert batch["input_ids"][b, batch["ret_pos"][b]] == \
                tok.spec.prot_query_id
        assert batch["ret_target_pos"].shape == (3,)
        assert batch["conflict_mask"].shape == (3, 3)
        assert (np.diag(batch["conflict_mask"]) == 1).all()

    def test_conflict_mask_same_text(self):
        store, cfg, tok, lib = make_collator(collators.RetrievalCollator)
        task = lib.get("go_process_retrieval")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.RetrievalCollator(cfg, tok, store, task)
        # rows 0 and 1 share text 4 -> mutual conflict
        batch = coll([(3, 4), (5, 4), (7, 8)], prompt)
        m = batch["conflict_mask"]
        assert m[0, 1] == 0 and m[1, 0] == 0
        assert m[0, 2] == 1

    def test_known_pair_conflict(self):
        store, cfg, tok, lib = make_collator(collators.RetrievalCollator)
        task = lib.get("go_process_retrieval")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.RetrievalCollator(
            cfg, tok, store, task, known_positive_pairs={(5, 4)})
        batch = coll([(3, 4), (5, 6)], prompt)
        # protein 5 (row 1) is a known positive for text 4 (row 0)
        assert batch["conflict_mask"][0, 1] == 0


class TestCaptionCollator:
    def test_training_batch(self):
        store, cfg, tok, lib = make_collator(collators.CaptionCollator)
        task = lib.get("omim_all_caption")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.CaptionCollator(cfg, tok, store, task)
        batch = coll([(3, 4), (5, 6)], prompt)
        sup = batch["labels"] != -100
        assert sup.sum() > 0
        # supervised region tokens == the caption tokens + eos
        b0 = batch["labels"][0][sup[0]]
        cap_ids = tok.encode(store.text(4))
        assert b0.tolist()[:len(cap_ids)] == cap_ids[:len(b0)]
        assert b0[-1] == tok.spec.eos_id

    def test_generation_batch_left_padded(self):
        store, cfg, tok, lib = make_collator(collators.CaptionCollator)
        task = lib.get("omim_all_caption")
        prompt = instruct.get_prompt(task, num_examples=1)
        coll = collators.CaptionCollator(cfg, tok, store, task)
        batch = coll([(3, 4)], prompt, for_generation=True)
        assert "labels" not in batch
        seg = batch["seg_ids"][0]
        # left-padded: zeros then ones
        first_one = int(np.argmax(seg))
        assert (seg[first_one:] == 1).all()
        assert (seg[:first_one] == 0).all()
        # prompt ends at the final position
        assert batch["input_ids"][0, -1] != 0


class TestMixer:
    def make(self, rank=0, world=1):
        store = datasets.SyntheticStore()
        rels_a = [(i, i) for i in range(20)]
        rels_b = [(i, i + 1) for i in range(12)]
        ds_a = datasets.AASeqTextRelationDataset(rels_a, store, name="a")
        ds_b = datasets.AASeqTextRelationDataset(rels_b, store, name="b")
        return mixing.TaskMixer({"a": ds_a, "b": ds_b},
                                {"a": 4, "b": 3}, seed=1, rank=rank,
                                world_size=world)

    def test_deterministic(self):
        m = self.make()
        s = mixing.MixerState()
        seq1 = [(k, tuple(v)) for k, v, _ in
                list(__import__("itertools").islice(m.iterate(s), 10))]
        seq2 = [(k, tuple(v)) for k, v, _ in
                list(__import__("itertools").islice(m.iterate(s), 10))]
        assert seq1 == seq2

    def test_resume_mid_epoch(self):
        import itertools
        m = self.make()
        full = list(itertools.islice(m.iterate(mixing.MixerState()), 8))
        # resume from state after item 4
        _, _, state4 = full[3]
        resumed = list(itertools.islice(m.iterate(state4), 4))
        want = [(k, tuple(v)) for k, v, _ in full[4:8]]
        got = [(k, tuple(v)) for k, v, _ in resumed]
        assert want == got

    def test_rank_sharding_partitions(self):
        import itertools
        n = self.make().epoch_length()
        all_items = []
        for rank in range(2):
            m = self.make(rank=rank, world=2)
            items = list(itertools.islice(
                m.iterate(mixing.MixerState()), n // 2))
            all_items.extend((k, tuple(v)) for k, v, _ in items)
        # no overlap between ranks
        assert len(set(all_items)) == len(all_items)

    def test_batches_are_complete(self):
        import itertools
        m = self.make()
        for k, idxs, _ in itertools.islice(m.iterate(mixing.MixerState()), 7):
            assert len(idxs) == m.batch_sizes[k]


class TestNegativeSampling:
    def test_avoids_true_pairs(self):
        rng = np.random.default_rng(0)
        true = {1, 2, 3}
        for _ in range(10):
            negs = datasets.negative_sampling_random_tail(0, 10, 4, true, rng)
            assert not (set(negs.tolist()) & true)
            assert 0 not in negs


class TestProCyonDataStore:
    def test_fasta_sequences_via_native_index(self, tmp_path):
        d = tmp_path / "integrated_data" / "v1" / "protein"
        d.mkdir(parents=True)
        (d / "protein_sequences.fa").write_text(
            ">P1\nMKVLA\nGGH\n>P2\nACDEF\n")
        store = datasets.ProCyonDataStore(str(tmp_path))
        assert store.protein_sequence(0) == "MKVLAGGH"
        assert store.protein_sequence(1) == "ACDEF"


class TestRephrasings:
    def test_task_json_has_variants(self):
        from procyon_tpu.data import instruct
        lib = instruct.TaskLibrary()
        task = lib.get("go_process_qa")
        assert instruct.n_prompt_variants(task) == 5
        for v in task["Rephrasings"]:
            assert "{Biological Summary}" in v["Definition"]
            assert v["level"] in ("rephrasing", "summarisation",
                                  "simplification")

    def test_rephrased_prompt_same_structure(self):
        from procyon_tpu.data import instruct
        lib = instruct.TaskLibrary()
        task = lib.get("go_process_qa")
        base = instruct.get_prompt(task, num_examples=1)
        texts = set()
        for r in range(instruct.n_prompt_variants(task)):
            p = instruct.get_prompt(task, num_examples=1, rephrase_idx=r)
            # marker structure identical, wording different
            assert p.n_protein_slots == base.n_protein_slots
            assert p.n_ext_slots == base.n_ext_slots
            assert p.text.count("[ANSWER]") == base.text.count("[ANSWER]")
            texts.add(p.text)
        assert len(texts) == 5  # all distinct wordings

    def test_stream_samples_rephrasings(self):
        import numpy as np
        from procyon_tpu.data import collators as C
        from procyon_tpu.data import data_config as DC
        from procyon_tpu.data import datasets
        from procyon_tpu.data.text_tokenizer import WordTokenizer

        store = datasets.SyntheticStore(n_proteins=32, n_texts=16)
        cfg = DC.MultiDatasetConfig(entries=[DC.DatasetEntry(
            aaseq_type="protein", text_type="go",
            relations=["process"],
            tasks=["qa"], splits=["train"], weight=1.0)])
        ccfg = C.CollatorConfig(max_text_len=128, protein_embed_dim=store.embed_dim,
                                use_task_def_rephrasings=True)
        streams, _, _ = DC.build_task_streams(
            cfg, store=store, collator_cfg=ccfg,
            tokenizer=WordTokenizer(2048), batch_sizes={"qa": 4},
            seed=0, synthetic=True)
        seen = set()
        for _ in range(20):
            b = streams["qa"]()
            assert "rephrase_indicator" in b
            seen.add(int(b["rephrase_indicator"]))
        assert len(seen) > 1, seen  # actually samples different variants
        assert max(seen) <= 4 and min(seen) >= 0

    def test_entity_rephrasings_sampled(self):
        import numpy as np
        from procyon_tpu.data import collators as C
        from procyon_tpu.data import datasets, instruct
        from procyon_tpu.data.text_tokenizer import WordTokenizer

        store = datasets.SyntheticStore(n_proteins=8, n_texts=4)
        assert store.text_variant(1, 0) != store.text(1)
        lib = instruct.TaskLibrary()
        task = lib.get("go_process_caption")
        prompt = instruct.get_prompt(task, num_examples=1)
        tok = WordTokenizer(2048)
        cfg = C.CollatorConfig(max_text_len=128,
                               protein_embed_dim=store.embed_dim,
                               use_entity_rephrasings=True,
                               entity_rephrase_prob=1.0)
        coll = C.CaptionCollator(cfg, tok, store, task)
        base_coll = C.CaptionCollator(
            C.CollatorConfig(max_text_len=128,
                             protein_embed_dim=store.embed_dim),
            tok, store, task)
        b1 = coll([(0, 1)], prompt)
        b2 = base_coll([(0, 1)], prompt)
        # rephrased caption target differs from the canonical one
        assert not np.array_equal(b1["input_ids"], b2["input_ids"])


class TestSimNegativeSampler:
    def test_sims_bias_sampling(self):
        import numpy as np
        from procyon_tpu.data import datasets as D
        n = 64
        # protein 0's similarity row: heavily favors proteins 1 and 2
        sims = np.full((n, n), 1e-3)
        sims[5, 1] = sims[5, 2] = 10.0
        s = D.SimNegativeSampler(n, 8, {(5, 0)}, num_neg_protein=1,
                                 protein_sims=sims)
        rng = np.random.default_rng(0)
        hits = sum(s.sample(5, 0, rng)[0][0] in (1, 2) for _ in range(200))
        assert hits > 150, hits   # hard negatives dominate

    def test_mask_excludes(self):
        import numpy as np
        from procyon_tpu.data import datasets as D
        n = 16
        mask = np.zeros((n, n)); mask[:, 8:] = 1.0  # only upper half valid
        s = D.SimNegativeSampler(n, 4, set(), num_neg_protein=2,
                                 protein_mask=mask)
        rng = np.random.default_rng(0)
        for _ in range(50):
            negs, _ = s.sample(3, 0, rng)
            assert all(g >= 8 for g in negs), negs

    def test_avoids_true_set_and_self(self):
        import numpy as np
        from procyon_tpu.data import datasets as D
        sims = np.ones((8, 8))
        s = D.SimNegativeSampler(8, 4, {(1, 0), (2, 0)}, num_neg_protein=3,
                                 protein_sims=sims)
        rng = np.random.default_rng(1)
        for _ in range(30):
            negs, _ = s.sample(1, 0, rng)
            assert 1 not in negs and 2 not in negs


def test_aux_embedding_loaders(tmp_path):
    import numpy as np
    import torch
    from procyon_tpu.data import datasets as D

    store = D.ProCyonDataStore(data_dir=str(tmp_path))
    # torch .pt round trip
    p = tmp_path / "drug_struct.pt"
    torch.save(torch.arange(12, dtype=torch.float32).reshape(3, 4), str(p))
    out = store.drug_structure_embeddings(str(p))
    assert out.shape == (3, 4) and out.dtype == np.float32
    # npy path
    q = tmp_path / "prot_struct.npy"
    np.save(str(q), np.ones((2, 5), np.float32))
    assert store.protein_struct_embeddings(str(q)).shape == (2, 5)


class TestRegistry:
    def test_column_subsets_v5(self):
        from procyon_tpu.data import registry as R
        cols = R.column_subset("qa", "go", 5)
        assert cols and all(isinstance(c, str) for c in cols)
        # drugbank task variants resolve (drugbank:moa has its own entry
        # or falls back to the base dataset)
        assert R.column_subset("caption", "drugbank:moa", 5) is not None
        assert R.column_subset("qa", "protein", 5) is None  # PPI: no text

    def test_dataset_ids_and_splits(self):
        from procyon_tpu.data import registry as R
        assert R.dataset_id("drugbank:moa") == R.dataset_id("drugbank")
        assert R.dataset_id("go") != R.dataset_id("pfam")
        assert R.canonical_split("pfam").endswith("pfam_centric")
        assert R.canonical_split("unknown_ds") == "random_split"

    def test_caption_weights(self):
        from procyon_tpu.data import registry as R
        assert R.caption_weight("protein", "go") == 0.5
        assert R.caption_weight("protein", "nonexistent") == 1.0

    def test_real_path_binds_text_table(self, tmp_path):
        """build_task_streams on a fabricated DATA_DIR must route text
        lookups through TextTableStore with registry columns."""
        import os
        import numpy as np
        import pandas as pd
        from procyon_tpu.data import collators as C
        from procyon_tpu.data import data_config as DC
        from procyon_tpu.data import datasets as D
        from procyon_tpu.data import registry as R
        from procyon_tpu.data.text_tokenizer import WordTokenizer

        root = str(tmp_path)
        split = R.canonical_split("go")
        rel_dir = os.path.join(root, "integrated_data", "v1", "protein_go",
                               split)
        os.makedirs(rel_dir)
        pd.DataFrame([{"seq_id": a, "text_id": a % 4,
                       "relation": "process", "split": "train"}
                      for a in range(8)]).to_csv(os.path.join(
            rel_dir, "protein_go_relations_indexed.unified.csv"),
            index=False)
        txt_dir = os.path.join(root, "integrated_data", "v1", "go")
        os.makedirs(txt_dir)
        cols = R.column_subset("qa", "go", 5)
        pd.DataFrame([{c: f"text {i} col {c}" for c in cols}
                      for i in range(4)]).to_pickle(
            os.path.join(txt_dir, "go_info_filtered_composed.pkl"))
        fa_dir = txt_dir.replace("go", "protein")
        os.makedirs(fa_dir, exist_ok=True)
        with open(os.path.join(fa_dir, "protein_sequences.fa"), "w") as f:
            for i in range(8):
                f.write(f">p{i}\nMKV{'A' * (i + 3)}\n")

        store = D.ProCyonDataStore(data_dir=root)
        cfg = DC.MultiDatasetConfig(entries=[DC.DatasetEntry(
            aaseq_type="protein", text_type="go", relations=["process"],
            tasks=["qa"])])
        ccfg = C.CollatorConfig(max_text_len=128, protein_embed_dim=8,
                                use_protein_tokens=True)
        streams, _, _ = DC.build_task_streams(
            cfg, store=store, collator_cfg=ccfg,
            tokenizer=WordTokenizer(2048), batch_sizes={"qa": 2},
            data_dir=root, synthetic=False)
        b = streams["qa"]()
        assert "protein_tokens" in b and b["input_ids"].shape[0] == 2


class TestICLDemonstrationSampling:
    """sample_demonstrations_for_prompts equivalent
    (instruct_constructor.py:368): rng-driven demonstration choice."""

    def test_rng_samples_different_examples(self):
        import numpy as np
        from procyon_tpu.data import instruct

        lib = instruct.TaskLibrary()
        task = lib.get("go_process_qa")
        base = instruct.get_prompt(task, num_examples=1)
        seen = set()
        for seed in range(12):
            p = instruct.get_prompt(task, num_examples=1,
                                    rng=np.random.default_rng(seed))
            # prompt structure is preserved; only the demonstration differs
            assert p.n_ext_slots == base.n_ext_slots
            assert p.n_protein_slots == base.n_protein_slots
            seen.add(tuple(p.example_text_ids))
        if len(task.get("Positive Examples", [])) > 1:
            assert len(seen) > 1, "rng never changed the sampled examples"

    def test_no_rng_is_deterministic_first_n(self):
        from procyon_tpu.data import instruct

        lib = instruct.TaskLibrary()
        task = lib.get("go_process_qa")
        a = instruct.get_prompt(task, num_examples=1)
        b = instruct.get_prompt(task, num_examples=1)
        assert a.text == b.text
        assert a.example_text_ids == b.example_text_ids


class TestConflictIdEncoding:
    """Cross-dataset conflict-id safety (VERDICT r2 weak #5): the stride
    must keep ids from different datasets disjoint, loudly."""

    def test_no_alias_across_datasets(self):
        # ids that WOULD have collided under the old 1e7 stride:
        # ds 0 text 10_000_001 vs ds 1 text 1
        a = collators.encode_conflict_ids(0, [10_000_001])
        b = collators.encode_conflict_ids(1, [1])
        assert a[0] != b[0]

    def test_same_dataset_same_text_collides(self):
        a = collators.encode_conflict_ids(3, [7, 7, 9])
        assert a[0] == a[1] and a[0] != a[2]

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError, match="conflict id out of range"):
            collators.encode_conflict_ids(1, [collators.CONFLICT_ID_STRIDE])
        with pytest.raises(ValueError, match="conflict id out of range"):
            collators.encode_conflict_ids(1, [-1])

    def test_dtype_int64(self):
        assert collators.encode_conflict_ids(2, [5]).dtype == np.int64
