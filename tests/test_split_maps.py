"""Named eval-protocol split aliases (VERDICT r3 missing #2).

Reference: procyon/evaluate/framework/constants.py:1-120 SPLIT_MAPS +
it_data_config.py:269-277 (EVAL:-prefixed YAML splits resolve per dataset);
our upgrade: None entries error cleanly instead of silently substituting.
"""

import os

import pytest

pd = pytest.importorskip("pandas")

from procyon_tpu.data import registry as R


class TestResolveEvalSplit:
    def test_alias_resolution(self):
        assert R.resolve_eval_split("protein", "go", "pt_ft") == "eval_pt_ft"
        assert R.resolve_eval_split("protein", "go", "few_shot") == \
            "eval_five_shot"
        assert R.resolve_eval_split("protein", "drugbank", "few_shot") == \
            "eval_two_shot"
        assert R.resolve_eval_split("domain", "pfam", "zero_shot") == \
            "eval_zero_shot"
        assert R.resolve_eval_split("protein", "omim", "zero_shot_easy") == \
            "eval_zero_shot_easy"
        assert R.resolve_eval_split(
            "protein", "ec", "zero_shot_hard") == "eval_zero_shot_hard"

    def test_eval_prefix_syntax(self):
        """The reference's YAML syntax: splits: ["EVAL:zero_shot"]."""
        assert R.resolve_eval_split("protein", "go", "EVAL:zero_shot") == \
            "eval_zero_shot"

    def test_suffixed_text_types(self):
        """drugbank:moa has its own SPLIT_MAPS row."""
        assert R.resolve_eval_split(
            "protein", "drugbank:moa", "pt_ft") == "eval_pt_ft"

    def test_raw_splits_pass_through(self):
        assert R.resolve_eval_split("protein", "go", "test") == "test"
        assert R.resolve_eval_split("protein", "go", "val") == "val"
        assert R.resolve_eval_split(
            "protein", "go", "eval_zero_shot") == "eval_zero_shot"

    def test_none_entries_error_cleanly(self):
        # protein_go has no zero_shot_easy protocol
        with pytest.raises(ValueError, match="zero_shot_easy"):
            R.resolve_eval_split("protein", "go", "zero_shot_easy")
        # disgenet has no pt_ft protocol
        with pytest.raises(ValueError, match="pt_ft"):
            R.resolve_eval_split("protein", "disgenet", "pt_ft")
        # whole-dataset None rows
        with pytest.raises(ValueError, match="no named eval protocols"):
            R.resolve_eval_split("protein", "gtop", "zero_shot")

    def test_unknown_dataset_errors(self):
        with pytest.raises(ValueError, match="not in SPLIT_MAPS"):
            R.resolve_eval_split("protein", "nosuchdb", "zero_shot")

    def test_alias_coverage(self):
        """Every non-None SPLIT_MAPS row covers all five protocol names
        (the reference's KeyError on a missing protocol never fires)."""
        for dset, table in R.SPLIT_MAPS.items():
            if table is None:
                continue
            assert set(table) == set(R.EVAL_SPLIT_ALIASES), dset


N_PROTEINS = 10
N_TEXTS = 4


@pytest.fixture(scope="module")
def split_data_dir(tmp_path_factory):
    """DATA_DIR fixture whose relation CSV carries named eval splits."""
    root = str(tmp_path_factory.mktemp("splitdir"))
    rel_dir = os.path.join(root, "integrated_data", "v1", "protein_go",
                           "random_split")
    os.makedirs(rel_dir)
    rows = []
    for a in range(N_PROTEINS):
        if a < 4:
            split = "train"
        elif a < 6:
            split = "eval_zero_shot_hard"
        elif a < 8:
            split = "eval_five_shot"
        else:
            split = "eval_pt_ft"
        rows.append({"seq_id": a, "text_id": a % N_TEXTS,
                     "relation": "process", "split": split})
    pd.DataFrame(rows).to_csv(os.path.join(
        rel_dir, "protein_go_relations_indexed.unified.csv"), index=False)

    txt_dir = os.path.join(root, "integrated_data", "v1", "go")
    os.makedirs(txt_dir)
    cols = R.column_subset("qa", "go", 5)
    pd.DataFrame([{c: f"go text {i} col {c}" for c in cols}
                  for i in range(N_TEXTS)]).to_pickle(
        os.path.join(txt_dir, "go_info_filtered_composed.pkl"))

    fa_dir = os.path.join(root, "integrated_data", "v1", "protein")
    os.makedirs(fa_dir)
    with open(os.path.join(fa_dir, "protein_sequences.fa"), "w") as f:
        for i in range(N_PROTEINS):
            f.write(f">p{i}\nMKV{'A' * (i + 3)}\n")
    return root


class TestNamedSplitSelection:
    def test_zero_shot_hard_selects_right_relations(self, split_data_dir):
        """VERDICT r3 #3 done criterion: --split zero_shot_hard selects the
        eval_zero_shot_hard relations on a DATA_DIR fixture."""
        from procyon_tpu.data.datasets import ProCyonDataStore
        from procyon_tpu.evaluate.data_loading import load_datasets_for_eval

        store = ProCyonDataStore(split_data_dir)
        datasets = load_datasets_for_eval(
            split_data_dir,
            [{"text_type": "go", "relation": "process",
              "tasks": ["retrieval"]}],
            store=store, split="zero_shot_hard")
        ret = datasets["go_process_retrieval"]
        got = sorted(a for a, _ in ret["eval_relations"])
        assert got == [4, 5]

    @pytest.mark.parametrize("alias,expected", [
        ("few_shot", [6, 7]),
        ("pt_ft", [8, 9]),
    ])
    def test_other_aliases(self, split_data_dir, alias, expected):
        from procyon_tpu.data.datasets import ProCyonDataStore
        from procyon_tpu.evaluate.data_loading import load_datasets_for_eval

        store = ProCyonDataStore(split_data_dir)
        datasets = load_datasets_for_eval(
            split_data_dir,
            [{"text_type": "go", "relation": "process",
              "tasks": ["retrieval"]}],
            store=store, split=alias)
        got = sorted(a for a, _ in
                     datasets["go_process_retrieval"]["eval_relations"])
        assert got == expected

    def test_dataset_config_eval_prefix(self, split_data_dir):
        """DatasetEntry splits: ["EVAL:zero_shot_hard"] resolve through
        the same table in the training data config (it_data_config.py:269
        semantics: the resolved name becomes the dataset key)."""
        import shutil

        from procyon_tpu.data import collators as C
        from procyon_tpu.data import data_config as DC
        from procyon_tpu.data import datasets as D
        from procyon_tpu.data.text_tokenizer import WordTokenizer

        # data_config reads the dataset's CANONICAL split-method dir
        base = os.path.join(split_data_dir, "integrated_data", "v1",
                            "protein_go")
        canon = os.path.join(base, R.canonical_split("go"))
        if not os.path.isdir(canon):
            shutil.copytree(os.path.join(base, "random_split"), canon)

        store = D.ProCyonDataStore(data_dir=split_data_dir)
        cfg = DC.MultiDatasetConfig(entries=[DC.DatasetEntry(
            aaseq_type="protein", text_type="go", relations=["process"],
            tasks=["qa"], splits=["EVAL:zero_shot_hard"])])
        ccfg = C.CollatorConfig(max_text_len=128, protein_embed_dim=8,
                                use_protein_tokens=True)
        streams, mixers, _ = DC.build_task_streams(
            cfg, store=store, collator_cfg=ccfg,
            tokenizer=WordTokenizer(2048), batch_sizes={"qa": 2},
            data_dir=split_data_dir, synthetic=False)
        b = streams["qa"]()
        # only proteins 4 and 5 live in eval_zero_shot_hard
        prots = {int(p) for p in
                 np.asarray(b["reference_indices"]["aaseq"]).ravel()
                 if int(p) >= 0} if "reference_indices" in b else None
        assert b["input_ids"].shape[0] == 2
        if prots is not None:
            assert prots <= {4, 5}, prots
