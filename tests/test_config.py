"""Config/args system + data-config factory tests."""
import jax.numpy as jnp
import numpy as np

from procyon_tpu import config as cfg_mod
from procyon_tpu.data import data_config
from procyon_tpu.data.collators import CollatorConfig
from procyon_tpu.data.datasets import SyntheticStore
from procyon_tpu.data.text_tokenizer import WordTokenizer


class TestArgs:
    def test_defaults_build(self):
        margs = cfg_mod.ModelArgs(text_model="tiny",
                                  use_aaseq_embeddings=True,
                                  protein_embed_dim=64, dtype="float32")
        ucfg = cfg_mod.build_model_config(margs)
        assert ucfg.esm is None
        assert ucfg.llama.dim == 128
        assert ucfg.protein_embed_dim == 64

    def test_live_esm_mode(self):
        margs = cfg_mod.ModelArgs(text_model="tiny",
                                  use_aaseq_embeddings=False,
                                  protein_encoder="esm2-8m",
                                  dtype="float32")
        ucfg = cfg_mod.build_model_config(margs)
        assert ucfg.esm is not None and ucfg.esm.dim == 320

    def test_yaml_roundtrip(self, tmp_path):
        y = tmp_path / "cfg.yml"
        y.write_text("lr: 5.0e-5\nmax_steps: 42\ntext_model: llama2-7b\n"
                     "qa_skip_frequency: 3\n")
        targs = cfg_mod.load_yaml_into(cfg_mod.TrainArgs(), str(y))
        margs = cfg_mod.load_yaml_into(cfg_mod.ModelArgs(), str(y))
        assert targs.lr == 5e-5 and targs.max_steps == 42
        assert margs.text_model == "llama2-7b"
        loop = cfg_mod.build_loop_config(targs)
        assert loop.skip_frequency == {"qa": 3}

    def test_parse_all_cli(self):
        targs, dargs, margs = cfg_mod.parse_all(
            ["--max_steps", "7", "--text_model", "tiny",
             "--synthetic", "true"])
        assert targs.max_steps == 7
        assert margs.text_model == "tiny"
        assert dargs.synthetic is True

    def test_optional_float_flags_convert(self):
        targs, _, margs = cfg_mod.parse_all(
            ["--protein_encoder_lr", "5e-5", "--tokenizer_path", "/x/y"])
        assert targs.protein_encoder_lr == 5e-5
        assert isinstance(targs.protein_encoder_lr, float)
        assert margs.tokenizer_path == "/x/y"

    def test_bare_bool_followed_by_garbage_errors_loudly(self):
        import pytest
        with pytest.raises(SystemExit):
            cfg_mod.parse_all(["--resume", "some_extra_token"])

    def test_parse_all_int_flags_with_bool_like_defaults(self):
        """0/1-default int fields must stay ints (`0 == False` footgun)."""
        targs, _, _ = cfg_mod.parse_all(
            ["--eval_steps", "3", "--mesh_data", "4",
             "--retrieval_skip_frequency", "2"])
        assert targs.eval_steps == 3
        assert targs.mesh_data == 4
        assert targs.retrieval_skip_frequency == 2

    def test_freeze_fn(self):
        margs = cfg_mod.ModelArgs(freeze_protein_encoder=True,
                                  freeze_text_encoder=False)
        fn = cfg_mod.freeze_fn(margs)

        class K:
            def __init__(self, key):
                self.key = key

        assert fn((K("esm"),)) is True
        assert fn((K("llama"),)) is False

    def test_reference_recipe_yaml_loads(self):
        targs = cfg_mod.load_yaml_into(cfg_mod.TrainArgs(),
                                       "configs/llama3-full.yml")
        margs = cfg_mod.load_yaml_into(cfg_mod.ModelArgs(),
                                       "configs/llama3-full.yml")
        assert targs.lr == 1e-4
        assert margs.text_model == "llama3-8b"
        assert margs.use_aaseq_embeddings is True
        ucfg = cfg_mod.build_model_config(margs)
        assert ucfg.llama.n_kv_heads == 8  # llama-3 GQA
        assert ucfg.token_projector_hidden == 2560


class TestDataConfigFactory:
    def test_yaml_load(self, tmp_path):
        y = tmp_path / "mix.yml"
        y.write_text(
            "datasets:\n"
            "  - text_type: go\n"
            "    relations: [process]\n"
            "    tasks: [qa, retrieval]\n"
            "  - text_type: omim\n"
            "    relations: [all]\n"
            "    tasks: [caption]\n"
            "    weight: 2.0\n")
        mc = data_config.MultiDatasetConfig.load_from_yaml(str(y))
        assert len(mc.entries) == 2
        assert mc.entries[1].weight == 2.0

    def test_build_streams_synthetic(self):
        mc = data_config.MultiDatasetConfig(entries=[
            data_config.DatasetEntry(text_type="go", relations=["process"],
                                     tasks=["qa", "retrieval"]),
            data_config.DatasetEntry(text_type="omim", relations=["all"],
                                     tasks=["caption"]),
        ])
        store = SyntheticStore(embed_dim=32)
        streams, mixers, states = data_config.build_task_streams(
            mc, store=store, tokenizer=WordTokenizer(),
            collator_cfg=CollatorConfig(max_text_len=128,
                                        protein_embed_dim=32),
            batch_sizes={"qa": 4, "retrieval": 4, "caption": 2},
            synthetic=True)
        assert set(streams) == {"qa", "retrieval", "caption"}
        qa_batch = streams["qa"]()
        assert qa_batch["input_ids"].shape == (4, 128)
        ret_batch = streams["retrieval"]()
        assert ret_batch["conflict_mask"].shape == (4, 4)
        cap_batch = streams["caption"]()
        assert (cap_batch["labels"] != -100).sum() > 0
        assert "qa" in states and "index" in states["qa"]

    def test_default_full_mix_has_all_reference_datasets(self):
        types = {e.text_type for e in data_config.DEFAULT_FULL_MIX.entries}
        for t in ["go", "pfam", "drugbank", "reactome", "ec", "gtop",
                  "omim", "disgenet", "uniprot"]:
            assert t in types


class TestMLMStream:
    def test_mlm_stream_batches(self):
        store = SyntheticStore(embed_dim=32)
        stream = data_config.build_mlm_stream(store, batch_size=4,
                                              n_proteins=32,
                                              max_protein_len=64)
        b1 = stream()
        assert b1["protein_tokens"].shape[0] == 4
        sel = b1["mlm_labels"] != -100
        assert sel.sum() > 0
        b2 = stream()
        # successive batches differ (rng advances)
        assert not (b1["protein_tokens"].shape == b2["protein_tokens"].shape
                    and np.array_equal(b1["protein_tokens"],
                                       b2["protein_tokens"]))


class TestBindMixes:
    def test_peptide_and_ppi_mixes(self):
        store = SyntheticStore(embed_dim=32)
        for path in ["configs/data_configs/peptide_mix.yml",
                     "configs/data_configs/full_mix.yml"]:
            mc = data_config.MultiDatasetConfig.load_from_yaml(path)
            streams, mixers, _ = data_config.build_task_streams(
                mc, store=store, tokenizer=WordTokenizer(),
                collator_cfg=CollatorConfig(max_text_len=256,
                                            protein_embed_dim=32),
                batch_sizes={"qa": 4, "retrieval": 4, "caption": 2},
                synthetic=True)
            assert "qa" in streams and "retrieval" in streams
            for _ in range(6):  # cycle until a PPI/peptide batch appears
                b = streams["qa"]()
                assert (b["labels"] != -100).sum() > 0
            rb = streams["retrieval"]()
            assert rb["ret_target_pos"].shape[0] == 4

    def test_construct_task_id_collapse(self):
        from procyon_tpu.data import instruct
        assert instruct.construct_task_id(
            "peptide", "peptide", "all", "qa") == "peptide_all_qa"
        assert instruct.construct_task_id(
            "protein", "protein", "experiments",
            "retrieval") == "protein_experiments_retrieval"


def test_prefix_tuning_freeze_predicate():
    from procyon_tpu import config as C

    margs = C.ModelArgs(esm_prefix_len=4, freeze_protein_encoder=True)
    frozen = C.freeze_fn(margs)

    class P:  # jax tree path entry stand-in
        def __init__(self, key):
            self.key = key

    assert frozen([P("esm"), P("layers"), P("attn"), P("wq")])
    assert not frozen([P("esm"), P("layers"), P("prefix"), P("k")])
    # without prefix tuning the whole encoder freezes
    margs2 = C.ModelArgs(freeze_protein_encoder=True)
    frozen2 = C.freeze_fn(margs2)
    assert frozen2([P("esm"), P("layers"), P("attn"), P("wq")])
