"""BERT-family encoder + WordPiece tokenizer: HF parity and unit tests.

The encoder (models/bert.py) is the native text tower behind BERTScore and
the BioTranslator/PubMedBERT/SimCSE/ProtST baselines (reference:
procyon/model/pubmedbert.py, biotranslator_tencoder.py,
evaluate/framework/caption.py:68-103).  Parity is checked against a live
transformers BertModel with random weights (torch-cpu is in the image).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.data.wordpiece import WordPieceTokenizer
from procyon_tpu.models import bert


def _tiny_hf_bert():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    model.eval()
    return model


class TestHFParity:
    @pytest.fixture(scope="class")
    def hf_and_native(self):
        model = _tiny_hf_bert()
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params, cfg = bert.convert_hf_state(state, dtype=jnp.float32)
        return model, params, cfg

    def test_config_inferred_from_weights(self, hf_and_native):
        _, _, cfg = hf_and_native
        assert cfg.vocab_size == 128
        assert cfg.dim == 64
        assert cfg.n_layers == 2
        assert cfg.n_heads == 1  # head_dim-64 rule on a 64-dim toy model
        assert cfg.max_position == 64

    def test_hidden_and_pooled_match(self, hf_and_native):
        import torch

        model, params, cfg = hf_and_native
        # the toy model was built with 4 heads; softmax is head-count
        # dependent so override the inferred head count
        import dataclasses

        cfg = dataclasses.replace(cfg, n_heads=4)
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 128, (3, 16)).astype(np.int64)
        ids[1, 10:] = 0
        mask = (ids != 0).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask))
        out = bert.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                           seg_ids=jnp.asarray(mask, jnp.int32))
        got = np.asarray(out["hidden"], np.float32)
        want = ref.last_hidden_state.numpy()
        # padded rows diverge (HF computes them; we mask them) - compare
        # valid positions only
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], want[valid], atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["pooled"], np.float32),
            ref.pooler_output.numpy(), atol=2e-4)

    def test_all_hidden_matches_hf_hidden_states(self, hf_and_native):
        import dataclasses

        import torch

        model, params, cfg = hf_and_native
        cfg = dataclasses.replace(cfg, n_heads=4)
        ids = np.arange(5, 21).reshape(1, 16).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids),
                        output_hidden_states=True)
        out = bert.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                           return_all_hidden=True)
        allh = np.asarray(out["all_hidden"], np.float32)
        assert allh.shape[0] == cfg.n_layers + 1
        for i, h in enumerate(ref.hidden_states):
            np.testing.assert_allclose(allh[i, 0], h.numpy()[0], atol=2e-4)


class TestPoolers:
    def test_mean_ignores_padding(self):
        h = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
        seg = jnp.asarray([[1, 1, 0, 0]])
        got = np.asarray(bert.pool(h, seg, "mean"))
        np.testing.assert_allclose(got[0], [1.5, 2.5, 3.5])

    def test_max_ignores_padding(self):
        h = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
        seg = jnp.asarray([[1, 1, 0, 0]])
        got = np.asarray(bert.pool(h, seg, "max"))
        np.testing.assert_allclose(got[0], [3.0, 4.0, 5.0])

    def test_cls_prefers_pooler_output(self):
        h = jnp.ones((2, 3, 4))
        pooled = jnp.full((2, 4), 7.0)
        got = np.asarray(bert.pool(h, jnp.ones((2, 3)), "cls",
                                   pooled=pooled))
        np.testing.assert_allclose(got, 7.0)
        got2 = np.asarray(bert.pool(h, jnp.ones((2, 3)),
                                    "cls_before_pooler"))
        np.testing.assert_allclose(got2, 1.0)


class TestWordPiece:
    def test_parity_with_hf_bert_tokenizer(self, tmp_path):
        pytest.importorskip("transformers")
        from transformers import BertTokenizer

        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "protein",
                 "bind", "##ing", "the", "q", "##9", "##y", "2", "##6",
                 "膜", ",", "."]
        vf = tmp_path / "vocab.txt"
        vf.write_text("\n".join(vocab) + "\n")
        hf = BertTokenizer(str(vf), do_lower_case=True)
        ours = WordPieceTokenizer.from_vocab_file(str(vf))
        for text in ["The protein BINDING, binding.", "q9y26 protein",
                     "unknownword binding", "the the the"]:
            assert ours.encode(text) == hf.encode(text), text

    def test_longest_match_and_continuation(self):
        tok = WordPieceTokenizer.synthetic(words=["bind", "binding"])
        assert tok.tokenize("binding") == ["binding"]
        assert tok.tokenize("binds") == ["bind", "##s"]

    def test_unknown_char_is_unk(self):
        tok = WordPieceTokenizer.synthetic()
        assert tok.tokenize("a€b") == ["[UNK]"]

    def test_batch_encode_shapes_and_mask(self):
        tok = WordPieceTokenizer.synthetic(words=["cat", "dog"])
        enc = tok.batch_encode(["cat", "cat dog dog"], max_len=16)
        assert enc.ids.shape == enc.attention_mask.shape
        assert enc.ids[0, 0] == tok.cls_id
        assert enc.attention_mask[0].sum() == 3  # cls + cat + sep
        assert enc.attention_mask[1].sum() == 5
        assert (enc.ids[enc.attention_mask == 0] == tok.pad_id).all()

    def test_truncation_keeps_sep(self):
        tok = WordPieceTokenizer.synthetic(words=["cat"])
        ids = tok.encode("cat " * 50, max_len=8)
        assert len(ids) == 8
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id

    def test_decode_rejoins_pieces(self):
        tok = WordPieceTokenizer.synthetic(words=["bind"])
        ids = tok.encode("binds")
        assert tok.decode(ids) == "binds"


class TestForwardBasics:
    def test_shapes_and_pad_invariance(self):
        cfg = bert.tiny_config()
        params = bert.init_params(jax.random.PRNGKey(0), cfg)
        ids = np.full((2, 12), cfg.pad_id, np.int32)
        ids[:, :6] = np.arange(5, 11)
        out = bert.forward(params, cfg, jnp.asarray(ids))
        assert out["hidden"].shape == (2, 12, cfg.dim)
        assert out["pooled"].shape == (2, cfg.dim)
        # adding more padding must not change valid-token hidden states
        ids2 = np.full((2, 16), cfg.pad_id, np.int32)
        ids2[:, :6] = np.arange(5, 11)
        out2 = bert.forward(params, cfg, jnp.asarray(ids2))
        np.testing.assert_allclose(
            np.asarray(out["hidden"])[:, :6],
            np.asarray(out2["hidden"])[:, :6], atol=1e-5)
