"""Round-trip tests for the released-checkpoint baseline converters
(VERDICT r3 weak #2): synthesize torch checkpoints in the released layouts,
convert through load_torch_state / convert_biotranslator_*, and assert f32
forward agreement with a direct torch forward.

Reference layouts: procyon/evaluate/framework/biotranslator.py:171-217
(TextEncoder: text.transformer.* BERT + text.proj.* bias-free mlp head),
conv1d_{i}/fc_seq naming :120-136 (BioDataEncoder).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from procyon_tpu.evaluate.baselines import text_models as tm
from procyon_tpu.models import bert


class _TorchBioDataEncoder(torch.nn.Module):
    """The released BioDataEncoder 'seqs' tower, verbatim semantics
    (biotranslator.py:120-160): parallel conv1d_{i} + global max pool,
    concat, Linear + LeakyReLU."""

    def __init__(self, cfg: tm.CNNConfig):
        super().__init__()
        self.cfg = cfg
        for i, k in enumerate(cfg.kernels):
            setattr(self, f"conv1d_{i}",
                    torch.nn.Conv1d(cfg.in_channels, cfg.out_channels, k))
        self.fc_seq = torch.nn.Sequential(
            torch.nn.Linear(len(cfg.kernels) * cfg.out_channels,
                            cfg.hidden_dim),
            torch.nn.LeakyReLU(inplace=True))

    def forward(self, x):  # x [B, C_in, L]
        feats = []
        for i, k in enumerate(self.cfg.kernels):
            y = getattr(self, f"conv1d_{i}")(x)
            feats.append(torch.nn.functional.max_pool1d(
                y, self.cfg.seq_length - k + 1).squeeze(-1))
        return self.fc_seq(torch.cat(feats, dim=1))


class TestCnnConverter:
    def test_roundtrip_forward_agreement(self, tmp_path):
        cfg = tm.CNNConfig(out_channels=8, max_kernel=25, seq_length=64,
                           hidden_dim=16)
        torch.manual_seed(0)
        ref = _TorchBioDataEncoder(cfg)
        ref.eval()
        path = str(tmp_path / "data_encoder.pth")
        torch.save(ref.state_dict(), path)

        state = tm.load_torch_state(path)
        params = tm.convert_biotranslator_cnn(state, cfg)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, cfg.seq_length, 21)).astype(np.float32)
        got = np.asarray(tm.cnn_forward(params, cfg, jnp.asarray(x)))
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_transposed_weight_would_fail(self, tmp_path):
        """Sanity that the parity above has teeth: feeding the torch
        [C_out, C_in, k] weight UN-transposed produces different outputs
        (the silent-bug class VERDICT flagged)."""
        cfg = tm.CNNConfig(out_channels=21, max_kernel=17, seq_length=64,
                           hidden_dim=16)  # square C_in==C_out so it runs
        torch.manual_seed(1)
        ref = _TorchBioDataEncoder(cfg)
        path = str(tmp_path / "enc.pth")
        torch.save(ref.state_dict(), path)
        state = tm.load_torch_state(path)
        params = tm.convert_biotranslator_cnn(state, cfg)
        bad = {
            "convs": [{"w": jnp.asarray(state[f"conv1d_{i}.weight"]
                                        .transpose(2, 0, 1)),  # wrong axes
                       "b": c["b"]}
                      for i, c in enumerate(params["convs"])],
            "fc_w": params["fc_w"], "fc_b": params["fc_b"],
        }
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, cfg.seq_length, 21)),
                        jnp.float32)
        good_out = np.asarray(tm.cnn_forward(params, cfg, x))
        bad_out = np.asarray(tm.cnn_forward(bad, cfg, x))
        assert not np.allclose(good_out, bad_out)


def _tiny_hf_bert():
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


class TestTextConverter:
    def test_roundtrip_forward_agreement(self, tmp_path):
        """Released TextEncoder layout: text.transformer.* BERT weights +
        text.proj.{0,2}.weight bias-free Linear-GELU-Linear head
        (open_clip HFTextEncoder proj='mlp', biotranslator.py:171-217 +
        biotranslator_tencoder.py:186-192)."""
        model = _tiny_hf_bert()
        d = 64
        hidden = (d + 32) // 2
        torch.manual_seed(2)
        proj = torch.nn.Sequential(
            torch.nn.Linear(d, hidden, bias=False),
            torch.nn.GELU(),
            torch.nn.Linear(hidden, 32, bias=False))
        proj.eval()

        state = {f"text.transformer.{k}": v
                 for k, v in model.state_dict().items()}
        state.update({f"text.proj.{i}.weight": m.weight
                      for i, m in enumerate(proj) if hasattr(m, "weight")})
        path = str(tmp_path / "text_encoder.pth")
        torch.save(state, path)

        loaded = tm.load_torch_state(path)
        params, cfg, mlp = tm.convert_biotranslator_text(
            loaded, dtype=jnp.float32)
        assert mlp is not None and len(mlp.ws) == 2
        # the toy model is 4-head at dim 64; the converter's head-dim-64
        # rule infers 1 — override like the bert parity test
        cfg = dataclasses.replace(cfg, n_heads=4)

        rng = np.random.default_rng(0)
        ids = rng.integers(5, 128, (3, 16)).astype(np.int64)
        mask = np.ones_like(ids)
        out = bert.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                           seg_ids=jnp.asarray(mask, jnp.int32))
        # cls-token pooling + mlp proj (TextEncoder pooler_type=cls_pooler)
        got = np.asarray(tm.apply_proj(mlp, out["hidden"][:, 0]),
                         np.float32)
        with torch.no_grad():
            ref_h = model(input_ids=torch.from_numpy(ids),
                          attention_mask=torch.from_numpy(mask)
                          ).last_hidden_state[:, 0]
            want = proj(ref_h).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestLoadTorchState:
    def test_model_nesting_and_non_tensors(self, tmp_path):
        """Released checkpoints sometimes nest under 'model' and carry
        non-tensor metadata entries; both are handled."""
        path = str(tmp_path / "nested.pth")
        torch.save({"model": {"a.weight": torch.ones(2, 3),
                              "step": 7}}, path)
        state = tm.load_torch_state(path)
        assert set(state) == {"a.weight"}
        assert state["a.weight"].dtype == np.float32
        np.testing.assert_array_equal(state["a.weight"], np.ones((2, 3)))
