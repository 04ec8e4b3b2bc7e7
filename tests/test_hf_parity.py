"""Numerical parity vs HuggingFace transformers (the reference stack's
model substrate, pinned at transformers==4.31.0 behavior — README.md:61).

Tiny randomly-initialized HF models are converted through
models/checkpoint_io and must reproduce HF logits in f32.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from procyon_tpu.models import checkpoint_io, esm2, llama


def _sd_to_numpy(model):
    return {k: v.detach().float().numpy()
            for k, v in model.state_dict().items()}


class TestLlamaParity:
    @pytest.fixture(scope="class")
    def models(self):
        hf_cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()
        cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=2,
                                n_heads=4, n_kv_heads=4, intermediate=128,
                                max_seq_len=64, dtype=jnp.float32,
                                attn_backend="ref", remat=False)
        params = checkpoint_io.convert_hf_llama(_sd_to_numpy(hf), cfg)
        return hf, cfg, params

    def test_logits_match(self, models):
        hf, cfg, params = models
        tokens = np.arange(24).reshape(2, 12) % 128
        with torch.no_grad():
            hf_logits = hf(torch.tensor(tokens)).logits.numpy()
        out = llama.forward(params, cfg, tokens=jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(out["logits"]), hf_logits,
                                   atol=2e-4, rtol=2e-4)

    def test_logits_match_gqa(self):
        hf_cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5,  # must match LlamaConfig.norm_eps
            attention_bias=False, tie_word_embeddings=False)
        torch.manual_seed(1)
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()
        cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=2,
                                n_heads=4, n_kv_heads=2, intermediate=128,
                                max_seq_len=64, dtype=jnp.float32,
                                attn_backend="ref", remat=False)
        params = checkpoint_io.convert_hf_llama(_sd_to_numpy(hf), cfg)
        tokens = (np.arange(16).reshape(1, 16) * 5) % 128
        with torch.no_grad():
            hf_logits = hf(torch.tensor(tokens)).logits.numpy()
        out = llama.forward(params, cfg, tokens=jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(out["logits"]), hf_logits,
                                   atol=2e-4, rtol=2e-4)

    def test_attention_mask_matches(self, models):
        """Right-padded batch: HF attention_mask vs our segment ids."""
        hf, cfg, params = models
        tokens = np.arange(20).reshape(2, 10) % 128
        mask = np.ones((2, 10), np.int64)
        mask[0, 7:] = 0
        tokens_masked = tokens.copy()
        with torch.no_grad():
            hf_logits = hf(torch.tensor(tokens_masked),
                           attention_mask=torch.tensor(mask)).logits.numpy()
        out = llama.forward(params, cfg, tokens=jnp.asarray(tokens),
                            seg_ids=jnp.asarray(mask.astype(np.int32)))
        # compare only non-pad positions
        for b in range(2):
            valid = mask[b] == 1
            np.testing.assert_allclose(
                np.asarray(out["logits"][b])[valid], hf_logits[b][valid],
                atol=2e-4, rtol=2e-4)


class TestESM2Parity:
    @pytest.fixture(scope="class")
    def models(self):
        hf_cfg = transformers.EsmConfig(
            vocab_size=33, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=64, position_embedding_type="rotary",
            token_dropout=True, emb_layer_norm_before=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-5, pad_token_id=1, mask_token_id=32)
        torch.manual_seed(0)
        hf = transformers.EsmForMaskedLM(hf_cfg).eval()
        # installed transformers' EsmModel computes the token-dropout mask
        # ratio over the PADDED length (it stopped passing attention_mask to
        # the embeddings); fair-esm / transformers==4.31.0 use the valid
        # length, which is this framework's default.
        cfg = esm2.ESM2Config(dim=64, n_layers=2, n_heads=4,
                              max_seq_len=64, dtype=jnp.float32,
                              attn_backend="ref", remat=False,
                              token_dropout=True,
                              pad_aware_token_dropout=False)
        params = checkpoint_io.convert_hf_esm2(_sd_to_numpy(hf), cfg)
        return hf, cfg, params

    def test_hidden_and_mlm_logits_match(self, models):
        hf, cfg, params = models
        tokens = np.asarray([[0, 5, 6, 7, 8, 9, 2],
                             [0, 10, 11, 32, 13, 14, 2]])
        with torch.no_grad():
            hf_out = hf(torch.tensor(tokens), output_hidden_states=True)
        out = esm2.forward(params, cfg, jnp.asarray(tokens),
                           return_logits=True)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   hf_out.logits.numpy(),
                                   atol=3e-4, rtol=3e-4)

    def test_padding_matches(self, models):
        hf, cfg, params = models
        tokens = np.asarray([[0, 5, 6, 7, 2, 1, 1]])
        mask = (tokens != 1).astype(np.int64)
        with torch.no_grad():
            hf_logits = hf(torch.tensor(tokens),
                           attention_mask=torch.tensor(mask)).logits.numpy()
        out = esm2.forward(params, cfg, jnp.asarray(tokens),
                           return_logits=True)
        valid = mask[0] == 1
        np.testing.assert_allclose(np.asarray(out["logits"][0])[valid],
                                   hf_logits[0][valid],
                                   atol=3e-4, rtol=3e-4)
