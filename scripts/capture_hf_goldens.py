"""One-off golden capture (SURVEY.md §7 hard-part 1, VERDICT round-1 #6).

Freezes HF-stack behavior into checked-in fixtures so parity tests assert
against CAPTURED tensors, not whatever transformers happens to be
installed: tiny random-seeded Llama (MHA + GQA) and ESM2 models' state
dicts + input tokens + output logits, plus ESM2 token-dropout scale
factors under BOTH semantics (pad-aware = transformers==4.31.0 /
fair-esm, which pass attention_mask into the embedding layer; full-length
= newer transformers, which dropped it — the reference pin's known trap,
README.md:61).

Run once per fixture refresh:  python scripts/capture_hf_goldens.py
Outputs tests/goldens/*.npz (+ provenance json).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "goldens")


def capture_llama():
    import torch
    import transformers

    out = {}
    for name, kv_heads in (("mha", 4), ("gqa", 2)):
        cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=kv_heads, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
            tie_word_embeddings=False)
        torch.manual_seed(0 if name == "mha" else 1)
        hf = transformers.LlamaForCausalLM(cfg).eval()
        tokens = (np.arange(24).reshape(2, 12) * 7 + 3) % 128
        with torch.no_grad():
            logits = hf(torch.tensor(tokens)).logits.numpy()
        blob = {f"sd/{k}": v.detach().float().numpy()
                for k, v in hf.state_dict().items()}
        blob["tokens"] = tokens.astype(np.int32)
        blob["logits"] = logits.astype(np.float32)
        blob["kv_heads"] = np.int32(kv_heads)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"llama_{name}.npz"),
                            **blob)
        out[f"llama_{name}"] = {"logits_shape": list(logits.shape)}
    return out


def capture_esm2():
    import torch
    import transformers

    cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=130, position_embedding_type="rotary",
        token_dropout=True, layer_norm_eps=1e-5, pad_token_id=1,
        mask_token_id=32, emb_layer_norm_before=False)
    torch.manual_seed(2)
    hf = transformers.EsmForMaskedLM(cfg).eval()

    rng = np.random.default_rng(0)
    tokens = np.full((2, 20), 1, np.int64)     # pad = 1
    tokens[0, 0] = 0                            # cls
    tokens[0, 1:15] = rng.integers(4, 24, 14)
    tokens[0, 4] = 32                           # a <mask> token
    tokens[0, 15] = 2                           # eos
    tokens[1, 0] = 0
    tokens[1, 1:10] = rng.integers(4, 24, 9)
    tokens[1, 10] = 2
    attn = (tokens != 1).astype(np.int64)
    with torch.no_grad():
        logits = hf(torch.tensor(tokens),
                    attention_mask=torch.tensor(attn)).logits.numpy()
    blob = {f"sd/{k}": v.detach().float().numpy()
            for k, v in hf.state_dict().items()}
    blob["tokens"] = tokens.astype(np.int32)
    blob["logits"] = logits.astype(np.float32)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "esm2_tiny.npz"), **blob)
    return {"esm2_tiny": {"logits_shape": list(logits.shape)}}


def capture_token_dropout_scales():
    """Hand-derived token-dropout rescale factors for both semantics.

    fair-esm / transformers==4.31.0 (EsmEmbeddings receives attention_mask):
      scale = (1 - 0.15*0.8) / (1 - n_mask / n_VALID)
    newer transformers (no attention_mask in the embedding layer):
      scale = (1 - 0.15*0.8) / (1 - n_mask / seq_len)
    """
    rows = []
    for (n_valid, n_mask, seq_len) in [(16, 1, 20), (10, 0, 20),
                                       (32, 4, 32), (8, 2, 24)]:
        pad_aware = (1 - 0.15 * 0.8) / (1 - n_mask / n_valid)
        full_len = (1 - 0.15 * 0.8) / (1 - n_mask / seq_len)
        rows.append((n_valid, n_mask, seq_len, pad_aware, full_len))
    arr = np.asarray(rows, np.float64)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "token_dropout_scales.npz"),
                        rows=arr)
    return {"token_dropout_scales": {"n": len(rows)}}


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    import transformers

    manifest = {"transformers_version": transformers.__version__,
                "note": ("tiny-model logits + state dicts frozen as parity "
                         "goldens; token-dropout scales hand-derived for "
                         "the 4.31.0 (pad-aware) vs newer (full-length) "
                         "semantics split")}
    manifest.update(capture_llama())
    manifest.update(capture_esm2())
    manifest.update(capture_token_dropout_scales())
    with open(os.path.join(GOLDEN_DIR, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
