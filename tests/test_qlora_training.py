"""Frozen-base (QLoRA-style) training: int8 base + bf16 LoRA experts.

Reference surface: bitsandbytes NF4 QLoRA + peft (esm.py:444-449,
pmc_llama.py:457-514). Native: quantized frozen towers partitioned out of
the differentiated tree (training/train_step.py partition_params), grads
flow only to LoRA banks / projectors / contrastive.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.models import llama, lora, unified
from procyon_tpu.training import train_step as ts
from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer


def _qlora_model():
    lcfg = llama.LlamaConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=2, n_kv_heads=1,
        intermediate=512, max_seq_len=64, dtype=jnp.float32,
        attn_backend="ref", remat=False,
        lora=lora.LoRAConfig(rank=4, num_experts=4))
    cfg = unified.UnifiedConfig(
        llama=lcfg, esm=None, protein_embed_dim=16,
        token_projector_layers=1, token_projector_hidden=16,
        retrieval_dim=8, dtype=jnp.float32)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = llama.quantize_params(params["llama"], lcfg, bits=8)
    return cfg, params


def _qa_batch(cfg, rng, B=4, L=16):
    labels = rng.integers(4, cfg.llama.vocab_size, (B, L)).astype(np.int32)
    labels[:, :L // 2] = -100
    return {
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.full((B, L), -1, jnp.int32),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((2, cfg.encoder_out_dim)), jnp.float32),
        "labels": jnp.asarray(labels),
    }


class TestPartition:
    def test_roundtrip_identity(self):
        cfg, params = _qlora_model()
        t, f = ts.partition_params(params, ts.lora_trainable_predicate)
        merged = ts.merge_params(t, f)

        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(merged)
        assert len(flat_a) == len(flat_b)
        # same structure contents (order within dicts may differ by key,
        # so compare the sorted path map)
        def paths(tree):
            out = {}
            def walk(node, p):
                if ts._is_atomic(node):
                    out[p] = node
                else:
                    for k, v in node.items():
                        walk(v, p + "/" + k)
            walk(tree, "")
            return out
        pa, pb = paths(params), paths(merged)
        assert set(pa) == set(pb)
        for k in pa:
            va, vb = pa[k], pb[k]
            if isinstance(va, dict):
                for kk in va:
                    np.testing.assert_array_equal(np.asarray(va[kk]),
                                                  np.asarray(vb[kk]))
            else:
                np.testing.assert_array_equal(np.asarray(va),
                                              np.asarray(vb))

    def test_quantized_base_goes_frozen(self):
        cfg, params = _qlora_model()
        t, f = ts.partition_params(params, ts.lora_trainable_predicate)
        # no int8 leaves in the trainable tree
        for leaf in jax.tree_util.tree_leaves(t):
            assert leaf.dtype != jnp.int8
        # LoRA banks are trainable
        assert "lora_wq" in t["llama"]["layers"]
        assert "lora_wq" not in f["llama"]["layers"]
        # quantized attention weights are frozen
        assert "wq" in f["llama"]["layers"]["attn"]


class TestFrozenBaseStep:
    def test_step_runs_and_freezes_base(self, rng):
        cfg, params = _qlora_model()
        ocfg = OptimizerConfig(lr=1e-2, warmup_steps=0, total_steps=100,
                               schedule="constant")
        t, _ = ts.partition_params(params, ts.lora_trainable_predicate)
        optimizer = build_optimizer(ocfg, t)
        state = ts.init_train_state(
            params, optimizer, trainable_predicate=ts.lora_trainable_predicate)
        step = ts.make_train_step(cfg, optimizer, "qa", donate=False,
                                  frozen_base=True)
        batch = _qa_batch(cfg, rng)
        frozen_before = jax.tree_util.tree_map(
            np.asarray, state["frozen"])
        m = None
        for _ in range(3):
            state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        # frozen tree bitwise unchanged
        after = jax.tree_util.tree_map(np.asarray, state["frozen"])
        for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_lora_learns_fixed_batch(self, rng):
        cfg, params = _qlora_model()
        ocfg = OptimizerConfig(lr=3e-2, warmup_steps=0, total_steps=200,
                               schedule="constant", weight_decay=0.0)
        t, _ = ts.partition_params(params, ts.lora_trainable_predicate)
        optimizer = build_optimizer(ocfg, t)
        state = ts.init_train_state(
            params, optimizer, trainable_predicate=ts.lora_trainable_predicate)
        step = ts.make_train_step(cfg, optimizer, "qa", donate=False,
                                  frozen_base=True)
        batch = _qa_batch(cfg, rng)
        losses = []
        for _ in range(25):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.98, losses[:3] + losses[-3:]

    def test_accumulation_with_frozen_base(self, rng):
        cfg, params = _qlora_model()
        ocfg = OptimizerConfig(lr=1e-2, warmup_steps=0, total_steps=100,
                               schedule="constant")
        t, _ = ts.partition_params(params, ts.lora_trainable_predicate)
        optimizer = build_optimizer(ocfg, t)
        state = ts.init_train_state(
            params, optimizer, trainable_predicate=ts.lora_trainable_predicate)
        step = ts.make_train_step(cfg, optimizer, "qa", donate=False,
                                  frozen_base=True, accumulation_steps=2)
        stacked = ts.stack_microbatches([_qa_batch(cfg, rng),
                                         _qa_batch(cfg, rng)])
        state, m = step(state, {k: jnp.asarray(v)
                                for k, v in stacked.items()})
        assert np.isfinite(float(m["loss"]))


class TestCombinedFrozenBase:
    def test_joint_step_with_frozen_quantized_base(self, rng):
        from procyon_tpu.training.combined_step import make_combined_step

        cfg, params = _qlora_model()
        ocfg = OptimizerConfig(lr=1e-2, warmup_steps=0, total_steps=100,
                               schedule="constant")
        t, _ = ts.partition_params(params, ts.lora_trainable_predicate)
        optimizer = build_optimizer(ocfg, t)
        state = ts.init_train_state(
            params, optimizer,
            trainable_predicate=ts.lora_trainable_predicate)
        step = make_combined_step(cfg, optimizer, donate=False,
                                  expert_override=3, frozen_base=True)
        b = _qa_batch(cfg, rng)
        b["ret_pos"] = jnp.full((4,), 15, jnp.int32)
        b["ret_target_pos"] = jnp.asarray([0, 1, 0, 1], jnp.int32)
        b["ret_valid"] = jnp.ones((4,), bool)
        frozen_before = jax.tree_util.tree_map(np.asarray, state["frozen"])
        state, m = step(state, {"qa": b, "retrieval": b})
        assert np.isfinite(float(m["loss"]))
        assert "retrieval/retrieval_loss" in m
        after = jax.tree_util.tree_map(np.asarray, state["frozen"])
        for x, y in zip(jax.tree_util.tree_leaves(frozen_before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(x, y)
