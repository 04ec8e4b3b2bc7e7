"""ESM-encoder adapter-tuning family: LoRA / MoLoRA / bottleneck adapter.

Reference surface: procyon/model/esm.py:424-501 — peft LoraConfig /
MoLoRAConfig over the ESM tower with protein_lora_parameters target
selection ('attn' / 'mlp' / 'default'), QLoRA (NF4 base + LoRA),
task-banked MoLoRA via set_prot_lora_group, and the (disconnected there,
working here) use_adapter/adapter_rank bottleneck. VERDICT r3 missing #1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.models import esm2, lora, unified
from procyon_tpu.training import train_step as ts
from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer


def _cfg(**kw):
    base = dict(dim=64, n_layers=2, n_heads=4, dtype=jnp.float32,
                max_seq_len=32, attn_backend="ref", remat=False)
    base.update(kw)
    return esm2.ESM2Config(**base)


def _tokens(rng, B=3, S=16):
    t = rng.integers(4, 24, (B, S)).astype(np.int32)
    t[:, 0] = esm2.CLS_IDX
    t[:, -1] = esm2.EOS_IDX
    t[0, -4:] = esm2.PAD_IDX
    return jnp.asarray(t)


class TestEsmLoraForward:
    @pytest.mark.parametrize("targets,expected", [
        ("attn", ("wq", "wk", "wv")),
        ("mlp", ("wo", "w1", "w2")),
        ("default", ("wq", "wk", "wv", "wo", "w1", "w2")),
    ])
    def test_target_selection_creates_banks(self, targets, expected):
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, num_experts=2,
                                        dtype=jnp.float32),
                   lora_targets=targets)
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        banks = [k for k in params["layers"] if k.startswith("lora_")]
        assert sorted(banks) == sorted(f"lora_{n}" for n in expected)
        # bank shapes: [L, E, in, r] / [L, E, r, out]
        for n in expected:
            a = params["layers"][f"lora_{n}"]["A"]
            b = params["layers"][f"lora_{n}"]["B"]
            di, do = esm2._lora_dims(cfg, n)
            assert a.shape == (cfg.n_layers, 2, di, 4)
            assert b.shape == (cfg.n_layers, 2, 4, do)

    def test_zero_init_is_identity(self, rng):
        """B = 0 at init, so the LoRA'd forward equals the base forward
        bitwise (standard LoRA init; mlora.py MoLinear same property)."""
        base_cfg = _cfg()
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, num_experts=2,
                                        dtype=jnp.float32))
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        base_params = dict(params)
        base_params["layers"] = {k: v for k, v in params["layers"].items()
                                 if not k.startswith("lora_")}
        toks = _tokens(rng)
        with_lora = esm2.forward(params, cfg, toks)["hidden"]
        without = esm2.forward(base_params, base_cfg, toks)["hidden"]
        np.testing.assert_array_equal(np.asarray(with_lora),
                                      np.asarray(without))

    def test_experts_differ_after_perturbation(self, rng):
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, num_experts=3,
                                        dtype=jnp.float32))
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        b = params["layers"]["lora_wq"]["B"]
        params["layers"]["lora_wq"] = {
            **params["layers"]["lora_wq"],
            "B": b.at[:, 1].set(0.5),
        }
        toks = _tokens(rng)
        out0 = esm2.forward(params, cfg, toks, lora_expert=0)["hidden"]
        out1 = esm2.forward(params, cfg, toks, lora_expert=1)["hidden"]
        out2 = esm2.forward(params, cfg, toks, lora_expert=2)["hidden"]
        assert not np.allclose(np.asarray(out0), np.asarray(out1))
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out2))

    def test_traced_expert_index(self, rng):
        """The expert index may be a traced scalar (phase cycling jits one
        step function over it)."""
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, num_experts=2,
                                        dtype=jnp.float32))
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        params["layers"]["lora_wv"] = {
            **params["layers"]["lora_wv"],
            "B": params["layers"]["lora_wv"]["B"].at[:, 1].set(0.3),
        }
        toks = _tokens(rng)

        f = jax.jit(lambda p, t, e: esm2.forward(p, cfg, t,
                                                 lora_expert=e)["hidden"])
        # jit re-fuses the elementwise chain, so compare to f32 tolerance
        np.testing.assert_allclose(
            np.asarray(f(params, toks, jnp.int32(1))),
            np.asarray(esm2.forward(params, cfg, toks,
                                    lora_expert=1)["hidden"]), atol=1e-5)

    def test_merge_lora_matches_single_expert(self, rng):
        """merge_lora_params folds the expert-averaged delta into the base
        (mlora.py:417-431); with one expert the merged forward must match
        the banked forward to f32 tolerance."""
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, num_experts=1,
                                        dtype=jnp.float32))
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        for name in ("lora_wq", "lora_wv", "lora_w1"):
            bank = params["layers"][name]
            params["layers"][name] = {
                "A": bank["A"],
                "B": jnp.asarray(rng.standard_normal(bank["B"].shape) * 0.1,
                                 jnp.float32),
            }
        toks = _tokens(rng)
        banked = esm2.forward(params, cfg, toks)["hidden"]
        merged_params = esm2.merge_lora_params(params, cfg)
        assert not any(k.startswith("lora_")
                       for k in merged_params["layers"])
        merged = esm2.forward(merged_params, _cfg(), toks)["hidden"]
        np.testing.assert_allclose(np.asarray(banked), np.asarray(merged),
                                   atol=2e-5)

    def test_fuse_qkv_requires_merge(self):
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, dtype=jnp.float32))
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(AssertionError, match="merge_lora_params"):
            esm2.fuse_qkv_params(params)

    def test_qlora_composition(self, rng):
        """quantize_params leaves the LoRA banks full precision (the
        NF4-frozen-base + bf16-LoRA recipe, esm.py:444-449)."""
        cfg = _cfg(lora=lora.LoRAConfig(rank=4, dtype=jnp.float32))
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        qparams = esm2.quantize_params(params, cfg)
        bank = qparams["layers"]["lora_wq"]
        assert bank["A"].dtype == jnp.float32
        from procyon_tpu.ops import quant
        assert quant.is_quantized(qparams["layers"]["attn"]["wq"])
        out = esm2.forward(qparams, cfg, _tokens(rng))["hidden"]
        assert np.isfinite(np.asarray(out)).all()


class TestEsmAdapter:
    def test_zero_init_is_identity(self, rng):
        cfg = _cfg(adapter_rank=4)
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        base_params = dict(params)
        base_params["layers"] = {k: v for k, v in params["layers"].items()
                                 if k != "adapter"}
        toks = _tokens(rng)
        with_ad = esm2.forward(params, cfg, toks)["hidden"]
        without = esm2.forward(base_params, _cfg(), toks)["hidden"]
        np.testing.assert_array_equal(np.asarray(with_ad),
                                      np.asarray(without))

    def test_nonzero_up_changes_output(self, rng):
        cfg = _cfg(adapter_rank=4)
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        ad = params["layers"]["adapter"]
        params["layers"]["adapter"] = {**ad, "wu": ad["wu"] + 0.1}
        toks = _tokens(rng)
        base_params = dict(params)
        base_params["layers"] = {k: v for k, v in params["layers"].items()
                                 if k != "adapter"}
        a = esm2.forward(params, cfg, toks)["hidden"]
        b = esm2.forward(base_params, _cfg(), toks)["hidden"]
        assert not np.allclose(np.asarray(a), np.asarray(b))


def _live_encoder_model(prot_lora=None, adapter_rank=0):
    ecfg = esm2.ESM2Config(dim=32, n_layers=2, n_heads=4, dtype=jnp.float32,
                           max_seq_len=32, attn_backend="ref", remat=False,
                           lora=prot_lora, adapter_rank=adapter_rank)
    cfg = unified.tiny_config(esm=ecfg, protein_embed_dim=32)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _retrieval_batch(cfg, rng, B=4, L=12, R=4, Lp=16):
    toks = rng.integers(4, 24, (R, Lp)).astype(np.int32)
    toks[:, 0] = esm2.CLS_IDX
    toks[:, -1] = esm2.EOS_IDX
    soft = np.full((B, L), -1, np.int32)
    soft[:, 1] = np.arange(B) % R
    return {
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.asarray(soft),
        "protein_tokens": jnp.asarray(toks),
        "ret_pos": jnp.full((B,), L - 1, jnp.int32),
        "ret_target_pos": jnp.asarray(np.arange(B) % R, jnp.int32),
        "ret_valid": jnp.ones((B,), bool),
    }


class TestEncoderLoraLearns:
    def test_retrieval_improves_with_base_frozen_bitwise(self, rng):
        """VERDICT r3 #2 done criterion: encoder LoRA (the ONLY trainable
        leaves) moves the retrieval objective on a fixed batch while the
        whole base tree stays bitwise frozen."""
        cfg, params = _live_encoder_model(
            prot_lora=lora.LoRAConfig(rank=4, num_experts=2,
                                      dtype=jnp.float32))
        pred = lambda p: p.startswith("esm") and "lora" in p
        ocfg = OptimizerConfig(lr=3e-2, warmup_steps=0, total_steps=200,
                               schedule="constant", weight_decay=0.0)
        t, _ = ts.partition_params(params, pred)
        assert t, "no trainable leaves found"
        for k in t["esm"]["layers"]:
            assert k.startswith("lora_")
        optimizer = build_optimizer(ocfg, t)
        state = ts.init_train_state(params, optimizer,
                                    trainable_predicate=pred)
        step = ts.make_train_step(cfg, optimizer, "retrieval", donate=False,
                                  frozen_base=True)
        batch = _retrieval_batch(cfg, rng)
        frozen_before = jax.tree_util.tree_map(np.asarray, state["frozen"])
        losses = []
        for _ in range(25):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.98, losses[:3] + losses[-3:]
        after = jax.tree_util.tree_map(np.asarray, state["frozen"])
        for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_adapter_only_training_learns(self, rng):
        cfg, params = _live_encoder_model(adapter_rank=4)
        pred = lambda p: p.startswith("esm") and "adapter" in p
        ocfg = OptimizerConfig(lr=3e-2, warmup_steps=0, total_steps=200,
                               schedule="constant", weight_decay=0.0)
        t, _ = ts.partition_params(params, pred)
        assert t
        optimizer = build_optimizer(ocfg, t)
        state = ts.init_train_state(params, optimizer,
                                    trainable_predicate=pred)
        step = ts.make_train_step(cfg, optimizer, "retrieval", donate=False,
                                  frozen_base=True)
        batch = _retrieval_batch(cfg, rng)
        losses = []
        for _ in range(25):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.98, losses[:3] + losses[-3:]


class TestConfigWiring:
    def test_build_model_config_wires_prot_lora(self):
        from procyon_tpu import config as C

        margs = C.ModelArgs(use_aaseq_embeddings=False,
                            protein_encoder="esm2-8m",
                            use_prot_lora=True, aaseq_lora_r=4,
                            aaseq_lora_alpha=8.0,
                            prot_lora_num_experts=3,
                            prot_lora_parameters="attn",
                            aaseq_adapter_rank=2)
        cfg = C.build_model_config(margs)
        assert cfg.esm.lora is not None
        assert cfg.esm.lora.rank == 4
        assert cfg.esm.lora.num_experts == 3
        assert cfg.esm.lora_targets == "attn"
        assert cfg.esm.adapter_rank == 2

    def test_freeze_fn_peft_modes(self):
        from procyon_tpu import config as C

        margs = C.ModelArgs(use_prot_lora=True, use_aaseq_embeddings=False,
                            freeze_protein_encoder=False)
        frozen = C.freeze_fn(margs)
        assert not frozen(["esm", "layers", "lora_wq", "A"])
        assert frozen(["esm", "layers", "attn", "wq"])
        margs2 = C.ModelArgs(aaseq_adapter_rank=4,
                             use_aaseq_embeddings=False,
                             freeze_protein_encoder=False)
        frozen2 = C.freeze_fn(margs2)
        assert not frozen2(["esm", "layers", "adapter", "wu"])
        assert frozen2(["esm", "layers", "mlp", "w1"])

    def test_expert_count_considers_encoder(self):
        cfg, _ = _live_encoder_model(
            prot_lora=lora.LoRAConfig(rank=2, num_experts=4,
                                      dtype=jnp.float32))
        assert ts.lora_num_experts(cfg) == 4
