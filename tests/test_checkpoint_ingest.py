"""Released-checkpoint ingestion tests (VERDICT round-1 Missing #1).

Builds a synthetic DeepSpeed ZeRO-2 checkpoint in the reference's on-disk
layout (model_unified.py:1295-1408: global_stepN shard dir + pickled
model_args.pt) from a known params tree, converts it, and asserts the
round-trip is exact — including that the fp32 optimizer partitions (not the
garbage bf16 module weights we plant) are what lands in the converted model.
"""

import os
import pickle
import sys
import types

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from procyon_tpu.models import checkpoint_io, contrastive, esm2, llama, unified


def _tiny_cfg(live_esm=False):
    return unified.UnifiedConfig(
        llama=llama.tiny_config(attn_backend="ref", remat=False),
        esm=esm2.tiny_config(attn_backend="ref", remat=False)
        if live_esm else None,
        protein_embed_dim=48, token_projector_layers=3,
        token_projector_hidden=32, retrieval_dim=48,
        shared_projector_layers=3, shared_projector_hidden=24,
        lm_projector_layers=3, lm_projector_hidden=24,
        use_protein_struct=True, struct_embed_dim=20,
        use_drug_embeddings=True, drug_embed_dim=24,
        dtype=jnp.float32)


def _export_projector(name, layers):
    """Our projector list -> reference create_mlp Sequential keys
    (Linear at indices 0,3,6,... — model_utils.py:13-43)."""
    out = {}
    for j, layer in enumerate(layers):
        idx = j * 3
        out[f"{name}.{idx}.weight"] = np.asarray(layer["w"]).T
        if "b" in layer:
            out[f"{name}.{idx}.bias"] = np.asarray(layer["b"])
    return out


def _export_reference_sd(params, cfg):
    """Our pytree -> the reference UnifiedProCyon state-dict naming."""
    sd = {}
    lp = params["llama"]
    sd["text_encoder.model.model.embed_tokens.weight"] = np.asarray(
        lp["embed"])
    sd["text_encoder.model.model.norm.weight"] = np.asarray(lp["final_norm"])
    sd["text_encoder.model.lm_head.weight"] = np.asarray(lp["lm_head"]).T
    for i in range(cfg.llama.n_layers):
        p = f"text_encoder.model.model.layers.{i}."
        at = lp["layers"]["attn"]
        sd[p + "self_attn.q_proj.weight"] = np.asarray(at["wq"][i]).T
        sd[p + "self_attn.k_proj.weight"] = np.asarray(at["wk"][i]).T
        sd[p + "self_attn.v_proj.weight"] = np.asarray(at["wv"][i]).T
        sd[p + "self_attn.o_proj.weight"] = np.asarray(at["wo"][i]).T
        ml = lp["layers"]["mlp"]
        sd[p + "mlp.gate_proj.weight"] = np.asarray(ml["w_gate"][i]).T
        sd[p + "mlp.up_proj.weight"] = np.asarray(ml["w_up"][i]).T
        sd[p + "mlp.down_proj.weight"] = np.asarray(ml["w_down"][i]).T
        sd[p + "input_layernorm.weight"] = np.asarray(
            lp["layers"]["attn_norm"][i])
        sd[p + "post_attention_layernorm.weight"] = np.asarray(
            lp["layers"]["mlp_norm"][i])
        # rotary cache key the converter must ignore
        sd[p + "self_attn.rotary_emb.inv_freq"] = np.zeros(4, np.float32)
    if "esm" in params and cfg.esm is not None:
        ep = params["esm"]
        q = "protein_seq_encoder.model."
        sd[q + "embed_tokens.weight"] = np.asarray(ep["embed"])
        sd[q + "emb_layer_norm_after.weight"] = np.asarray(
            ep["final_norm"]["w"])
        sd[q + "emb_layer_norm_after.bias"] = np.asarray(ep["final_norm"]["b"])
        lh = ep["lm_head"]
        sd[q + "lm_head.dense.weight"] = np.asarray(lh["dense_w"]).T
        sd[q + "lm_head.dense.bias"] = np.asarray(lh["dense_b"])
        sd[q + "lm_head.layer_norm.weight"] = np.asarray(lh["norm"]["w"])
        sd[q + "lm_head.layer_norm.bias"] = np.asarray(lh["norm"]["b"])
        sd[q + "lm_head.bias"] = np.asarray(lh["bias"])
        for i in range(cfg.esm.n_layers):
            p = q + f"layers.{i}."
            at = ep["layers"]["attn"]
            for ours, theirs in [("wq", "q_proj"), ("wk", "k_proj"),
                                 ("wv", "v_proj"), ("wo", "out_proj")]:
                sd[p + f"self_attn.{theirs}.weight"] = np.asarray(
                    at[ours][i]).T
            for ours, theirs in [("bq", "q_proj"), ("bk", "k_proj"),
                                 ("bv", "v_proj"), ("bo", "out_proj")]:
                sd[p + f"self_attn.{theirs}.bias"] = np.asarray(at[ours][i])
            ml = ep["layers"]["mlp"]
            sd[p + "fc1.weight"] = np.asarray(ml["w1"][i]).T
            sd[p + "fc1.bias"] = np.asarray(ml["b1"][i])
            sd[p + "fc2.weight"] = np.asarray(ml["w2"][i]).T
            sd[p + "fc2.bias"] = np.asarray(ml["b2"][i])
            sd[p + "self_attn_layer_norm.weight"] = np.asarray(
                ep["layers"]["attn_norm"]["w"][i])
            sd[p + "self_attn_layer_norm.bias"] = np.asarray(
                ep["layers"]["attn_norm"]["b"][i])
            sd[p + "final_layer_norm.weight"] = np.asarray(
                ep["layers"]["mlp_norm"]["w"][i])
            sd[p + "final_layer_norm.bias"] = np.asarray(
                ep["layers"]["mlp_norm"]["b"][i])
    pj = params["projectors"]
    sd.update(_export_projector("token_projectors.aaseq",
                                pj["token_projector"]))
    sd.update(_export_projector("token_projectors.prot_structure",
                                pj["struct_projector"]))
    sd.update(_export_projector("token_projectors.drug",
                                pj["drug_projector"]))
    sd.update(_export_projector("aaseq_shared_projector",
                                pj["shared_projector"]))
    sd.update(_export_projector("aaseq_lm_projector", pj["lm_projector"]))
    sd["contrastive_head.temperature"] = np.asarray(
        np.exp(np.asarray(params["contrastive"]["log_temp"])), np.float32)
    return sd


def _write_zero2_checkpoint(ckpt_dir, sd, *, world=2, frozen_keys=()):
    """Write sd as a ZeRO-2 shard layout: trainable params live ONLY as fp32
    flat partitions in the optim shards; the module copy of them is zeroed
    (so the test fails loudly if the consolidator reads the wrong source)."""
    step = os.path.join(ckpt_dir, "global_step7")
    os.makedirs(step, exist_ok=True)
    with open(os.path.join(ckpt_dir, "latest"), "w") as f:
        f.write("global_step7")

    trainable = [k for k in sd if k not in frozen_keys]
    # split into two param groups like per-module LR groups do
    half = len(trainable) // 2
    groups = [trainable[:half], trainable[half:]]
    param_shapes = [
        {k: torch.Size(np.asarray(sd[k]).shape) for k in g} for g in groups]

    module = {}
    for k, v in sd.items():
        v = np.asarray(v)
        module[k] = (torch.zeros(v.shape) if k in set(trainable)
                     else torch.from_numpy(np.ascontiguousarray(v)))
    torch.save({"module": module, "param_shapes": param_shapes,
                "ds_version": "0.12.4"},
               os.path.join(step, "mp_rank_00_model_states.pt"))

    for r in range(world):
        parts = []
        for g in groups:
            flat = np.concatenate(
                [np.asarray(sd[k], np.float32).ravel() for k in g])
            # DeepSpeed pads the flat group to a world multiple
            pad = (-len(flat)) % world
            flat = np.concatenate([flat, np.zeros(pad, np.float32)])
            per = len(flat) // world
            parts.append(torch.from_numpy(flat[r * per:(r + 1) * per].copy()))
        torch.save({"optimizer_state_dict": {
            "zero_stage": 2, "partition_count": world,
            "single_partition_of_fp32_groups": parts}},
            os.path.join(step, f"zero_pp_rank_{r}_mp_rank_00_optim_states.pt"))


def _write_model_args(ckpt_dir, **fields):
    """Pickle a fake procyon ModelArgs whose class is NOT importable at load
    time (tests the permissive unpickler)."""
    mod_name = "procyon.training.training_args_IT"
    mod = types.ModuleType(mod_name)

    class ModelArgs:
        pass

    ModelArgs.__module__ = mod_name
    ModelArgs.__qualname__ = "ModelArgs"
    mod.ModelArgs = ModelArgs
    pkg = types.ModuleType("procyon")
    sub = types.ModuleType("procyon.training")
    sys.modules["procyon"] = pkg
    sys.modules["procyon.training"] = sub
    sys.modules[mod_name] = mod
    try:
        obj = ModelArgs()
        obj.__dict__.update(fields)
        torch.save(obj, os.path.join(ckpt_dir, "model_args.pt"))
    finally:
        for m in ("procyon", "procyon.training", mod_name):
            sys.modules.pop(m, None)


def _frozen_tables(rng):
    return {
        "protein_seq_embeddings.weight": rng.normal(
            size=(10, 48)).astype(np.float32),
        "domain_embeddings.weight": rng.normal(
            size=(4, 48)).astype(np.float32),
        "protein_struct_embeddings.weight": rng.normal(
            size=(10, 20)).astype(np.float32),
        "drug_structure_embeddings.weight": rng.normal(
            size=(6, 24)).astype(np.float32),
    }


class TestZeroConsolidation:
    def test_round_trip_frozen_mode(self, tmp_path):
        cfg = _tiny_cfg(live_esm=False)
        params0 = unified.init_params(jax.random.PRNGKey(3), cfg)
        sd = _export_reference_sd(params0, cfg)
        tables = _frozen_tables(np.random.default_rng(0))
        sd.update(tables)

        ckpt = tmp_path / "checkpoint-7"
        ckpt.mkdir()
        _write_zero2_checkpoint(str(ckpt), sd, frozen_keys=set(tables))
        _write_model_args(str(ckpt), text_encoder_fname="llama-debug",
                          use_aaseq_embeddings=True,
                          protein_pooling_opt="mean")

        out = tmp_path / "converted"
        out_dir, report = checkpoint_io.convert_reference_checkpoint(
            str(ckpt), str(out), llama_config=cfg.llama, dtype=jnp.float32)
        assert set(report["converted"]) >= {
            "llama", "token_projector", "shared_projector", "lm_projector",
            "struct_projector", "drug_projector", "contrastive"}

        params1, cfg1, _tok = checkpoint_io.load_model(str(out))
        # config extraction from args + shapes must round-trip
        assert cfg1.protein_embed_dim == cfg.protein_embed_dim
        assert cfg1.retrieval_dim == cfg.retrieval_dim
        assert cfg1.use_protein_struct and cfg1.use_drug_embeddings
        assert cfg1.token_projector_layers == 3
        assert cfg1.llama.vocab_size == cfg.llama.vocab_size

        flat0, _ = jax.flatten_util.ravel_pytree(params0)
        flat1, _ = jax.flatten_util.ravel_pytree(params1)
        np.testing.assert_allclose(np.asarray(flat0), np.asarray(flat1),
                                   rtol=0, atol=0)
        # module copies were zeroed: exactness proves fp32 partitions won
        assert float(jnp.abs(params1["llama"]["embed"]).sum()) > 0

        # frozen tables exported for the data store
        for f in ("protein_seq_embeddings.npy", "domain_embeddings.npy",
                  "protein_struct_embeddings.npy",
                  "drug_structure_embeddings.npy"):
            path = os.path.join(out_dir, "embeddings", f)
            assert os.path.exists(path), f
        got = np.load(os.path.join(out_dir, "embeddings",
                                   "protein_seq_embeddings.npy"))
        np.testing.assert_array_equal(
            got, tables["protein_seq_embeddings.weight"])

    def test_retrieval_forward_matches_direct_model(self, tmp_path):
        cfg = _tiny_cfg(live_esm=False)
        params0 = unified.init_params(jax.random.PRNGKey(5), cfg)
        sd = _export_reference_sd(params0, cfg)
        ckpt = tmp_path / "checkpoint-7"
        ckpt.mkdir()
        _write_zero2_checkpoint(str(ckpt), sd)
        out = tmp_path / "conv"
        checkpoint_io.convert_reference_checkpoint(
            str(ckpt), str(out), cfg=cfg)
        params1, cfg1, _ = checkpoint_io.load_model(str(out))

        rng = np.random.default_rng(1)
        B, L, U = 2, 16, 3
        batch = {
            "input_ids": jnp.asarray(rng.integers(0, 200, (B, L))),
            "soft_map": jnp.where(
                jnp.arange(L)[None, :] == 2,
                jnp.arange(B)[:, None], -1),
            "protein_embeds": jnp.asarray(
                rng.normal(size=(U, cfg.protein_embed_dim)), jnp.float32),
            "struct_embeds": jnp.asarray(
                rng.normal(size=(U, cfg.struct_embed_dim)), jnp.float32),
            "drug_embeds": jnp.asarray(
                rng.normal(size=(2, cfg.drug_embed_dim)), jnp.float32),
            "ret_pos": jnp.asarray([5, 7]),
            "ret_target_pos": jnp.asarray([0, 1]),
        }
        out0 = unified.forward(params0, cfg, batch, retrieval=True)
        out1 = unified.forward(params1, cfg1, batch, retrieval=True)
        np.testing.assert_array_equal(np.asarray(out0["query_embeds"]),
                                      np.asarray(out1["query_embeds"]))
        np.testing.assert_array_equal(np.asarray(out0["target_embeds"]),
                                      np.asarray(out1["target_embeds"]))
        np.testing.assert_array_equal(np.asarray(out0["logits"]),
                                      np.asarray(out1["logits"]))

    def test_live_esm_round_trip(self, tmp_path):
        cfg = _tiny_cfg(live_esm=True)
        params0 = unified.init_params(jax.random.PRNGKey(9), cfg)
        sd = _export_reference_sd(params0, cfg)
        ckpt = tmp_path / "checkpoint-3"
        ckpt.mkdir()
        _write_zero2_checkpoint(str(ckpt), sd)
        out = tmp_path / "conv"
        checkpoint_io.convert_reference_checkpoint(
            str(ckpt), str(out), cfg=cfg)
        params1, _, _ = checkpoint_io.load_model(str(out))
        flat0, _ = jax.flatten_util.ravel_pytree(params0)
        flat1, _ = jax.flatten_util.ravel_pytree(params1)
        np.testing.assert_allclose(np.asarray(flat0), np.asarray(flat1),
                                   rtol=0, atol=0)

    def test_consolidated_pt_path(self, tmp_path):
        """txllm_model_ckpt.pt (save_pretrained wrapper) takes priority."""
        cfg = _tiny_cfg()
        params0 = unified.init_params(jax.random.PRNGKey(2), cfg)
        sd = _export_reference_sd(params0, cfg)
        ckpt = tmp_path / "checkpoint-1"
        ckpt.mkdir()
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(np.ascontiguousarray(
                        np.asarray(v))) for k, v in sd.items()}},
                   str(ckpt / "txllm_model_ckpt.pt"))
        out = tmp_path / "conv"
        checkpoint_io.convert_reference_checkpoint(str(ckpt), str(out),
                                                   cfg=cfg)
        params1, _, _ = checkpoint_io.load_model(str(out))
        flat0, _ = jax.flatten_util.ravel_pytree(params0)
        flat1, _ = jax.flatten_util.ravel_pytree(params1)
        np.testing.assert_allclose(np.asarray(flat0), np.asarray(flat1))

    def test_missing_projectors_is_loud(self, tmp_path):
        cfg = _tiny_cfg()
        params0 = unified.init_params(jax.random.PRNGKey(2), cfg)
        sd = _export_reference_sd(params0, cfg)
        sd = {k: v for k, v in sd.items()
              if not k.startswith("aaseq_lm_projector")}
        ckpt = tmp_path / "checkpoint-1"
        ckpt.mkdir()
        _write_zero2_checkpoint(str(ckpt), sd)
        with pytest.raises(KeyError, match="aaseq_lm_projector"):
            checkpoint_io.convert_reference_checkpoint(
                str(ckpt), str(tmp_path / "conv"), cfg=cfg)

    def test_missing_temperature_is_loud(self, tmp_path):
        cfg = _tiny_cfg()
        params0 = unified.init_params(jax.random.PRNGKey(2), cfg)
        sd = _export_reference_sd(params0, cfg)
        del sd["contrastive_head.temperature"]
        ckpt = tmp_path / "checkpoint-1"
        ckpt.mkdir()
        _write_zero2_checkpoint(str(ckpt), sd)
        with pytest.raises(KeyError, match="temperature"):
            checkpoint_io.convert_reference_checkpoint(
                str(ckpt), str(tmp_path / "conv"), cfg=cfg)

    def test_unmapped_keys_are_loud(self, tmp_path):
        cfg = _tiny_cfg()
        params0 = unified.init_params(jax.random.PRNGKey(2), cfg)
        sd = _export_reference_sd(params0, cfg)
        sd["some.unknown.module.weight"] = np.zeros((3, 3), np.float32)
        ckpt = tmp_path / "checkpoint-1"
        ckpt.mkdir()
        _write_zero2_checkpoint(str(ckpt), sd)
        with pytest.raises(KeyError, match="not mapped"):
            checkpoint_io.convert_reference_checkpoint(
                str(ckpt), str(tmp_path / "conv"), cfg=cfg)

    def test_permissive_unpickler(self, tmp_path):
        _write_model_args(str(tmp_path), text_encoder_fname="llama-3-8b",
                          num_layers_token_projector=3)
        margs, dargs = checkpoint_io.load_checkpoint_args(str(tmp_path))
        assert margs.text_encoder_fname == "llama-3-8b"
        assert margs.num_layers_token_projector == 3
        assert dargs is None
