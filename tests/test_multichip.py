"""Multi-device correctness on the 8-device virtual CPU mesh: GSPMD-sharded
training must match single-device numerics (the reference never tested its
distributed path — SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procyon_tpu.models import unified
from procyon_tpu.parallel import create_mesh, MeshConfig, shard_params
from procyon_tpu.parallel.sharding import (batch_sharding, param_shardings,
                                           shard_batch, spec_for)
from procyon_tpu.training import train_step as ts
from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer

from tests.test_unified import make_batch


def setup(rng, B=8):
    cfg = unified.tiny_config(esm=None, protein_embed_dim=16)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, rng, B=B, L=16, U=4)
    ocfg = OptimizerConfig(lr=1e-3, warmup_steps=0, total_steps=10,
                           schedule="constant")
    opt = build_optimizer(ocfg, params)
    return cfg, params, batch, opt


class TestShardingRules:
    def test_specs_respect_divisibility(self, eight_devices):
        mesh = create_mesh(MeshConfig(2, 2, 2))
        # a dim that doesn't divide the axis falls back to replication
        spec = spec_for("llama/layers/attn/wq", (2, 63, 128), mesh)
        assert spec[1] is None  # 63 % 2 != 0
        spec = spec_for("llama/layers/attn/wq", (2, 64, 128), mesh)
        assert spec[1] == "fsdp" and spec[2] == "model"

    def test_params_shard_without_error(self, eight_devices, rng):
        cfg, params, _, _ = setup(rng)
        mesh = create_mesh(MeshConfig(2, 2, 2))
        sharded = shard_params(params, mesh)
        # same values after sharding
        a, _ = jax.tree_util.tree_flatten(params)
        b, _ = jax.tree_util.tree_flatten(sharded)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestDistributedTrainStep:
    @pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2), (1, 4, 2)])
    def test_sharded_step_matches_single_device(self, eight_devices, rng,
                                                mesh_shape):
        cfg, params, batch, opt = setup(rng)
        step = ts.make_train_step(cfg, opt, "qa", donate=False)

        # single device
        state = ts.init_train_state(params, opt)
        ref_state, ref_m = step(state, batch)
        ref_loss = float(ref_m["loss"])

        # sharded over the mesh
        mesh = create_mesh(MeshConfig(*mesh_shape))
        with jax.set_mesh(mesh):
            sp = shard_params(params, mesh)
            sstate = ts.init_train_state(sp, opt)
            sbatch = shard_batch(batch, mesh)
            new_state, m = step(sstate, sbatch)
            loss = float(m["loss"])
        assert abs(loss - ref_loss) < 1e-4, (loss, ref_loss)
        # updated params agree
        a = np.asarray(ref_state["params"]["llama"]["final_norm"])
        b = np.asarray(new_state["params"]["llama"]["final_norm"])
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_tensor_parallel_decode_matches_single_device(
            self, eight_devices, rng):
        """KV-cache decode under a (data, fsdp, model) mesh — heads and
        MLP hidden sharded over `model` via GSPMD — must equal the
        single-device decode (multi-chip serving path; the reference's
        vestigial TP is pmc_llama.py:177-193)."""
        from procyon_tpu.models import llama as L

        cfg = L.tiny_config(attn_backend="ref", remat=False, dim=256,
                            n_heads=4, n_kv_heads=2, intermediate=512,
                            vocab_size=512)
        params = L.init_params(jax.random.PRNGKey(3), cfg)
        B, T = 4, 6
        tokens = jnp.asarray(
            rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)

        @jax.jit
        def prefill(params, toks):
            cache = L.init_kv_cache(cfg, B, max_len=T + 8)
            out = L.forward(params, cfg, tokens=toks, kv_cache=cache)
            return out["logits"][:, -1], out["kv_cache"]

        @jax.jit
        def decode(params, tok, cache):
            out = L.forward(params, cfg, tokens=tok,
                            positions=jnp.full((B, 1), cache["length"],
                                               jnp.int32),
                            kv_cache=cache)
            return out["logits"][:, -1], out["kv_cache"]

        def run(params):
            logits, cache = prefill(params, tokens)
            outs = [np.asarray(logits)]
            for _ in range(3):
                tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
                logits, cache = decode(params, tok, cache)
                outs.append(np.asarray(logits))
            return np.stack(outs)

        ref = run(params)
        mesh = create_mesh(MeshConfig(2, 1, 4))
        with jax.set_mesh(mesh):
            sharded = run(shard_params(params, mesh))
        np.testing.assert_allclose(sharded, ref, atol=2e-4, rtol=2e-4)

    def test_paged_decode_tp_matches_single_device(
            self, eight_devices, rng):
        """The PAGED serving path (flat pool + block-diagonal decode
        attention + page-table gathers) under a (data, fsdp, model) mesh
        must equal single-device paged decode. The pool's flat-lane KD
        axis is sharded over `model` (each shard holds its kv heads'
        lanes); the block-diagonal score contraction runs over the
        sharded KD axis, so GSPMD inserts the psum — cross-shard terms
        are exact zeros by construction."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from procyon_tpu.inference import kv_pool as KP
        from procyon_tpu.models import llama as L

        cfg = L.tiny_config(attn_backend="ref", remat=False, dim=256,
                            n_heads=4, n_kv_heads=2, intermediate=512,
                            vocab_size=512)
        params = L.init_params(jax.random.PRNGKey(3), cfg)
        B, T = 4, 6
        tokens = jnp.asarray(
            rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
        pcfg = KP.PagedConfig(
            n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
            head_dim=cfg.head_dim, page_size=4, n_pages=16,
            max_pages_per_seq=4, slots=B, dtype=cfg.dtype)
        alloc = KP.PageAllocator(pcfg)
        pt = np.zeros((B, pcfg.max_pages_per_seq), np.int64)
        for b in range(B):
            pages = alloc.allocate(b, T + 4)
            pt[b, :len(pages)] = pages
        slots = jnp.arange(B, dtype=jnp.int32)

        @jax.jit
        def prefill(params, pool, toks):
            logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                           slots, tokens=toks)
            return logits[:, -1], pool

        @jax.jit
        def decode(params, tok, pool):
            logits, pool = L.paged_forward(params, cfg, pool, pcfg,
                                           slots, tokens=tok)
            return logits[:, -1], pool

        def run(params, pool_sharding=None):
            pool = KP.init_pool(pcfg)
            if pool_sharding is not None:
                pool = {**pool,
                        "k": jax.device_put(pool["k"], pool_sharding),
                        "v": jax.device_put(pool["v"], pool_sharding)}
            pool = {**pool, "page_table": jnp.asarray(pt, jnp.int32)}
            logits, pool = prefill(params, pool, tokens)
            outs = [np.asarray(logits)]
            for _ in range(3):
                tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
                logits, pool = decode(params, tok, pool)
                outs.append(np.asarray(logits))
            return np.stack(outs)

        ref = run(params)
        mesh = create_mesh(MeshConfig(2, 1, 4))
        with jax.set_mesh(mesh):
            kv_shard = NamedSharding(mesh, P(None, None, "model"))
            sharded = run(shard_params(params, mesh), kv_shard)
        np.testing.assert_allclose(sharded, ref, atol=2e-4, rtol=2e-4)

    def test_retrieval_global_batch_sharded(self, eight_devices, rng):
        """In-batch contrastive over a sharded batch == single device (the
        GSPMD 'global batch for free' property)."""
        cfg, params, batch, opt = setup(rng, B=8)
        step = ts.make_train_step(cfg, opt, "retrieval", donate=False)
        state = ts.init_train_state(params, opt)
        _, ref_m = step(state, batch)
        mesh = create_mesh(MeshConfig(4, 2, 1))
        with jax.set_mesh(mesh):
            sp = shard_params(params, mesh)
            sstate = ts.init_train_state(sp, opt)
            sbatch = shard_batch(batch, mesh)
            _, m = step(sstate, sbatch)
        assert abs(float(m["loss"]) - float(ref_m["loss"])) < 1e-4
