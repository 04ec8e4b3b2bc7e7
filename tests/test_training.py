"""Trainer/optimizer/checkpoint tests: loss decreases, resume is exact."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procyon_tpu.models import unified
from procyon_tpu.training import checkpointing
from procyon_tpu.training import train_step as ts
from procyon_tpu.training.optimizer import (OptimizerConfig, build_optimizer,
                                            build_frozen_mask_optimizer,
                                            make_schedule)
from procyon_tpu.training.trainer import TrainLoopConfig, Trainer


def tiny_setup(rng):
    cfg = unified.tiny_config(esm=None, protein_embed_dim=16)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    from tests.test_unified import make_batch
    batch = make_batch(cfg, rng, B=4, L=12, U=4)
    return cfg, params, batch


class TestOptimizer:
    def test_schedule_warmup_and_decay(self):
        cfg = OptimizerConfig(lr=1e-3, warmup_steps=10, total_steps=100)
        sched = make_schedule(cfg, cfg.lr)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(10)) - 1e-3) < 1e-9
        assert float(sched(99)) < 1e-3

    def test_per_module_lr_groups(self, rng):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(lr=1e-3, projector_lr=0.0, warmup_steps=0,
                               total_steps=100)
        opt = build_optimizer(ocfg, params)
        step = ts.make_train_step(cfg, opt, "qa", donate=False)
        state = ts.init_train_state(params, opt)
        new_state, _ = step(state, batch)
        # projector lr=0 -> projector params unchanged
        p0 = params["projectors"]["token_projector"][0]["w"]
        p1 = new_state["params"]["projectors"]["token_projector"][0]["w"]
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
        # llama params changed
        l0 = params["llama"]["final_norm"]
        l1 = new_state["params"]["llama"]["final_norm"]
        assert not np.allclose(np.asarray(l0), np.asarray(l1))

    def test_frozen_mask(self, rng):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(lr=1e-3, warmup_steps=0, total_steps=100)
        opt = build_frozen_mask_optimizer(
            ocfg, params,
            lambda path: str(getattr(path[0], "key", "")) == "llama")
        step = ts.make_train_step(cfg, opt, "qa", donate=False)
        state = ts.init_train_state(params, opt)
        new_state, _ = step(state, batch)
        l0 = params["llama"]["final_norm"]
        l1 = new_state["params"]["llama"]["final_norm"]
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))


class TestTrainSteps:
    def test_qa_loss_decreases_on_overfit(self, rng):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(lr=5e-3, warmup_steps=0, total_steps=100,
                               schedule="constant")
        opt = build_optimizer(ocfg, params)
        step = ts.make_train_step(cfg, opt, "qa", donate=False)
        state = ts.init_train_state(params, opt)
        losses = []
        for _ in range(12):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_retrieval_loss_decreases(self, rng):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(lr=5e-3, warmup_steps=0, total_steps=100,
                               schedule="constant")
        opt = build_optimizer(ocfg, params)
        step = ts.make_train_step(cfg, opt, "retrieval", donate=False)
        state = ts.init_train_state(params, opt)
        losses = []
        for _ in range(12):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses


class TestCheckpointing:
    def test_save_restore_roundtrip(self, rng, tmp_path):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(warmup_steps=0, total_steps=10)
        opt = build_optimizer(ocfg, params)
        state = ts.init_train_state(params, opt)
        step = ts.make_train_step(cfg, opt, "qa", donate=False)
        state, _ = step(state, batch)

        base = str(tmp_path / "ckpt")
        checkpointing.save_checkpoint(
            base, 1, state, configs={"model": cfg},
            training_state={"global_step": 1, "task_progress": {"qa": 1}})
        path = checkpointing.latest_checkpoint(base)
        assert path.endswith("checkpoint-1")

        restored = checkpointing.restore_checkpoint(path, state)
        flat_a, _ = jax.tree_util.tree_flatten(state["params"])
        flat_b, _ = jax.tree_util.tree_flatten(restored["params"])
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tstate = checkpointing.load_training_state(path)
        assert tstate["global_step"] == 1

    def test_best_marker_and_prune(self, tmp_path, rng):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(warmup_steps=0, total_steps=10)
        opt = build_optimizer(ocfg, params)
        state = ts.init_train_state(params, opt)
        base = str(tmp_path / "ckpt")
        for s in [1, 2, 3, 4]:
            checkpointing.save_checkpoint(base, s, state)
        checkpointing.mark_best(base, 2)
        checkpointing.prune_checkpoints(base, keep_last=1)
        steps = checkpointing.list_checkpoints(base)
        assert 4 in steps and 2 in steps  # best survives pruning
        assert 1 not in steps and 3 not in steps


class TestTrainerLoop:
    def test_loop_runs_and_resumes(self, rng, tmp_path):
        cfg, params, batch = tiny_setup(rng)
        ocfg = OptimizerConfig(lr=1e-3, warmup_steps=0, total_steps=50,
                               schedule="constant")
        opt = build_optimizer(ocfg, params)
        out = str(tmp_path / "run")
        loop = TrainLoopConfig(max_steps=6, log_steps=2, save_steps=3,
                               output_dir=out,
                               skip_frequency={"retrieval": 2})
        calls = {"qa": 0, "retrieval": 0}

        def make_stream(name):
            def stream():
                calls[name] += 1
                return batch
            return stream

        tr = Trainer(cfg=cfg, params=params, optimizer=opt, loop=loop,
                     task_streams={"qa": make_stream("qa"),
                                   "retrieval": make_stream("retrieval")})
        tr.train()
        assert tr.global_step == 6
        assert calls["qa"] == 6
        assert calls["retrieval"] == 3  # skip frequency 2
        assert checkpointing.latest_checkpoint(out).endswith("checkpoint-6")

        # resume: new trainer picks up at step 6 and runs to 8
        loop2 = TrainLoopConfig(max_steps=8, log_steps=2, save_steps=100,
                                output_dir=out)
        tr2 = Trainer(cfg=cfg, params=params, optimizer=opt, loop=loop2,
                      task_streams={"qa": make_stream("qa"),
                                    "retrieval": make_stream("retrieval")})
        assert tr2.maybe_resume()
        assert tr2.global_step == 6
        tr2.train()
        assert tr2.global_step == 8


class TestModelIO:
    def test_save_load_model_roundtrip(self, rng, tmp_path):
        from procyon_tpu.models import checkpoint_io, unified
        cfg = unified.tiny_config(esm=None, protein_embed_dim=16)
        params = unified.init_params(jax.random.PRNGKey(3), cfg)
        path = str(tmp_path / "model")
        checkpoint_io.save_model(
            path, params, cfg,
            tokenizer_info={"vocab_size": 256})
        params2, cfg2, tok = checkpoint_io.load_model(path)
        assert cfg2.llama.dim == cfg.llama.dim
        assert cfg2.retrieval_dim == cfg.retrieval_dim
        assert tok is not None and tok.spec.vocab_size == 256
        flat_a, _ = jax.tree_util.tree_flatten(params)
        flat_b, _ = jax.tree_util.tree_flatten(params2)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # loaded model produces identical logits
        from tests.test_unified import make_batch
        batch = make_batch(cfg, rng, B=2, L=8, U=2)
        o1 = unified.forward(params, cfg, batch)
        o2 = unified.forward(params2, cfg2, batch)
        np.testing.assert_allclose(np.asarray(o1["logits"]),
                                   np.asarray(o2["logits"]), atol=1e-6)


class TestLoraPhaseTraining:
    def _setup(self, phase):
        import tempfile
        from procyon_tpu.models.lora import LoRAConfig
        from procyon_tpu.models import llama, unified
        from procyon_tpu.training.trainer import Trainer, TrainLoopConfig
        from procyon_tpu.training.optimizer import (OptimizerConfig,
                                                    build_optimizer)
        from procyon_tpu.models import esm2

        cfg = unified.UnifiedConfig(
            llama=llama.tiny_config(attn_backend="ref", remat=False,
                                    lora=LoRAConfig(rank=2, num_experts=4,
                                                    dtype=jnp.float32)),
            esm=esm2.tiny_config(attn_backend="ref"),
            protein_embed_dim=32, token_projector_layers=1,
            token_projector_hidden=32, retrieval_dim=16, dtype=jnp.float32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        opt = build_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=0,
                                              total_steps=10,
                                              schedule="constant"), params)
        rng = np.random.default_rng(0)
        B, L = 2, 24

        def lm_batch():
            labels = rng.integers(0, cfg.llama.vocab_size, (B, L)).astype(
                np.int32)
            labels[:, : L // 2] = -100
            return {
                "input_ids": jnp.asarray(
                    rng.integers(4, cfg.llama.vocab_size, (B, L)),
                    jnp.int32),
                "seg_ids": jnp.ones((B, L), jnp.int32),
                "positions": jnp.broadcast_to(
                    jnp.arange(L, dtype=jnp.int32), (B, L)),
                "soft_map": jnp.full((B, L), -1, jnp.int32),
                "protein_embeds": jnp.asarray(
                    rng.standard_normal((2, cfg.encoder_out_dim)),
                    jnp.float32),
                "labels": jnp.asarray(labels),
                "ret_pos": jnp.full((B,), L - 1, jnp.int32),
                "ret_target_pos": jnp.arange(B, dtype=jnp.int32) % 2,
                "ret_valid": jnp.ones((B,), bool),
            }

        def mlm_batch():
            tok = np.full((B, 12), esm2.PAD_IDX, np.int32)
            tok[:, 0] = esm2.CLS_IDX
            tok[:, 1:9] = rng.integers(4, 24, (B, 8))
            lab = np.full((B, 12), -100, np.int32)
            lab[:, 2] = tok[:, 2]
            tok2 = tok.copy(); tok2[:, 2] = esm2.MASK_IDX
            return {"protein_tokens": jnp.asarray(tok2),
                    "mlm_labels": jnp.asarray(lab)}

        streams = {"qa": lm_batch, "retrieval": lm_batch,
                   "caption": lm_batch, "mlm": mlm_batch}
        out = tempfile.mkdtemp()
        loop = TrainLoopConfig(max_steps=1, log_steps=100, save_steps=0,
                               output_dir=out, lora_phase_training=phase)
        tr = Trainer(cfg=cfg, params=params, optimizer=opt, loop=loop,
                     task_streams=streams)
        before = jax.tree_util.tree_map(
            np.asarray, tr.state["params"]["llama"]["layers"]["lora_wq"])
        tr.train()
        after = jax.tree_util.tree_map(
            np.asarray, tr.state["params"]["llama"]["layers"]["lora_wq"])
        # per-expert change magnitude on the A matrices [E, ...]
        # stacked-layer leaves are [n_layers, E, r, out]; assert on B:
        # it is zero-init so AdamW weight decay cannot move unselected
        # experts (A decays everywhere regardless of expert selection)
        d = np.abs(after["B"] - before["B"])
        delta = d.transpose(1, 0, 2, 3).reshape(d.shape[1], -1).max(-1)
        return delta

    def test_cycling_touches_expert3(self, rng):
        delta = self._setup(phase=True)
        # decoder banks: qa phase -> 0, retrieval phase -> 1, joint -> 3.
        # The MLM phase (expert 2) only exercises the encoder, so the
        # DECODER bank 2 stays untouched — same as the reference, where
        # phase 3 data never reaches the text model.
        assert delta[0] > 0 and delta[1] > 0 and delta[3] > 0, delta
        assert delta[2] == 0.0, delta

    def test_default_leaves_expert3(self, rng):
        delta = self._setup(phase=False)
        assert delta[3] == 0.0, delta     # expert 3 untouched by default
        assert (delta[:3] > 0).all(), delta
