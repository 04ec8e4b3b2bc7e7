"""Instruction pretraining CLI.

Equivalent of the reference's scripts/run_pretrain.py: parse
(TrainArgs, DataArgs, ModelArgs) with --from_yaml override, build the
dataset mix + collators + model, run the multi-task trainer. No
torchrun/NCCL — the mesh comes from jax.devices() and GSPMD.

Synthetic smoke run (no DATA_DIR needed):
  python scripts/run_pretrain.py --synthetic true --max_steps 20 \
      --output_dir /tmp/run1
Recipe run:
  python scripts/run_pretrain.py --from_yaml configs/llama3-full.yml
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from procyon_tpu import config as cfg_mod
    from procyon_tpu.data import data_config
    from procyon_tpu.data.datasets import ProCyonDataStore, SyntheticStore
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.models import unified
    from procyon_tpu.parallel import create_mesh, MeshConfig, shard_params
    from procyon_tpu.parallel.sharding import shard_batch
    from procyon_tpu.training import checkpointing
    from procyon_tpu.training.optimizer import (
        build_frozen_mask_optimizer, build_optimizer)
    from procyon_tpu.training.trainer import Trainer
    from procyon_tpu.training.logging_utils import MetricsLogger

    targs, dargs, margs = cfg_mod.parse_all()

    # optional multi-host init (SURVEY §2.3 comm row: DCN scale-out) —
    # must precede the first device query
    from procyon_tpu.parallel.multihost import initialize_multihost

    proc_idx, proc_count = initialize_multihost(
        coordinator_address=targs.dist_coordinator,
        num_processes=targs.dist_num_processes,
        process_id=None if targs.dist_process_id < 0
        else targs.dist_process_id)

    if dargs.synthetic:
        # shrink the model for the integration path unless a recipe asked
        # for something specific via flags
        margs.text_model = "tiny"
        margs.protein_embed_dim = 64
        margs.hidden_size_token_projector = 64
        margs.retrieval_dim = 32
        margs.dtype = "float32"
        dargs.max_text_len = min(dargs.max_text_len, 256)
        if jax.default_backend() != "tpu":
            margs.attention_backend = "ref"
        store = SyntheticStore(n_proteins=128, n_texts=128, embed_dim=64)
        tokenizer = load_tokenizer(vocab_size=4096)
        # a recipe YAML (e.g. configs/peptide_tune.yml -> peptide_mix) still
        # defines the dataset mix for synthetic integration runs
        mix = data_config.MultiDatasetConfig.load_from_yaml(
            dargs.it_data_config_yml) if dargs.it_data_config_yml \
            else data_config.MultiDatasetConfig(entries=[
                data_config.DatasetEntry(text_type="go",
                                         relations=["process"]),
            ])
    else:
        store = ProCyonDataStore(dargs.data_dir or None)
        tokenizer = load_tokenizer(margs.tokenizer_path)
        mix = data_config.MultiDatasetConfig.load_from_yaml(
            dargs.it_data_config_yml) if dargs.it_data_config_yml \
            else data_config.DEFAULT_FULL_MIX

    ucfg = cfg_mod.build_model_config(margs, dargs)
    ocfg = cfg_mod.build_optimizer_config(targs)
    loop = cfg_mod.build_loop_config(targs)
    weights = cfg_mod.build_task_weights(targs)
    ccfg = cfg_mod.build_collator_config(margs, dargs, targs)

    # exact resume: rebuild streams at the checkpointed position
    resume_states = None
    if targs.resume:
        tstate = checkpointing.peek_resume_state(targs.output_dir)
        if tstate:
            resume_states = tstate.get("stream_states")

    aaseq_embeds = {k: v for k, v in
                    (("peptide", dargs.peptide_embeddings_path),
                     ("domain", dargs.domain_embeddings_path)) if v}
    streams, mixers, stream_states = data_config.build_task_streams(
        mix, store=store, tokenizer=tokenizer, collator_cfg=ccfg,
        batch_sizes={"qa": dargs.qa_batch_size,
                     "retrieval": dargs.retrieval_batch_size,
                     "caption": dargs.caption_batch_size},
        data_dir=dargs.data_dir, synthetic=dargs.synthetic,
        seed=targs.seed, resume_states=resume_states,
        aaseq_embedding_files=aaseq_embeds)
    # drop disabled tasks (skip_frequency == 0)
    for task in list(streams):
        if getattr(targs, f"{task}_skip_frequency") == 0:
            del streams[task]
    if targs.mlm_skip_frequency > 0 and ucfg.esm is not None:
        streams["mlm"] = data_config.build_mlm_stream(
            store, batch_size=dargs.mlm_batch_size,
            n_proteins=getattr(store, "n_proteins", 1024),
            max_protein_len=margs.max_protein_len, seed=targs.seed)

    params = unified.init_params(jax.random.PRNGKey(targs.seed), ucfg)
    if margs.freeze_protein_encoder or margs.freeze_text_encoder:
        optimizer = build_frozen_mask_optimizer(
            ocfg, params, cfg_mod.freeze_fn(margs))
    else:
        optimizer = build_optimizer(ocfg, params)

    n_dev = len(jax.devices())
    mesh = create_mesh(MeshConfig(targs.mesh_data, targs.mesh_fsdp,
                                  targs.mesh_model)) if n_dev > 1 else None

    def to_device(batch):
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if k != "reference_indices" and not np.isscalar(v)}
        if mesh is not None:
            arrs = shard_batch(arrs, mesh)
        return arrs

    metrics_logger = MetricsLogger(
        targs.output_dir, use_wandb=targs.use_wandb,
        wandb_project=targs.wandb_project)

    # eval_on_the_fly (trainIT.py:725-748 + _run_eval :1556-1654): VAL-split
    # streams, all-protein retrieval AUROC/AUPRC, QA/caption val losses
    eval_fn = None
    if targs.eval_steps:
        import dataclasses as _dc

        from procyon_tpu.training.evaluation import build_midtrain_eval

        val_mix = data_config.MultiDatasetConfig(entries=[
            _dc.replace(e, splits=[dargs.eval_split])
            for e in mix.entries])
        val_streams, _, _ = data_config.build_task_streams(
            val_mix, store=store, tokenizer=tokenizer, collator_cfg=ccfg,
            batch_sizes={"qa": dargs.qa_batch_size,
                         "retrieval": dargs.retrieval_batch_size,
                         "caption": dargs.caption_batch_size},
            data_dir=dargs.data_dir, synthetic=dargs.synthetic,
            seed=targs.seed + 1, aaseq_embedding_files=aaseq_embeds)
        val_streams = {t: s for t, s in val_streams.items() if t in streams}
        if dargs.synthetic:
            all_ids = list(range(getattr(store, "n_proteins", 128)))
        else:
            # the full protein set (ALL_PROTEINS_FILE semantics,
            # model_utils.py:44-60), capped for eval cost
            all_ids = sorted({
                r.aaseq_idx
                for t, m in mixers.items()
                for ds in m.datasets.values()
                for r in getattr(ds, "relations", [])})
        all_ids = all_ids[:dargs.eval_max_target_proteins]
        eval_fn = build_midtrain_eval(
            ucfg, val_streams=val_streams, store=store,
            all_protein_ids=all_ids, n_batches=dargs.eval_batches,
            to_device=to_device)

    def run():
        nonlocal params
        if mesh is not None:
            params = shard_params(params, mesh)
        # background H2D pipeline: batches arrive on device already, and
        # the trainer-visible stream states reflect only consumed batches
        # (exact-resume contract, training/prefetch.py)
        run_streams, run_states, run_to_device = (streams, stream_states,
                                                  to_device)
        close_prefetch = None
        if targs.prefetch_depth > 0:
            from procyon_tpu.training.prefetch import wrap_streams
            run_streams, run_states, close_prefetch = wrap_streams(
                streams, to_device=to_device,
                source_states=stream_states,
                depth=targs.prefetch_depth)
            run_to_device = lambda b: b  # noqa: E731
        try:
            trainer = Trainer(cfg=ucfg, params=params, optimizer=optimizer,
                              loop=loop, task_streams=run_streams,
                              weights=weights,
                              metrics_logger=metrics_logger,
                              stream_states=run_states,
                              eval_fn=eval_fn, to_device=run_to_device)
            if targs.resume:
                trainer.maybe_resume()
            trainer.train()
        finally:
            if close_prefetch is not None:
                close_prefetch()
        return trainer

    if mesh is not None:
        with jax.set_mesh(mesh):
            trainer = run()
    else:
        trainer = run()
    print(json.dumps({"final_step": trainer.global_step,
                      "output_dir": targs.output_dir}))


if __name__ == "__main__":
    main()
