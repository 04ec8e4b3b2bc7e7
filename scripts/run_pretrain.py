"""Instruction pretraining CLI.

Equivalent of the reference's scripts/run_pretrain.py: parse args (flags or
--from_yaml), build datasets + collators + model, run the multi-task
trainer. No torchrun/NCCL — the mesh comes from jax.devices() and GSPMD.

Synthetic smoke run (no DATA_DIR needed):
  python scripts/run_pretrain.py --synthetic --max_steps 20 \
      --output_dir /tmp/run1
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--from_yaml", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data + tiny model (smoke/integration)")
    p.add_argument("--output_dir", type=str,
                   default=os.environ.get("OUTPUTDIR", "runs/pretrain"))
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_text_len", type=int, default=512)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--retrieval_skip_freq", type=int, default=1)
    p.add_argument("--caption_skip_freq", type=int, default=1)
    p.add_argument("--mlm_skip_freq", type=int, default=0,
                   help="0 disables the MLM task")
    args = p.parse_args()
    if args.from_yaml:
        import yaml

        with open(args.from_yaml) as f:
            overrides = yaml.safe_load(f)
        for k, v in overrides.items():
            if hasattr(args, k):
                setattr(args, k, v)
    return args


def build_synthetic(args):
    import jax
    import jax.numpy as jnp

    from procyon_tpu.data import collators as C
    from procyon_tpu.data import datasets, instruct, mixing
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.models import llama, unified

    store = datasets.SyntheticStore(n_proteins=128, n_texts=128,
                                    embed_dim=64)
    tokenizer = load_tokenizer(vocab_size=4096)
    lib = instruct.TaskLibrary()
    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(vocab_size=4096, dim=128, n_layers=2,
                                n_heads=4, n_kv_heads=2, intermediate=256,
                                max_seq_len=args.max_text_len,
                                dtype=jnp.float32,
                                attn_backend=None
                                if jax.default_backend() == "tpu"
                                else "ref"),
        esm=None, protein_embed_dim=64, token_projector_layers=2,
        token_projector_hidden=64, retrieval_dim=32, dtype=jnp.float32)

    relations = [(i % 128, (i * 7) % 128) for i in range(512)]
    ds = datasets.AASeqTextRelationDataset(relations, store, name="synth")
    ccfg = C.CollatorConfig(max_text_len=args.max_text_len,
                            protein_embed_dim=64)
    rng = np.random.default_rng(0)

    streams = {}

    def make_stream(task_name, collator_cls, prompt_task):
        prompt = instruct.get_prompt(lib.get(prompt_task), num_examples=1)
        coll = collator_cls(ccfg, tokenizer, store, lib.get(prompt_task))
        mixer = mixing.TaskMixer({"synth": ds},
                                 {"synth": args.batch_size}, seed=1)
        it = mixer.iterate(mixing.MixerState())

        def stream():
            _, idxs, _ = next(it)
            items = [ds[i] for i in idxs]
            if task_name == "qa":
                samples = [(x["aaseq_idx"], x["text_idx"],
                            bool(rng.random() < 0.5)) for x in items]
                return coll(samples, prompt)
            samples = [(x["aaseq_idx"], x["text_idx"]) for x in items]
            return coll(samples, prompt)

        return stream

    streams["qa"] = make_stream("qa", C.QACollator, "go_process_qa")
    streams["retrieval"] = make_stream("retrieval", C.RetrievalCollator,
                                       "go_process_retrieval")
    streams["caption"] = make_stream("caption", C.CaptionCollator,
                                     "go_process_caption")
    return cfg, store, tokenizer, streams


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from procyon_tpu.parallel import create_mesh, MeshConfig, shard_params
    from procyon_tpu.parallel.sharding import shard_batch
    from procyon_tpu.training.optimizer import (OptimizerConfig,
                                                build_optimizer)
    from procyon_tpu.training.trainer import TrainLoopConfig, Trainer
    from procyon_tpu.models import unified

    if args.synthetic:
        cfg, store, tokenizer, streams = build_synthetic(args)
    else:
        raise SystemExit(
            "real-data pretraining requires DATA_DIR wiring; see "
            "configs/ and use --synthetic for the integration path")

    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(lr=args.lr, warmup_steps=args.warmup_steps,
                           total_steps=args.max_steps)
    optimizer = build_optimizer(ocfg, params)

    n_dev = len(jax.devices())
    mesh = create_mesh(MeshConfig(args.mesh_data, args.mesh_fsdp,
                                  args.mesh_model)) if n_dev > 1 else None

    skip = {}
    if args.retrieval_skip_freq > 1:
        skip["retrieval"] = args.retrieval_skip_freq
    if args.caption_skip_freq > 1:
        skip["caption"] = args.caption_skip_freq

    loop = TrainLoopConfig(max_steps=args.max_steps,
                           log_steps=args.log_steps,
                           save_steps=args.save_steps,
                           output_dir=args.output_dir,
                           skip_frequency=skip)

    def to_device(batch):
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if k != "reference_indices" and not np.isscalar(v)}
        if mesh is not None:
            arrs = shard_batch(arrs, mesh)
        return arrs

    if mesh is not None:
        params = shard_params(params, mesh)

    ctx = mesh or __import__("contextlib").nullcontext()
    if mesh is not None:
        with jax.set_mesh(mesh):
            trainer = Trainer(cfg=cfg, params=params, optimizer=optimizer,
                              loop=loop, task_streams=streams,
                              to_device=to_device)
            if args.resume:
                trainer.maybe_resume()
            trainer.train()
    else:
        trainer = Trainer(cfg=cfg, params=params, optimizer=optimizer,
                          loop=loop, task_streams=streams,
                          to_device=to_device)
        if args.resume:
            trainer.maybe_resume()
        trainer.train()
    print(json.dumps({"final_step": trainer.global_step,
                      "output_dir": args.output_dir}))


if __name__ == "__main__":
    main()
