"""ProCyon model wrappers for the eval framework.

Equivalent of procyon/evaluate/framework/procyon.py:
  * ProcyonRetrievalEval (:208-406) — query embeddings from the [PROT]
    hidden state, target embeddings via the protein-only path (with on-disk
    cache), cosine similarity matrix
  * ProcyonQAEval (:114-206) — yes/no probability at [ANSWER]
  * ProcyonCaptionEval (:49-112) — diverse-beam generation
"""

import os
import pickle
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from procyon_tpu.data import collators as C
from procyon_tpu.data import instruct
from procyon_tpu.evaluate.caption import AbstractCaptionModel
from procyon_tpu.evaluate.qa import AbstractQAModel, qa_yes_prob
from procyon_tpu.evaluate.retrieval import AbstractRetrievalModel
from procyon_tpu.inference import generation
from procyon_tpu.models import unified


def _to_device(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()
            if k != "reference_indices" and not np.isscalar(v)}


class ProcyonRetrievalEval(AbstractRetrievalModel):
    name = "procyon"

    def __init__(self, params, cfg: unified.UnifiedConfig, tokenizer, store,
                 task: Dict, *, batch_size: int = 16,
                 target_cache_path: Optional[str] = None,
                 collator_cfg: Optional[C.CollatorConfig] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.store = store
        self.task = task
        self.batch_size = batch_size
        self.target_cache_path = target_cache_path
        self.ccfg = collator_cfg or C.CollatorConfig(
            protein_embed_dim=cfg.encoder_out_dim)
        self.prompt = instruct.get_prompt(task, num_examples=1)
        self.collator = C.RetrievalCollator(self.ccfg, tokenizer, store, task)

    def _query_embeddings(self, query_order) -> np.ndarray:
        out = []
        for i in range(0, len(query_order), self.batch_size):
            chunk = query_order[i:i + self.batch_size]
            samples = [(0, t) for t in chunk]  # target protein unused here
            batch = self.collator(samples, self.prompt)
            emb = unified.retrieval_query_embedding(
                self.params, self.cfg, _to_device(batch))
            out.append(np.asarray(emb, np.float32))
        return np.concatenate(out, 0)

    def _target_embeddings(self, target_order) -> np.ndarray:
        """Protein-side shared-projector embeddings, cached on disk
        (reference :324-356)."""
        if self.target_cache_path and os.path.exists(self.target_cache_path):
            with open(self.target_cache_path, "rb") as f:
                blob = pickle.load(f)
            if list(blob["order"]) == list(target_order):
                return blob["embeds"]
        embeds = []
        embed = (unified.protein_embed_fn(self.cfg)
                 if self.cfg.esm is not None else None)
        for i in range(0, len(target_order), 256):
            chunk = target_order[i:i + 256]
            if self.cfg.esm is not None:
                from procyon_tpu.data import protein_tokenizer as pt

                # jitted sweep with width pinned + rows bucketed so
                # chunk-split variation doesn't recompile per chunk
                # (unified.protein_embed_fn)
                pb = pt.bucket_protein_batch(
                    pt.batch_encode(
                        [self.store.protein_sequence(a) for a in chunk],
                        max_len=self.ccfg.max_protein_len),
                    width=self.ccfg.max_protein_len + 2)
                emb = embed(self.params, jnp.asarray(pb.tokens),
                            jnp.asarray(pb.group_ids),
                            jnp.asarray(pb.row_valid),
                            pb.tokens.shape[0])[:pb.num_groups]
            else:
                raw = jnp.asarray(np.stack(
                    [self.store.protein_embedding(a) for a in chunk]))
                emb = unified.target_protein_embeddings(self.params,
                                                        self.cfg, raw)
            embeds.append(np.asarray(emb, np.float32))
        embeds = np.concatenate(embeds, 0)
        if self.target_cache_path:
            os.makedirs(os.path.dirname(self.target_cache_path) or ".",
                        exist_ok=True)
            with open(self.target_cache_path, "wb") as f:
                pickle.dump({"order": list(target_order), "embeds": embeds},
                            f)
        return embeds

    def get_predictions(self, query_order, target_order, dataset=None):
        q = self._query_embeddings(query_order)
        t = self._target_embeddings(target_order)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-8)
        tn = t / np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-8)
        return qn @ tn.T


class ProcyonQAEval(AbstractQAModel):
    name = "procyon"

    def __init__(self, params, cfg, tokenizer, store, task, *,
                 batch_size: int = 16, collator_cfg=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        ccfg = collator_cfg or C.CollatorConfig(
            protein_embed_dim=cfg.encoder_out_dim)
        self.prompt = instruct.get_prompt(task, num_examples=1)
        self.collator = C.QACollator(ccfg, tokenizer, store, task)

    def get_predictions(self, dataset):
        """dataset: sequence of (aaseq_idx, text_idx, label)."""
        yes_all, labels_all = [], []
        spec = self.tokenizer.spec
        for i in range(0, len(dataset), self.batch_size):
            chunk = dataset[i:i + self.batch_size]
            samples = [(a, t, bool(y)) for a, t, y in chunk]
            batch = self.collator(samples, self.prompt)
            out = unified.forward(self.params, self.cfg, _to_device(batch))
            logits = np.asarray(out["logits"], np.float32)
            ans = batch["answer_pos"]
            at = logits[np.arange(len(chunk)), ans]
            yes_all.append(qa_yes_prob(at, spec.yes_id, spec.no_id))
            labels_all.append([y for _, _, y in chunk])
        return np.concatenate(yes_all), np.concatenate(labels_all)


class ProcyonCaptionEval(AbstractCaptionModel):
    name = "procyon"

    def __init__(self, params, cfg, tokenizer, store, task, *,
                 batch_size: int = 8,
                 gen: Optional[generation.GenerationConfig] = None,
                 collator_cfg=None, use_paged: bool = False,
                 page_size: int = 64, shared_prefix: bool = False,
                 step_trip: int = 1):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.gen = gen or generation.GenerationConfig(
            max_new_tokens=200, method="beam", beam_size=10,
            beam_group_size=2, diversity_penalty=0.8,
            eos_token_id=tokenizer.spec.eos_id,
            pad_token_id=tokenizer.spec.pad_id)
        # paged beam decode (inference/paged_beam.py): beams share the
        # prompt's KV pages; identical tokens to the dense path — the
        # memory/throughput pick for the flagship 8B captioner.
        # shared_prefix additionally dedups identical leading prompt
        # blocks (one instruction template per caption batch) — WITHIN a
        # batch and, via a persistent BeamPoolSession, ACROSS batches:
        # chunks 2..n hit the cached instruction KV (prefill skipped) and
        # reuse chunk 1's compiled programs (one pool config per run)
        self.use_paged = use_paged
        self.page_size = page_size
        self.shared_prefix = shared_prefix
        # step_trip=K > 1: K beam-decode steps per dispatch (one
        # lax.scan program — paged_beam.paged_beam_step_trip); amortizes
        # the per-step program-boundary idle on host-stepped drive loops
        self.step_trip = step_trip
        self._session = None
        ccfg = collator_cfg or C.CollatorConfig(
            protein_embed_dim=cfg.encoder_out_dim)
        self.prompt = instruct.get_prompt(task, num_examples=1)
        self.collator = C.CaptionCollator(ccfg, tokenizer, store, task)

    def get_predictions(self, dataset) -> Dict[int, str]:
        """dataset: sequence of aaseq indices to caption."""
        out: Dict[int, str] = {}
        for i in range(0, len(dataset), self.batch_size):
            chunk = list(dataset[i:i + self.batch_size])
            samples = [(a, 0) for a in chunk]
            if self.gen.method == "beam" and self.use_paged \
                    and self.shared_prefix:
                # pad the ragged last chunk so every batch matches the
                # session's fixed pool shape (pad captions are discarded;
                # the repeated row is a full cache hit — near-free)
                while len(samples) < self.batch_size:
                    samples.append(samples[-1])
            batch = self.collator(samples, self.prompt, for_generation=True)
            if self.gen.method == "beam" and self.use_paged:
                from procyon_tpu.inference import paged_beam

                if self.shared_prefix and self._session is None:
                    self._session = paged_beam.BeamPoolSession(
                        page_size=self.page_size)
                tokens, _ = paged_beam.paged_beam_generate(
                    self.params, self.cfg, batch, self.gen,
                    page_size=self.page_size,
                    shared_prefix=self.shared_prefix,
                    session=self._session, step_trip=self.step_trip)
                tokens = np.asarray(tokens)[:len(chunk), 0]
            elif self.gen.method == "beam":
                tokens, _ = generation.generate_beam(
                    self.params, self.cfg, _to_device(batch), self.gen)
                tokens = np.asarray(tokens)[:, 0]  # best hypothesis
            else:
                tokens = np.asarray(generation.generate(
                    self.params, self.cfg, _to_device(batch), self.gen))
            for a, toks in zip(chunk, tokens):
                out[a] = self.tokenizer.decode(toks)
        return out
