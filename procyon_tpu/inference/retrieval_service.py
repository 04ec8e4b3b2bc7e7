"""Retrieval service helpers.

Equivalent of procyon/inference/retrieval_utils.py: startup_retrieval
(:21-73) loads the model + cached all-protein target embeddings;
do_retrieval (:109-202) builds a retrieval query from task/disease
descriptions, runs the model, and returns ranked proteins.
"""

import dataclasses
import os
import pickle
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from procyon_tpu.data import collators as C
from procyon_tpu.data import instruct
from procyon_tpu.inference import prompts
from procyon_tpu.models import unified


@dataclasses.dataclass
class RetrievalService:
    params: dict
    cfg: unified.UnifiedConfig
    tokenizer: object
    store: object
    all_protein_embeddings: np.ndarray  # shared-projector space [N, D]
    protein_ids: Sequence
    task_library: instruct.TaskLibrary = dataclasses.field(
        default_factory=instruct.TaskLibrary)

    def retrieve(self, *, task_id: str, disease_desc: str,
                 instruction_source_dataset: Optional[str] = None,
                 k: int = 10) -> List[Dict]:
        """do_retrieval equivalent: description -> ranked proteins."""
        if instruction_source_dataset and not task_id:
            task_id = f"{instruction_source_dataset}_all_retrieval"
        batch = prompts.create_input_retrieval(
            task_id, tokenizer=self.tokenizer, store=self.store,
            task_library=self.task_library,
            input_description=disease_desc,
            collator_cfg=C.CollatorConfig(
                protein_embed_dim=self.cfg.encoder_out_dim))
        dev = {key: jnp.asarray(v) for key, v in batch.items()
               if key != "reference_indices"}
        q = unified.retrieval_query_embedding(self.params, self.cfg, dev)
        return prompts.get_proteins_from_embedding(
            self.all_protein_embeddings, np.asarray(q)[0],
            protein_ids=self.protein_ids, top_k=k)


def build_all_protein_embeddings(params, cfg, store, protein_ids, *,
                                 cache_path: Optional[str] = None,
                                 batch_size: int = 256) -> np.ndarray:
    """Embed every protein through the shared projector, cached as a pickle
    (startup_retrieval's protein_target_embeddings.pkl, :61-64)."""
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            blob = pickle.load(f)
        if list(blob["ids"]) == list(protein_ids):
            return blob["embeds"]
    chunks = []
    for i in range(0, len(protein_ids), batch_size):
        ids = protein_ids[i:i + batch_size]
        raw = np.stack([store.protein_embedding(p) for p in ids])
        emb = unified.target_protein_embeddings(params, cfg,
                                                jnp.asarray(raw))
        chunks.append(np.asarray(emb, np.float32))
    embeds = np.concatenate(chunks, 0)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump({"ids": list(protein_ids), "embeds": embeds}, f)
    return embeds


def startup_retrieval(params, cfg, tokenizer, store, protein_ids, *,
                      cache_path: Optional[str] = None) -> RetrievalService:
    embeds = build_all_protein_embeddings(params, cfg, store, protein_ids,
                                          cache_path=cache_path)
    return RetrievalService(params=params, cfg=cfg, tokenizer=tokenizer,
                            store=store, all_protein_embeddings=embeds,
                            protein_ids=protein_ids)
