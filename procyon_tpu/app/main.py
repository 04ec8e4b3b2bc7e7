"""FastAPI retrieval service.

Equivalent of procyon/app/main.py: startup loads the model + cached
all-protein embeddings (:33-53); POST /retrieve (:56-80) takes task_desc /
disease_desc / instruction_source_dataset in {disgenet, omim} / k and
returns the top-k protein records.

Run: `uvicorn procyon_tpu.app.main:app --port 8000` with env vars
CHECKPOINT_PATH (orbax checkpoint dir) and DATA_DIR, or
PROCYON_SYNTHETIC=1 for a synthetic demo service.
"""

import os
from typing import Optional

try:
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel
except ImportError:  # pragma: no cover - fastapi optional
    FastAPI = None

from procyon_tpu.inference.retrieval_service import (RetrievalService,
                                                     startup_retrieval)

_service: Optional[RetrievalService] = None


def _build_service() -> RetrievalService:
    import jax

    from procyon_tpu.data import datasets
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.models import unified

    if os.environ.get("PROCYON_SYNTHETIC"):
        cfg = unified.tiny_config(esm=None, protein_embed_dim=64,
                                  llama=__import__(
                                      "procyon_tpu.models.llama",
                                      fromlist=["tiny_config"]
                                  ).tiny_config(vocab_size=4096))
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = datasets.SyntheticStore(n_proteins=256, embed_dim=64)
        tokenizer = load_tokenizer(vocab_size=4096)
        ids = list(range(store.n_proteins))
        return startup_retrieval(params, cfg, tokenizer, store, ids)

    ckpt = os.environ.get("CHECKPOINT_PATH")
    if not ckpt:
        raise RuntimeError("set CHECKPOINT_PATH or PROCYON_SYNTHETIC=1")
    from procyon_tpu.models.checkpoint_io import load_model

    params, cfg, tokenizer = load_model(ckpt)
    store = datasets.ProCyonDataStore()
    n = int(os.environ.get("NUM_PROTEINS", "57000"))
    ids = list(range(n))
    cache = os.path.join(os.path.dirname(ckpt),
                         "protein_target_embeddings.pkl")
    return startup_retrieval(params, cfg, tokenizer, store, ids,
                             cache_path=cache)


if FastAPI is not None:
    app = FastAPI(title="procyon-tpu retrieval")

    class RetrieveRequest(BaseModel):
        task_desc: str = ""
        disease_desc: str
        instruction_source_dataset: str = "disgenet"
        k: int = 10

    @app.on_event("startup")
    def _startup():
        global _service
        _service = _build_service()

    @app.post("/retrieve")
    def retrieve(req: RetrieveRequest):
        if _service is None:
            raise HTTPException(503, "service not initialized")
        if req.instruction_source_dataset not in ("disgenet", "omim"):
            raise HTTPException(
                422, "instruction_source_dataset must be disgenet or omim")
        task_id = f"{req.instruction_source_dataset}_all_retrieval"
        results = _service.retrieve(task_id=task_id,
                                    disease_desc=req.disease_desc,
                                    k=req.k)
        return {"results": results}

    @app.get("/healthz")
    def healthz():
        return {"ok": _service is not None}
