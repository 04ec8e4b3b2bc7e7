"""Model definitions: functional (pure) apply functions over param pytrees.

Equivalents of the reference model layer (SURVEY.md §2.1):
  llama.py        <- procyon/model/pmc_llama.py (LlamaPostTokenization)
  esm2.py         <- procyon/model/esm.py (ESM_PLM)
  projectors.py   <- procyon/model/model_utils.py:create_mlp
  contrastive.py  <- procyon/model/contrastive.py
  lora.py         <- procyon/model/mlora.py (task-banked LoRA)
  pooling.py      <- procyon/model/esm.py:ProteinPooler
  unified.py      <- procyon/model/model_unified.py (UnifiedProCyon)
"""
