"""Comparison baseline models over precomputed embeddings.

Equivalents of the reference's baseline zoo (SURVEY.md §2.1 "Baselines"):
knn.py (:43-196), mlp.py (:55-392), blast.py (:26-88), random.py — all
operate on precomputed protein embeddings / score matrices, no LLM needed.
"""

from procyon_tpu.evaluate.baselines.simple import (
    KNNRetrievalModel, KNNQAModel, MLPRetrievalModel, RandomRetrievalModel,
    RandomQAModel, ScoreMatrixRetrievalModel,
)

from procyon_tpu.evaluate.baselines.protllm import ProtLLMQAEval
from procyon_tpu.evaluate.baselines.text_models import (
    BertTextTower, BioTranslatorRetrievalEval, CNNConfig,
    ProtSTRetrievalEval, TextEncoderRetrievalEval,
)

__all__ = ["KNNRetrievalModel", "KNNQAModel", "MLPRetrievalModel",
           "RandomRetrievalModel", "RandomQAModel",
           "ScoreMatrixRetrievalModel", "BertTextTower", "CNNConfig",
           "BioTranslatorRetrievalEval", "ProtSTRetrievalEval",
           "TextEncoderRetrievalEval", "ProtLLMQAEval"]
