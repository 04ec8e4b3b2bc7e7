"""Caption evaluation: ROUGE-L / BLEU (+ optional BERTScore) vs merged
references.

Equivalent of procyon/evaluate/framework/caption.py (:21-220): per-protein
generated captions are scored against ALL reference descriptions for that
protein (multi-reference merge, :48-66); metrics are BERTScore (en-sci,
optional — requires a local model), ROUGE-L, BLEU.
"""

from typing import Dict, List, Sequence

import numpy as np

from procyon_tpu.evaluate.metrics import bleu, bootstrap_ci, rouge_l


class AbstractCaptionModel:
    name = "abstract"

    def get_predictions(self, dataset) -> Dict[int, str]:
        """Return {entity_id: generated caption}."""
        raise NotImplementedError


def merge_references(relations: Sequence) -> Dict[int, List[str]]:
    """(entity_id, reference_text) pairs -> {entity_id: [refs...]}
    (multi-reference merge, caption.py:48-66)."""
    refs: Dict[int, List[str]] = {}
    for ent, text in relations:
        refs.setdefault(ent, []).append(text)
    return refs


def calc_caption_metrics(predictions: Dict[int, str],
                         references: Dict[int, List[str]], *,
                         use_bertscore: bool = False,
                         bootstrap: bool = True,
                         n_boot: int = 200) -> Dict[str, float]:
    rouges, bleus = [], []
    for ent, hyp in predictions.items():
        refs = references.get(ent)
        if not refs:
            continue
        rouges.append(rouge_l(hyp, refs))
        bleus.append(bleu(hyp, refs))
    out = {
        "rouge_l": float(np.mean(rouges)) if rouges else float("nan"),
        "bleu": float(np.mean(bleus)) if bleus else float("nan"),
        "n": len(rouges),
    }
    if bootstrap and rouges:
        _, lo, hi = bootstrap_ci(np.asarray(rouges), n_boot=n_boot)
        out["rouge_l_ci_low"] = lo
        out["rouge_l_ci_high"] = hi
    if use_bertscore:
        # missing optional dependency degrades loudly-but-gracefully; any
        # OTHER failure propagates (a parity metric must not silently NaN)
        try:
            from bert_score import score as bert_score
        except ImportError:
            import logging

            logging.getLogger("procyon_tpu.evaluate").warning(
                "bert_score is not installed - bertscore_f1 reported as "
                "NaN (install bert-score for caption parity metrics)")
            out["bertscore_f1"] = float("nan")
            return out
        hyps, refs_list = [], []
        for ent, hyp in predictions.items():
            if ent in references:
                hyps.append(hyp)
                refs_list.append(references[ent])
        _, _, f1 = bert_score(hyps, refs_list, lang="en-sci")
        out["bertscore_f1"] = float(f1.mean())
    return out


def run_caption_eval(model: AbstractCaptionModel, dataset, *,
                     references: Dict[int, List[str]],
                     use_bertscore: bool = False,
                     dataset_name="dataset") -> Dict[str, float]:
    predictions = model.get_predictions(dataset)
    return calc_caption_metrics(predictions, references,
                                use_bertscore=use_bertscore)
