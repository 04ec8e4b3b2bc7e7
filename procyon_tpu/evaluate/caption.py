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
                         bertscorer=None,
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
    if use_bertscore or bertscorer is not None:
        # native scorer (evaluate/bertscore.py over models/bert.py) — the
        # reference's primary caption metric (caption.py:68-103, en-sci)
        # with no external package. Pass a BERTScorer built from a local
        # SciBERT checkpoint for exact en-sci parity; with none given, a
        # synthetic-weight scorer still exercises the exact metric math.
        if bertscorer is None:
            from procyon_tpu.evaluate.bertscore import make_scorer

            bertscorer = make_scorer()
        hyps, refs_list = [], []
        for ent, hyp in predictions.items():
            if ent in references:
                hyps.append(hyp)
                refs_list.append(references[ent])
        if hyps:
            res = bertscorer.score(hyps, refs_list)
            out["bertscore_f1"] = float(res.f1.mean())
            out["bertscore_precision"] = float(res.precision.mean())
            out["bertscore_recall"] = float(res.recall.mean())
        else:
            out["bertscore_f1"] = float("nan")
    return out


def run_caption_eval(model: AbstractCaptionModel, dataset, *,
                     references: Dict[int, List[str]],
                     use_bertscore: bool = False,
                     bertscorer=None,
                     dataset_name="dataset") -> Dict[str, float]:
    predictions = model.get_predictions(dataset)
    return calc_caption_metrics(predictions, references,
                                use_bertscore=use_bertscore,
                                bertscorer=bertscorer)
