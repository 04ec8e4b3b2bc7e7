"""QA evaluation: yes/no accuracy + macro-F1 + bootstrap.

Equivalent of procyon/evaluate/framework/qa.py (:21-112): models expose
`get_predictions(dataset) -> (yes_probs, labels)`; metrics are accuracy and
macro-F1 with bootstrap CIs. The probability of "yes" is read at the
[ANSWER] position (get_qa_scores, train_utils.py:1048-1118).
"""

from typing import Dict, Tuple

import numpy as np

from procyon_tpu.evaluate.metrics import bootstrap_ci


class AbstractQAModel:
    name = "abstract"

    def get_predictions(self, dataset) -> Tuple[np.ndarray, np.ndarray]:
        """Return (yes_probs [N], labels [N] in {0,1})."""
        raise NotImplementedError


def qa_yes_prob(logits_at_answer: np.ndarray, yes_id: int,
                no_id: int) -> np.ndarray:
    """P(yes | {yes, no}) from next-token logits at the [ANSWER] position
    (get_qa_scores semantics)."""
    yes = logits_at_answer[..., yes_id]
    no = logits_at_answer[..., no_id]
    m = np.maximum(yes, no)
    ey = np.exp(yes - m)
    en = np.exp(no - m)
    return ey / (ey + en)


def calc_qa_metrics(yes_probs: np.ndarray, labels: np.ndarray, *,
                    bootstrap: bool = True, n_boot: int = 200
                    ) -> Dict[str, float]:
    from sklearn.metrics import f1_score

    preds = (yes_probs >= 0.5).astype(int)
    labels = np.asarray(labels, int)
    acc = float((preds == labels).mean()) if labels.size else float("nan")
    f1 = float(f1_score(labels, preds, average="macro")) if labels.size \
        else float("nan")
    out = {"accuracy": acc, "f1_macro": f1, "n": int(labels.size)}
    if bootstrap and labels.size:
        correct = (preds == labels).astype(float)
        _, lo, hi = bootstrap_ci(correct, n_boot=n_boot)
        out["accuracy_ci_low"] = lo
        out["accuracy_ci_high"] = hi
    return out


def run_qa_eval(model: AbstractQAModel, dataset, *, cache=None,
                dataset_name="dataset") -> Dict[str, float]:
    cached = None
    if cache:
        try:
            cached = cache.load(model.name, f"{dataset_name}__qa")
        except ValueError:
            cached = None
    if cached is not None:
        yes_probs, labels = cached[:, 0], cached[:, 1]
    else:
        yes_probs, labels = model.get_predictions(dataset)
        if cache:
            cache.save(model.name, f"{dataset_name}__qa",
                       np.stack([yes_probs, labels], axis=1))
    return calc_qa_metrics(np.asarray(yes_probs), np.asarray(labels))
