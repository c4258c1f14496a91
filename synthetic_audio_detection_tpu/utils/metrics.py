"""Classification metrics: per-class precision/recall/F1 report + confusion
matrix, formatted like sklearn's ``classification_report`` (the reference
prints one per validation epoch and a confusion matrix in --evaluate,
submodel_trainer.py:376-383,444-457) — computed from the confusion-count
sufficient statistics the jitted eval step returns."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def report_from_confusion(
    confusion: np.ndarray, class_names: Sequence[str]
) -> Dict[str, Dict[str, float]]:
    """confusion[true, pred] counts → per-class precision/recall/f1/support
    plus 'accuracy', 'macro avg', 'weighted avg' (sklearn semantics:
    undefined → 0)."""
    conf = np.asarray(confusion, np.float64)
    n = conf.shape[0]
    support = conf.sum(axis=1)
    pred_tot = conf.sum(axis=0)
    tp = np.diag(conf)
    precision = np.divide(tp, pred_tot, out=np.zeros(n), where=pred_tot > 0)
    recall = np.divide(tp, support, out=np.zeros(n), where=support > 0)
    denom = precision + recall
    f1 = np.divide(2 * precision * recall, denom, out=np.zeros(n), where=denom > 0)

    out: Dict[str, Dict[str, float]] = {}
    for i, name in enumerate(class_names):
        out[name] = {
            "precision": float(precision[i]),
            "recall": float(recall[i]),
            "f1-score": float(f1[i]),
            "support": float(support[i]),
        }
    total = support.sum()
    accuracy = float(tp.sum() / total) if total else 0.0
    weights = support / total if total else np.zeros(n)
    out["accuracy"] = {"precision": accuracy, "recall": accuracy,
                       "f1-score": accuracy, "support": float(total)}
    out["macro avg"] = {
        "precision": float(precision.mean()),
        "recall": float(recall.mean()),
        "f1-score": float(f1.mean()),
        "support": float(total),
    }
    out["weighted avg"] = {
        "precision": float((precision * weights).sum()),
        "recall": float((recall * weights).sum()),
        "f1-score": float((f1 * weights).sum()),
        "support": float(total),
    }
    return out


def format_report(
    report: Dict[str, Dict[str, float]], digits: int = 2
) -> str:
    """sklearn classification_report text layout."""
    classes = [k for k in report if k not in ("accuracy", "macro avg", "weighted avg")]
    width = max(max((len(c) for c in classes), default=0), len("weighted avg"))
    head = f"{'':>{width}}  {'precision':>9} {'recall':>9} {'f1-score':>9} {'support':>9}"
    lines = [head, ""]
    for c in classes:
        r = report[c]
        lines.append(
            f"{c:>{width}}  {r['precision']:>9.{digits}f} {r['recall']:>9.{digits}f} "
            f"{r['f1-score']:>9.{digits}f} {int(r['support']):>9}"
        )
    lines.append("")
    acc = report["accuracy"]
    lines.append(
        f"{'accuracy':>{width}}  {'':>9} {'':>9} {acc['f1-score']:>9.{digits}f} "
        f"{int(acc['support']):>9}"
    )
    for c in ("macro avg", "weighted avg"):
        r = report[c]
        lines.append(
            f"{c:>{width}}  {r['precision']:>9.{digits}f} {r['recall']:>9.{digits}f} "
            f"{r['f1-score']:>9.{digits}f} {int(r['support']):>9}"
        )
    return "\n".join(lines)


def format_confusion(
    confusion: np.ndarray, class_names: Sequence[str]
) -> str:
    conf = np.asarray(confusion)
    width = max(len(c) for c in class_names) + 2
    header = " " * width + "".join(f"{c:>{width}}" for c in class_names)
    lines = [header]
    for i, name in enumerate(class_names):
        lines.append(
            f"{name:>{width}}" + "".join(f"{int(v):>{width}}" for v in conf[i])
        )
    return "\n".join(lines)
