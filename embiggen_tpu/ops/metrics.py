"""Evaluation metrics — native replacement for the reference engine's
`express_measures.all_binary_metrics / binary_auroc / binary_auprc`
(reference call sites `embiggen/utils/abstract_models/
abstract_classifier_model.py:2027-2085`). Binary metrics are vectorized
numpy (sort-based AUROC/AUPRC, exact tie handling); multiclass panels use
sklearn exactly as the reference does.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _stable_argsort(x: np.ndarray) -> np.ndarray:
    """Stable ascending argsort of float scores — native LSD radix over
    the order-preserving bit transform when available (numpy's mergesort
    took 15-30 s per 19M-score metric at bench scale). float32 inputs
    sort through a 32-bit transform: the radix skips constant-byte
    passes, so they cost 4 passes instead of 8 (the f32→f64 cast is
    exact and monotone, so the order — and every tie group — is
    identical)."""
    from .. import native

    x = np.ascontiguousarray(x)
    if x.dtype == np.float32:
        bits = x.view(np.uint32)
        u = (
            bits ^ np.where(
                (bits >> np.uint32(31)) != 0,
                np.uint32(0xFFFFFFFF),
                np.uint32(0x80000000),
            )
        ).astype(np.uint64)
    else:
        x = x.astype(np.float64, copy=False)
        bits = x.view(np.uint64)
        u = bits ^ np.where(
            (bits >> np.uint64(63)) != 0,
            np.uint64(0xFFFFFFFFFFFFFFFF),
            np.uint64(0x8000000000000000),
        )
    order = native.radix_argsort(u)
    if order is None:
        return np.argsort(x, kind="mergesort")
    return order


def binary_auroc(
    labels: np.ndarray, scores: np.ndarray, order: np.ndarray = None
) -> float:
    """Area under ROC via the Mann-Whitney U statistic with midrank ties
    (midranks are computed fully vectorized — a per-tie-group Python loop
    is a 19M-iteration disaster on mostly-distinct float scores).
    `order` optionally supplies a precomputed ascending stable argsort of
    `scores` (the panel shares one sort between AUROC and AUPRC)."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, dtype=np.float64)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    if order is None:
        order = _stable_argsort(scores)
    sorted_scores = scores[order]
    grp = np.concatenate(
        [[0], np.cumsum(sorted_scores[1:] != sorted_scores[:-1])]
    )
    counts = np.bincount(grp)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # a tie group occupying sorted positions [a, a+c) has 1-based ranks
    # a+1..a+c → midrank a + (c + 1) / 2
    mid = starts[grp] + (counts[grp] + 1) / 2.0
    ranks = np.empty(len(scores), dtype=np.float64)
    ranks[order] = mid
    u = ranks[labels].sum() - n_pos * (n_pos + 1) / 2
    return float(u / (n_pos * n_neg))


def binary_auprc(
    labels: np.ndarray, scores: np.ndarray, order: np.ndarray = None
) -> float:
    """Area under precision-recall via step integration (sklearn
    `average_precision_score` semantics). `order` optionally supplies a
    DESCENDING argsort of `scores` (tied thresholds collapse to the group
    boundary, so within-tie order doesn't affect the value)."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, dtype=np.float64)
    n_pos = int(labels.sum())
    if n_pos == 0:
        return float("nan")
    if order is None:
        order = _stable_argsort(-scores)
    sorted_labels = labels[order].astype(np.float64)
    sorted_scores = scores[order]
    tp = np.cumsum(sorted_labels)
    fp = np.cumsum(1.0 - sorted_labels)
    # collapse tied thresholds: keep last index of each distinct score
    distinct = np.nonzero(np.diff(sorted_scores))[0]
    idx = np.concatenate([distinct, [len(sorted_scores) - 1]])
    tp, fp = tp[idx], fp[idx]
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / n_pos
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def _ranking_pair(labels, scores) -> Dict[str, float]:
    """AUROC + AUPRC sharing ONE stable sort (descending = reversed
    ascending; AUPRC is tie-order invariant). The sort runs on the input
    dtype (4 radix passes for float32 probabilities) and both areas come
    from one native two-pass sweep over the sorted arrays when available
    (`graph_algos.cpp::ranking_metrics_sorted` — sklearn-parity tested)."""
    from .. import native

    scores = np.asarray(scores)
    order = _stable_argsort(scores)
    scores64 = scores.astype(np.float64, copy=False)
    got = native.ranking_metrics_sorted(
        scores64[order], np.asarray(labels, dtype=bool)[order]
    )
    if got is not None:
        return {"auroc": got[0], "auprc": got[1]}
    return {
        "auroc": binary_auroc(labels, scores64, order=order),
        "auprc": binary_auprc(labels, scores64, order=order[::-1]),
    }


def all_binary_metrics(
    labels: np.ndarray, scores: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Full binary panel at the given threshold + AUROC/AUPRC."""
    labels = np.asarray(labels).astype(bool)
    preds = np.asarray(scores) > threshold
    tp = float((preds & labels).sum())
    tn = float((~preds & ~labels).sum())
    fp = float((preds & ~labels).sum())
    fn = float((~preds & labels).sum())
    n = tp + tn + fp + fn

    def safe(a, b):
        return a / b if b > 0 else 0.0

    precision = safe(tp, tp + fp)
    recall = safe(tp, tp + fn)
    specificity = safe(tn, tn + fp)
    mcc_den = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return {
        "accuracy": safe(tp + tn, n),
        "balanced_accuracy": (recall + specificity) / 2,
        "precision": precision,
        "recall": recall,
        "specificity": specificity,
        "f1_score": safe(2 * precision * recall, precision + recall),
        "matthews_correlation_coefficient": (
            float((tp * tn - fp * fn) / mcc_den) if mcc_den > 0 else 0.0
        ),
        **_ranking_pair(labels, scores),
        "true_positives": tp,
        "true_negatives": tn,
        "false_positives": fp,
        "false_negatives": fn,
    }


def multiclass_metrics(
    labels: np.ndarray,
    probabilities: np.ndarray,
    multilabel: bool = False,
) -> Dict[str, float]:
    """Multiclass / multilabel panel using sklearn, matching the reference's
    choices (`abstract_classifier_model.py`: accuracy, balanced accuracy,
    macro F1/precision/recall, OVR AUROC; hamming loss for multilabel)."""
    from sklearn import metrics as skm

    probabilities = np.asarray(probabilities)
    labels = np.asarray(labels)
    out: Dict[str, float] = {}
    if multilabel:
        preds = probabilities > 0.5
        out["accuracy"] = float(skm.accuracy_score(labels, preds))
        out["hamming_loss"] = float(skm.hamming_loss(labels, preds))
        for avg in ("macro", "micro"):
            out[f"f1_score_{avg}"] = float(
                skm.f1_score(labels, preds, average=avg, zero_division=0)
            )
        try:
            out["auroc_macro_ovr"] = float(
                skm.roc_auc_score(labels, probabilities, average="macro")
            )
        except ValueError:
            out["auroc_macro_ovr"] = float("nan")
        return out
    preds = probabilities.argmax(axis=1)
    out["accuracy"] = float(skm.accuracy_score(labels, preds))
    out["balanced_accuracy"] = float(skm.balanced_accuracy_score(labels, preds))
    for name, fn in (
        ("f1_score", skm.f1_score),
        ("precision", skm.precision_score),
        ("recall", skm.recall_score),
    ):
        out[f"{name}_macro"] = float(
            fn(labels, preds, average="macro", zero_division=0)
        )
    try:
        present = np.unique(labels)
        if len(present) == probabilities.shape[1]:
            out["auroc_macro_ovr"] = float(
                skm.roc_auc_score(
                    labels, probabilities, multi_class="ovr", average="macro"
                )
            )
        else:
            out["auroc_macro_ovr"] = float("nan")
    except ValueError:
        out["auroc_macro_ovr"] = float("nan")
    return out
