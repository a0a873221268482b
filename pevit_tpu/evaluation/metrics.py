"""Per-dataset evaluation metrics.

Reference: vision_benchmark/evaluation/metric.py:7-47, which wraps the
``vision-evaluation`` package + sklearn.  The four metrics and their dataset
mapping (resources/datasets/*.yaml TEST.METRIC):

* ``accuracy``       — top-1 (most datasets)
* ``mean-per-class`` — balanced accuracy (fgvc-aircraft, oxford pets, ...)
* ``11point_mAP``    — VOC-style 11-point interpolated mAP (voc-2007 multilabel)
* ``roc_auc``        — hateful-memes, patch-camelyon

All functions take ``(y_label, y_pred)`` in the reference's argument order
where ``y_pred`` are softmax/probability scores of shape (N, C).
"""

from __future__ import annotations

import logging

import numpy as np
from sklearn.metrics import balanced_accuracy_score as _sk_balanced
from sklearn.metrics import roc_auc_score as _sk_roc_auc

MULTILABEL_DATASETS = {"voc-2007-classification", "chestx-ray8"}  # kadaptation_clip.py:46


def accuracy(y_label: np.ndarray, y_pred: np.ndarray) -> float:
    """Top-1 accuracy over probability scores (metric.py:7-15)."""
    pred = np.asarray(y_pred).argmax(axis=1)
    return float((pred == np.asarray(y_label).reshape(-1)).mean())


def balanced_accuracy_score(y_label: np.ndarray, y_pred: np.ndarray) -> float:
    """Mean-per-class recall (metric.py:24-27)."""
    pred = np.asarray(y_pred).argmax(axis=1)
    return float(_sk_balanced(np.asarray(y_label).reshape(-1), pred))


def map_11_points(y_label: np.ndarray, y_pred_proba: np.ndarray) -> float:
    """VOC 11-point interpolated mean average precision (metric.py:18-21).

    y_label: (N, C) binary multilabel matrix; y_pred_proba: (N, C) scores.
    AP per class = mean over recall thresholds {0, 0.1, ..., 1.0} of the
    interpolated precision max_{r' >= r} p(r'); mAP = mean over classes.

    Built on sklearn's ``precision_recall_curve`` exactly like the
    reference's vision-evaluation ``MeanAveragePrecisionNPointsEvaluator``,
    which makes two behaviors part of the contract:

    * the curve's terminal (recall=0, precision=1) sentinel participates in
      the interpolation, so the r=0 term is always 1.0 (a hand-rolled
      per-rank version without the sentinel under-reports by up to
      (1 - max precision)/11 per class — caught by the sklearn
      cross-reconstruction test);
    * tied scores contribute one operating point per DISTINCT threshold
      (precision measured after the whole tie group), not one per rank.
    """
    from sklearn.metrics import precision_recall_curve as _sk_pr_curve

    y_label = np.asarray(y_label)
    scores = np.asarray(y_pred_proba)
    if y_label.ndim == 1:
        onehot = np.zeros_like(scores)
        onehot[np.arange(len(y_label)), y_label.astype(int)] = 1
        y_label = onehot
    n_classes = scores.shape[1]
    aps = []
    for c in range(n_classes):
        gt = y_label[:, c] > 0
        if not gt.any():
            continue
        precision, recall, _ = _sk_pr_curve(gt.astype(np.int64), scores[:, c])
        ap = 0.0
        for r in np.linspace(0.0, 1.0, 11):
            mask = recall >= r
            ap += float(precision[mask].max()) if mask.any() else 0.0
        aps.append(ap / 11.0)
    return float(np.mean(aps)) if aps else 0.0


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """ROC-AUC; binary datasets score the positive column (metric.py:30-33)."""
    y_score = np.asarray(y_score)
    if y_score.ndim == 2 and y_score.shape[1] == 2:
        return float(_sk_roc_auc(np.asarray(y_true).reshape(-1), y_score[:, 1]))
    return float(_sk_roc_auc(y_true, y_score))


def get_metric(metric_name: str):
    if metric_name == "accuracy":
        return accuracy
    if metric_name == "mean-per-class":
        return balanced_accuracy_score
    if metric_name == "11point_mAP":
        return map_11_points
    if metric_name == "roc_auc":
        return roc_auc
    logging.error("Undefined metric: %s", metric_name)
    return None
