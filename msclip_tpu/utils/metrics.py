"""Evaluation metrics + meters.

Same semantics as the reference eval driver's metric suite
(``tools/zero_shot.py:122-180, 280-302``): top-k accuracy, 11-point mAP,
balanced ("mean-per-class") accuracy, ROC-AUC, AverageMeter.
"""

from __future__ import annotations

import numpy as np


class AverageMeter:
    """Running average (reference ``tools/zero_shot.py:165-180``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def topk_accuracy(logits, target, topk=(1,), mask=None):
    """Percentage top-k accuracy. ``mask`` selects valid (non-pad) rows."""
    logits = np.asarray(logits)
    target = np.asarray(target)
    if mask is not None:
        logits = logits[np.asarray(mask)]
        target = target[np.asarray(mask)]
    n = len(target)
    if n == 0:
        return [0.0 for _ in topk]
    maxk = max(topk)
    pred = np.argsort(-logits, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    return [100.0 * correct[:, :k].any(axis=1).sum() / n for k in topk]


def map_11points(y_label, y_scores):
    """11-point interpolated average precision, identical to the
    reference's implementation (``tools/zero_shot.py:136-147``)."""
    from sklearn.metrics import precision_recall_curve

    precision, recall, _ = precision_recall_curve(y_label, y_scores)
    recall_thresholds = np.linspace(1, 0, 11, endpoint=True).tolist()
    precision_sum = 0.0
    recall_idx = 0
    precision_tmp = 0.0
    for threshold in recall_thresholds:
        while recall_idx < len(recall) and threshold <= recall[recall_idx]:
            precision_tmp = max(precision_tmp, precision[recall_idx])
            recall_idx += 1
        precision_sum += precision_tmp
    return precision_sum / 11


def multilabel_map_11points(y, logits):
    """Mean over classes of 11-point AP, scaled to percent."""
    y = np.asarray(y)
    logits = np.asarray(logits)
    total = sum(
        map_11points(y[:, c], logits[:, c]) for c in range(y.shape[1])
    )
    return total * 100.0 / y.shape[1]


def mean_per_class_accuracy(y, logits):
    from sklearn.metrics import balanced_accuracy_score

    pred = np.asarray(logits).argmax(-1)
    return 100.0 * balanced_accuracy_score(np.asarray(y), pred)


def roc_auc(y, logits):
    from sklearn.metrics import roc_auc_score

    return 100.0 * roc_auc_score(
        np.asarray(y), np.asarray(logits)[:, 1], multi_class="ovr"
    )
