"""Evaluation metrics, computed without sklearn.

accuracy / balanced_accuracy match sklearn.metrics.accuracy_score /
balanced_accuracy_score (ref main_cls_dgcnn.py:248-249); shape_iou matches
reference utils.py:68-91 (per-shape mean part-IoU over the category's own
part range, empty-union parts count as IoU 1).
"""

from __future__ import annotations

import numpy as np

SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
INDEX_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    return float((y_true == y_pred).mean())


def balanced_accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Mean of per-class recalls over classes present in y_true
    (sklearn balanced_accuracy_score semantics)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    classes = np.unique(y_true)
    recalls = [
        (y_pred[y_true == c] == c).mean() for c in classes
    ]
    return float(np.mean(recalls))


def shape_iou(
    pred: np.ndarray, seg: np.ndarray, label: np.ndarray, class_choice=None
) -> list:
    """Per-shape mean part IoU. ref utils.py:68-91.

    pred/seg: (num_shapes, N) int part labels; label: (num_shapes,) category.
    """
    pred = np.asarray(pred)
    seg = np.asarray(seg)
    label = np.asarray(label).reshape(-1)
    ious = []
    for i in range(seg.shape[0]):
        if not class_choice:
            start = INDEX_START[label[i]]
            parts = range(start, start + SEG_NUM[label[i]])
        else:
            parts = range(SEG_NUM[label[0]])
        part_ious = []
        for part in parts:
            inter = np.sum(np.logical_and(pred[i] == part, seg[i] == part))
            union = np.sum(np.logical_or(pred[i] == part, seg[i] == part))
            part_ious.append(1.0 if union == 0 else inter / union)
        ious.append(float(np.mean(part_ious)))
    return ious
