"""Metrics: multilabel F1 (weighted/macro/samples) and top-1 accuracy.

The reference computes per-epoch F1 on the host with sklearn over the full
concatenated prediction/label arrays (train_searchable/mmimdb.py:121-125) —
which forces a device->host copy per batch. Here the sufficient statistics
(per-class TP/FP/FN and, for samples-F1, per-batch sums) are accumulated
ON DEVICE inside the jitted step; only the tiny (num_classes,) count vectors
cross to the host once per epoch. F1 formulas match sklearn with
``zero_division=1`` (the reference's setting).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# On-device accumulation
# ---------------------------------------------------------------------------

def multilabel_counts(preds: jnp.ndarray, labels: jnp.ndarray,
                      mask: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    """Per-class TP/FP/FN + per-sample sums for one batch.

    preds/labels: (B, C) {0,1}; mask: optional (B,) row validity (padded rows
    of a static-shape final batch contribute nothing). Returns float32
    vectors; accumulate by summation across batches.
    """
    preds = preds.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones((preds.shape[0],), jnp.float32)
    m = mask[:, None]
    tp = jnp.sum(preds * labels * m, axis=0)
    fp = jnp.sum(preds * (1.0 - labels) * m, axis=0)
    fn = jnp.sum((1.0 - preds) * labels * m, axis=0)
    # samples-average F1 needs per-sample f1 averaged over samples.
    tp_s = jnp.sum(preds * labels, axis=1)
    denom_s = jnp.sum(preds, axis=1) + jnp.sum(labels, axis=1)
    f1_s = jnp.where(denom_s > 0, 2.0 * tp_s / jnp.maximum(denom_s, 1.0), 1.0)
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "samples_f1_sum": jnp.sum(f1_s * mask),
        "count": jnp.sum(mask),
    }


def zero_multilabel_counts(num_classes: int) -> Dict[str, jnp.ndarray]:
    z = jnp.zeros((num_classes,), jnp.float32)
    return {"tp": z, "fp": z, "fn": z,
            "samples_f1_sum": jnp.asarray(0.0, jnp.float32),
            "count": jnp.asarray(0.0, jnp.float32)}


def add_counts(a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]):
    return {k: a[k] + b[k] for k in a}


# ---------------------------------------------------------------------------
# Host-side finalization (sklearn-compatible, zero_division configurable)
# ---------------------------------------------------------------------------

def f1_from_counts(counts: Dict[str, np.ndarray], average: str = "weighted",
                   zero_division: float = 1.0) -> float:
    tp = np.asarray(counts["tp"], np.float64)
    fp = np.asarray(counts["fp"], np.float64)
    fn = np.asarray(counts["fn"], np.float64)
    denom = 2 * tp + fp + fn
    f1 = np.where(denom > 0, 2 * tp / np.maximum(denom, 1.0), zero_division)
    if average == "macro":
        return float(f1.mean())
    if average == "weighted":
        support = tp + fn
        total = support.sum()
        if total == 0:
            return float(zero_division)
        return float((f1 * support).sum() / total)
    if average == "samples":
        cnt = float(counts["count"])
        return float(counts["samples_f1_sum"]) / max(cnt, 1.0)
    raise ValueError(f"unknown average {average!r}")


def f1_score_np(y_true: np.ndarray, y_pred: np.ndarray, average: str = "weighted",
                zero_division: float = 1.0) -> float:
    """Direct (non-accumulated) computation for host-side use/tests."""
    y_true = np.asarray(y_true, np.float64)
    y_pred = np.asarray(y_pred, np.float64)
    if average == "samples":
        tp_s = (y_pred * y_true).sum(axis=1)
        denom = y_pred.sum(axis=1) + y_true.sum(axis=1)
        f1 = np.where(denom > 0, 2 * tp_s / np.maximum(denom, 1.0), zero_division)
        return float(f1.mean())
    tp = (y_pred * y_true).sum(axis=0)
    fp = (y_pred * (1 - y_true)).sum(axis=0)
    fn = ((1 - y_pred) * y_true).sum(axis=0)
    return f1_from_counts({"tp": tp, "fp": fp, "fn": fn}, average, zero_division)


# ---------------------------------------------------------------------------
# Classification accuracy (NTU / Ego tasks)
# ---------------------------------------------------------------------------

def accuracy_counts(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    preds = jnp.argmax(logits, axis=-1)
    if mask is None:
        mask = jnp.ones((logits.shape[0],), jnp.float32)
    return {
        "correct": jnp.sum((preds == labels).astype(jnp.float32) * mask),
        "count": jnp.sum(mask),
    }


def zero_accuracy_counts() -> Dict[str, jnp.ndarray]:
    return {"correct": jnp.asarray(0.0, jnp.float32),
            "count": jnp.asarray(0.0, jnp.float32)}


def topk_accuracy(logits: np.ndarray, labels: np.ndarray,
                  topk=(1,)) -> list:
    """Top-k accuracies in percent (darts/utils.py:23-35 semantics)."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    order = np.argsort(-logits, axis=-1)
    res = []
    for k in topk:
        correct = (order[:, :k] == labels[:, None]).any(axis=1)
        res.append(100.0 * correct.mean())
    return res


class AvgrageMeter:
    """Running average (darts/utils.py:9-21)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.cnt = 0

    def update(self, val, n=1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / self.cnt


def count_parameters(params) -> int:
    """Total number of scalars in a params pytree (darts/utils.py:77-81)."""
    import jax
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
