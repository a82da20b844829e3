"""Confusion-matrix segmentation metrics.

Equivalents of tools/seg_opr/metric.py (hist_info/compute_score) and the
online training metric search/seg_metrics.py (Seg_Metrics /
batch_intersection_union). `confusion_hist` is jittable and designed to be
`psum`-reduced across a device mesh — the TPU-native replacement for the
reference's multiprocess evaluator queue (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_hist(pred: jax.Array, label: jax.Array,
                   num_classes: int, ignore_label: int = 255) -> jax.Array:
    """(n, n) confusion matrix hist[label, pred] over valid pixels
    (metric.py:7-15). jittable; int32 counts."""
    valid = (label >= 0) & (label < num_classes) & (label != ignore_label)
    l = jnp.where(valid, label, 0)
    p = jnp.clip(pred, 0, num_classes - 1)
    idx = (num_classes * l + p).reshape(-1)
    w = valid.reshape(-1).astype(jnp.int32)
    hist = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(w)
    return hist.reshape(num_classes, num_classes)


def hist_stats(pred: jax.Array, label: jax.Array, num_classes: int,
               ignore_label: int = 255):
    """hist, labeled-pixel count, correct-pixel count (metric.py:7-15)."""
    valid = (label >= 0) & (label < num_classes) & (label != ignore_label)
    hist = confusion_hist(pred, label, num_classes, ignore_label)
    labeled = jnp.sum(valid)
    correct = jnp.sum((pred == label) & valid)
    return hist, labeled, correct


def compute_score(hist: np.ndarray, correct: int = None, labeled: int = None):
    """Per-class IoU, mean IoU, freq-weighted IoU, pixel accuracies
    (metric.py:18-26). Host-side numpy on the psum-reduced hist."""
    hist = np.asarray(hist, np.float64)
    diag = np.diag(hist)
    denom = hist.sum(1) + hist.sum(0) - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = diag / denom
    mean_iu = float(np.nanmean(iou))
    freq = hist.sum(1) / max(hist.sum(), 1)
    freq_iu = float((freq[freq > 0] * iou[freq > 0]).sum())
    mean_pixel_acc = (float(correct) / max(float(labeled), 1)
                      if correct is not None else float("nan"))
    return iou, mean_iu, freq_iu, mean_pixel_acc


def batch_intersection_union(logits: jax.Array, target: jax.Array,
                             num_classes: int) -> Tuple[jax.Array, jax.Array]:
    """Per-class intersection and union from logits, ignoring label < 0
    after the reference's -1 shift (seg_metrics.py:53-78: predict/target are
    1-indexed, label 0 = ignore)."""
    pred = jnp.argmax(logits, axis=-1) + 1
    tgt = target.astype(jnp.int32) + 1
    valid = tgt > 0
    pred = pred * valid
    inter = pred * (pred == tgt)

    def hist1(x):
        idx = jnp.clip(x.reshape(-1), 0, num_classes)
        h = jnp.zeros((num_classes + 1,), jnp.int32).at[idx].add(1)
        return h[1:]

    area_inter = hist1(inter)
    area_pred = hist1(pred)
    area_tgt = hist1(tgt)
    area_union = area_pred + area_tgt - area_inter
    return area_inter, area_union


@dataclasses.dataclass
class SegMetrics:
    """Online accumulator mirroring Seg_Metrics (seg_metrics.py:15-51)."""

    num_classes: int = 19

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.total_inter = np.zeros(self.num_classes, np.int64)
        self.total_union = np.zeros(self.num_classes, np.int64)

    def update(self, area_inter, area_union):
        self.total_inter += np.asarray(area_inter, np.int64)
        self.total_union += np.asarray(area_union, np.int64)

    def get_scores(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = 1.0 * self.total_inter / (np.spacing(1) + self.total_union)
        return float(np.nanmean(np.where(self.total_union > 0, iou, np.nan)))
