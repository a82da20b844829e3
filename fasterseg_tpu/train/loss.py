"""Segmentation losses — TPU-native (static shapes, fully jittable).

Equivalents of the reference criteria:
* `ohem_cross_entropy` — ProbOhemCrossEntropy2d (tools/seg_opr/loss_opr.py:43-93):
  keep the hardest pixels, thresholding on the predicted probability of the
  true class. The torch version branches in Python on `num_valid`; here the
  same semantics fall out of one traced program: invalid pixels carry
  true-class prob 1.0, so the k-th smallest statistic and the `<= threshold`
  mask reduce to plain CE when fewer than `min_kept` pixels are valid.
* `kl_distillation` — nn.KLDivLoss()(log_softmax(student), softmax(teacher))
  with torch's elementwise-mean reduction (train/train.py:64,256-260).
* `ohem_ce_topk` — OhemCELoss (search/loss.py:65-81): top-k largest CE values.
* `focal_loss`, `soft_cross_entropy` — search/loss.py:32-63 parity.

All take NHWC logits and integer NHW labels with an ignore value.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, target: jax.Array,
                  ignore_label: int = 255,
                  class_weight: Optional[jax.Array] = None) -> jax.Array:
    """Mean CE over non-ignored pixels (torch CrossEntropyLoss semantics:
    with class weights the mean is weighted by the target's class weight)."""
    valid = target != ignore_label
    t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = class_weight[t] * valid
    else:
        w = valid.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def ohem_cross_entropy(logits: jax.Array, target: jax.Array,
                       ignore_label: int = 255, thresh: float = 0.6,
                       min_kept: int = 256,
                       class_weight: Optional[jax.Array] = None) -> jax.Array:
    """Prob-threshold online hard example mining CE.

    Matches loss_opr.py:63-93: threshold = max(thresh, k-th smallest
    true-class probability among valid pixels); keep pixels with
    p_true <= threshold; mean CE over kept pixels.
    """
    logits = logits.astype(jnp.float32)
    valid = target != ignore_label
    t = jnp.where(valid, target, 0)

    if min_kept > 0 or thresh < 1.0:
        prob = jax.nn.softmax(logits, axis=-1)
        p_true = jnp.take_along_axis(prob, t[..., None], axis=-1)[..., 0]
        p_true = jnp.where(valid, p_true, 1.0)  # masked_fill_(~valid, 1)
        flat = p_true.reshape(-1)
        threshold = jnp.asarray(thresh, jnp.float32)
        if min_kept > 0:
            k = min(min_kept, flat.size)
            kth = jnp.sort(flat)[k - 1]
            threshold = jnp.maximum(kth, threshold)
        kept = p_true <= threshold
        valid = valid & kept
        t = jnp.where(valid, t, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = class_weight[t] * valid
    else:
        w = valid.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


# Cityscapes class weights (loss_opr.py:52-55), exposed for use_weight=True.
CITYSCAPES_CLASS_WEIGHTS = (
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489,
    0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955,
    1.0865, 1.1529, 1.0507)


def kl_distillation(student_logits: jax.Array,
                    teacher_logits: jax.Array) -> jax.Array:
    """torch nn.KLDivLoss() default 'mean': elementwise mean of
    p_t * (log p_t - log p_s) over every element (train/train.py:64)."""
    logp_s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    logp_t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    return jnp.mean(p_t * (logp_t - logp_s))


def ohem_ce_topk(logits: jax.Array, target: jax.Array, n_min: int,
                 thresh: float = 0.7, ignore_label: int = 255) -> jax.Array:
    """OhemCELoss (search/loss.py:65-81): per-pixel CE, keep all pixels with
    loss > -log(thresh); if fewer than n_min qualify keep the top n_min."""
    logits = logits.astype(jnp.float32)
    valid = target != ignore_label
    t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0).reshape(-1)
    loss_thresh = -jnp.log(jnp.asarray(thresh, jnp.float32))
    sorted_desc = -jnp.sort(-nll)
    n_min = min(n_min, nll.size - 1)
    cutoff = jnp.where(sorted_desc[n_min] > loss_thresh,
                       sorted_desc[n_min], loss_thresh)
    kept = nll > cutoff
    # torch keeps loss[loss > thresh] (strict); mean over kept
    return jnp.sum(jnp.where(kept, nll, 0.0)) / jnp.maximum(
        jnp.sum(kept), 1)


def focal_loss(logits: jax.Array, target: jax.Array, gamma: float = 2.0,
               ignore_label: int = 255) -> jax.Array:
    """Multi-class focal loss (search/loss.py:32-50 semantics)."""
    logits = logits.astype(jnp.float32)
    valid = target != ignore_label
    t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(logp_t)
    loss = -((1 - p_t) ** gamma) * logp_t
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def soft_cross_entropy(logits: jax.Array,
                       soft_target: jax.Array) -> jax.Array:
    """SoftCrossEntropyLoss2d (search/loss.py:53-63): -mean over batch of
    sum(target * log_softmax(pred))."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    b = logits.shape[0]
    return -jnp.sum(soft_target * logp) / b
