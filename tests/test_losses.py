"""Loss golden tests vs the reference ProbOhemCrossEntropy2d / KLDivLoss,
and metric sanity checks."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.train.loss import (
    ohem_cross_entropy,
    kl_distillation,
    cross_entropy,
    soft_cross_entropy,
)
from fasterseg_tpu.eval.metrics import (
    confusion_hist,
    hist_stats,
    compute_score,
    batch_intersection_union,
    SegMetrics,
)


@pytest.fixture(scope="module")
def golden(assets_dir):
    return np.load(os.path.join(assets_dir, "golden_losses.npz"))


@pytest.mark.parametrize("case", [0, 1, 2, 3])
def test_ohem_matches_reference(golden, case):
    pred = jnp.asarray(golden[f"case{case}/pred"])
    tgt = jnp.asarray(golden[f"case{case}/target"])
    min_kept = int(golden[f"case{case}/min_kept"])
    got = float(ohem_cross_entropy(pred, tgt, ignore_label=255, thresh=0.6,
                                   min_kept=min_kept))
    want = float(golden[f"case{case}/loss"])
    assert got == pytest.approx(want, rel=1e-5), (got, want)


def test_kl_matches_torch(golden):
    got = float(kl_distillation(jnp.asarray(golden["kl/student"]),
                                jnp.asarray(golden["kl/teacher"])))
    assert got == pytest.approx(float(golden["kl/loss"]), rel=1e-5)


def test_cross_entropy_ignores(rng):
    logits = jnp.asarray(rng.standard_normal((2, 4, 4, 3), dtype=np.float32))
    tgt = np.zeros((2, 4, 4), np.int32)
    tgt[1] = 255  # ignored
    l_all = cross_entropy(logits, jnp.asarray(tgt))
    l_first = cross_entropy(logits[:1], jnp.asarray(tgt[:1]))
    assert float(l_all) == pytest.approx(float(l_first), rel=1e-6)


def test_soft_ce_matches_hard_ce_onehot(rng):
    logits = jnp.asarray(rng.standard_normal((2, 4, 4, 5), dtype=np.float32))
    tgt = rng.integers(0, 5, (2, 4, 4)).astype(np.int32)
    onehot = np.eye(5, dtype=np.float32)[tgt]
    soft = float(soft_cross_entropy(logits, jnp.asarray(onehot)))
    hard = float(cross_entropy(logits, jnp.asarray(tgt)))
    # soft CE sums over pixels / batch; hard CE means over pixels
    assert soft == pytest.approx(hard * 16, rel=1e-5)


def test_confusion_hist_perfect():
    label = np.array([[0, 1], [2, 255]], np.int32)[None]
    hist, labeled, correct = hist_stats(jnp.asarray(label), jnp.asarray(label), 3)
    assert int(labeled) == 3 and int(correct) == 3
    iou, miou, _, acc = compute_score(np.asarray(hist), int(correct), int(labeled))
    assert miou == pytest.approx(1.0) and acc == pytest.approx(1.0)


def test_confusion_hist_counts():
    label = np.array([[0, 0, 1, 1]], np.int32)
    pred = np.array([[0, 1, 1, 1]], np.int32)
    hist = np.asarray(confusion_hist(jnp.asarray(pred), jnp.asarray(label), 2))
    assert hist[0, 0] == 1 and hist[0, 1] == 1 and hist[1, 1] == 2
    iou, miou, _, _ = compute_score(hist)
    assert iou[0] == pytest.approx(1 / 2)  # inter 1, union 2
    assert iou[1] == pytest.approx(2 / 3)


def test_online_metric(rng):
    m = SegMetrics(num_classes=3)
    logits = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    tgt = rng.integers(-1, 3, (2, 8, 8)).astype(np.int32)
    inter, union = batch_intersection_union(jnp.asarray(logits),
                                            jnp.asarray(tgt), 3)
    m.update(np.asarray(inter), np.asarray(union))
    assert 0.0 <= m.get_scores() <= 1.0
    # perfect prediction -> mIoU 1
    m.reset()
    onehot = np.eye(3, dtype=np.float32)[np.clip(tgt, 0, 2)] * 10
    inter, union = batch_intersection_union(jnp.asarray(onehot),
                                            jnp.asarray(tgt), 3)
    m.update(np.asarray(inter), np.asarray(union))
    assert m.get_scores() == pytest.approx(1.0)
