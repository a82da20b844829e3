"""Exact resume: weights, optimizer state (incl. LR-schedule position),
arch params, controller weights, and the data-batch sequence must all
continue bit-identically after a kill+restore (SURVEY.md §5.4 — the
reference never checkpointed optimizer state; we fix that flaw)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from fasterseg_tpu.core.config import (DataConfig, EvalConfig, SearchConfig,
                                       cityscapes_teacher_config)
from fasterseg_tpu.data import SyntheticDataset, get_train_loader

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))


def test_loader_seek_reproduces_batches():
    cfg = dataclasses.replace(
        cityscapes_teacher_config(),
        data=DataConfig(synthetic=True, synthetic_length=6,
                        image_height=32, image_width=64, batch_size=2))
    a = get_train_loader(cfg, None)
    it = iter(a)
    epoch0 = [next(it) for _ in range(3)]
    a.seek(1)
    epoch1 = [next(iter(a)) for _ in range(3)]
    a.close()

    b = get_train_loader(cfg, None)
    b.seek(1)  # "resume" directly at epoch 1
    it = iter(b)
    resumed = [next(it) for _ in range(3)]
    b.close()

    for (x1, y1), (x2, y2) in zip(epoch1, resumed):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    # and epoch 1 differs from epoch 0 (reshuffled + new augmentations)
    assert not np.array_equal(epoch0[0][0], epoch1[0][0])


@pytest.mark.slow
def test_train_resume_bit_exact(tmp_path):
    from fasterseg_tpu.train import run_train

    data = DataConfig(synthetic=True, synthetic_length=4,
                      image_height=64, image_width=128, batch_size=2)
    cfg = dataclasses.replace(cityscapes_teacher_config(), data=data,
                              eval=EvalConfig(eval_height=64, eval_width=128),
                              niters_per_epoch=2)

    unbroken = run_train(cfg, ASSETS, epochs=4, niters=2,
                         save_dir=str(tmp_path / "a"))

    run_train(cfg, ASSETS, epochs=2, niters=2, save_dir=str(tmp_path / "b"))
    resumed = run_train(cfg, ASSETS, epochs=4, niters=2,
                        save_dir=str(tmp_path / "b"), resume=True)

    assert int(resumed.state.step) == int(unbroken.state.step) == 8
    _tree_equal(unbroken.state.params, resumed.state.params)
    _tree_equal(unbroken.state.batch_stats, resumed.state.batch_stats)
    _tree_equal(unbroken.state.opt_state, resumed.state.opt_state)


@pytest.mark.slow
def test_search_resume_bit_exact(tmp_path):
    from fasterseg_tpu.search import run_search

    data = DataConfig(synthetic=True, synthetic_length=8,
                      image_height=64, image_width=128, batch_size=2,
                      gt_down_sampling=8)
    cfg = SearchConfig(data=data,
                       eval=EvalConfig(eval_height=64, eval_width=128),
                       layers=5, Fch=8, pretrain=False,
                       latency_weight=(0.0, 1e-2),
                       fps_min=(0.0, 1e9), fps_max=(0.0, 1e12))
    val = SyntheticDataset(length=2, hw=(64, 128), num_classes=19)

    unbroken = run_search(cfg, val_dataset=val, epochs=2, niters=2,
                          max_eval_items=1, save_dir=str(tmp_path / "a"))

    run_search(cfg, val_dataset=val, epochs=1, niters=2, max_eval_items=1,
               save_dir=str(tmp_path / "b"))
    resumed = run_search(cfg, val_dataset=val, epochs=2, niters=2,
                         max_eval_items=1, save_dir=str(tmp_path / "b"),
                         resume=True)

    _tree_equal(unbroken.state.params, resumed.state.params)
    _tree_equal(unbroken.state.opt_state, resumed.state.opt_state)
    _tree_equal(unbroken.arch_params, resumed.arch_params)
    _tree_equal(unbroken.arch_opt_state, resumed.arch_opt_state)
    assert unbroken.controller.weights == resumed.controller.weights
