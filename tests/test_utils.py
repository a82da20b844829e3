"""Utility tests: partial-match loading, plots, overlays, FLOPs."""

import numpy as np
import pytest

from fasterseg_tpu.models import student_plan
from fasterseg_tpu.utils import (
    partial_load,
    plot_op,
    plot_path_width,
    print_iou,
    show_prediction,
    param_count,
    plan_flops,
)


def test_partial_load_matching_and_warnings(caplog):
    target = {"a": {"w": np.zeros((2, 2)), "b": np.zeros(3)},
              "c": np.zeros(4)}
    loaded = {"a": {"w": np.ones((2, 2)), "b": np.ones(5)},  # b mismatched
              "d": np.ones(1)}                                # unexpected
    merged = partial_load(target, loaded)
    np.testing.assert_array_equal(merged["a"]["w"], 1)   # loaded
    np.testing.assert_array_equal(merged["a"]["b"], 0)   # shape mismatch
    np.testing.assert_array_equal(merged["c"], 0)        # missing


def test_plan_flops_student_matches_paper():
    # paper/thop report ~28.2 GMACs for the student at 1024x2048
    macs = plan_flops(student_plan()) / 2
    assert 26e9 < macs < 30e9, macs


def test_param_count():
    assert param_count({"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}) == 10


def test_plots_render():
    plan = student_plan()
    g = plan.genotypes[0]
    fig = plot_op(g.ops, g.path, g.widths, head_width=8 / 12, F_base=12)
    assert fig is not None
    fig2 = plot_path_width(plan.lasts, [g.path for g in plan.genotypes],
                           [g.widths for g in plan.genotypes])
    assert fig2 is not None


def test_show_prediction_and_print_iou():
    img = np.zeros((8, 8, 3), np.uint8)
    pred = np.zeros((8, 8), np.int64)
    pred[4:] = 1
    out = show_prediction(img, pred, [(255, 0, 0), (0, 255, 0)])
    assert out.shape == (8, 8, 3)
    assert (out[4:] != out[:4]).any()
    report = print_iou(np.array([0.5, 0.75]), 0.9, ["road", "car"])
    assert "road" in report and "62.500%" in report
