"""Calibrated walk vs measured end-to-end latency (VERDICT r3 #2).

The committed evidence/latency_calib/calibration.json stores slope-
measured serving latencies of the four shipped decoded plans
(teacher/student x lasts [2,0]/[2,1], 1024x2048 bf16) from
scripts/calibrate_latency.py. These tests re-run the pure host-side walk
from the checkout and pin calibrated-walk vs measured within 10% — the
accuracy the FPS-band controller (architect.py LatencyWeightController,
mirroring train_search.py:204-212) needs from an ABSOLUTE estimate.
"""

import json
import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CALIB = os.path.join(REPO, "evidence", "latency_calib", "calibration.json")
LUT_PATH = os.path.join(REPO, "latency_lut_v5e.json")


def _plans():
    from scripts.calibrate_latency import shipped_plans
    return shipped_plans()


calib_missing = pytest.mark.skipif(
    not os.path.exists(CALIB),
    reason="calibration evidence not yet measured on the TPU")


@calib_missing
def test_calibrated_walk_within_10pct_of_measured():
    from fasterseg_tpu.latency import LatencyLUT, derived_latency_ms

    calib = json.load(open(CALIB))
    lut = LatencyLUT(LUT_PATH)
    assert lut.fusion_factor == pytest.approx(calib["fusion_factor"],
                                              abs=1e-4), \
        "latency_lut_v5e.json factor out of sync with calibration evidence"
    # per-width-family factors (teacher 1.0 vs student 8/12: the fusion
    # gain tracks network width; see calibrate_latency.py)
    for w, f in calib.get("fusion_factor_by_width", {}).items():
        assert lut.factor_for(float(w)) == pytest.approx(f, abs=1e-4)
    plans = _plans()
    for name, row in calib["plans"].items():
        est = derived_latency_ms(lut, plans[name], tuple(calib["input_hw"]))
        # walk reproducibility: raw walk must match the recorded walk
        raw = derived_latency_ms(lut, plans[name],
                                 tuple(calib["input_hw"]), calibrate=False)
        assert raw == pytest.approx(row["walk_ms"], rel=1e-3)
        err = abs(est / row["measured_ms"] - 1.0)
        assert err < 0.10, (name, est, row["measured_ms"])


def test_fusion_factor_roundtrip(tmp_path):
    from fasterseg_tpu.latency import LatencyLUT

    p = tmp_path / "lut.json"
    lut = LatencyLUT(str(p))
    lut.table = {"ConvNorm_H8_W8_Cin3_Cout8_kernel3_stride1": 0.5}
    lut.fusion_factor = 0.7
    lut.fusion_factors = {1.0: 0.6, 0.6667: 0.37}
    lut.save()
    back = LatencyLUT(str(p))
    assert back.fusion_factor == 0.7
    # the reserved keys are metadata, not entries
    assert "__fusion_factor__" not in back.table
    assert "__fusion_factor_by_width__" not in back.table
    assert back.get("ConvNorm_H8_W8_Cin3_Cout8_kernel3_stride1") == 0.5
    # nearest width-family match; scalar fallback without families
    assert back.factor_for(1.0) == 0.6
    assert back.factor_for(8.0 / 12) == 0.37  # 0.6667 nearest
    assert back.factor_for(0.9) == 0.6
    back.fusion_factors = {}
    assert back.factor_for(1.0) == 0.7


def test_calibrate_flag_and_band_semantics(tmp_path):
    """calibrate=False returns the raw per-op sum; the TPU band keeps the
    reference's relative semantics around the operating point, so the
    band scales exactly with the estimator — controller pressure at the
    shipped student is invariant to estimator bias."""
    from fasterseg_tpu.latency import LatencyLUT, derived_latency_ms
    from fasterseg_tpu.latency.derived import REF_BAND_REL, tpu_fps_band
    from fasterseg_tpu.models import student_plan

    plan = student_plan()
    lut = LatencyLUT(LUT_PATH)
    raw = derived_latency_ms(lut, plan, calibrate=False)
    cal = derived_latency_ms(lut, plan)
    assert cal == pytest.approx(raw * lut.factor_for(plan.stem_head_width[0]),
                                rel=1e-9)
    lo, hi = tpu_fps_band(lut, plan)
    fps = 1000.0 / cal
    assert lo == pytest.approx(REF_BAND_REL[0] * fps)
    assert hi == pytest.approx(REF_BAND_REL[1] * fps)
    assert lo < fps < hi  # shipped operating point sits inside its band
    # reference anchors: band [155,175] around 159.7 FPS
    # (config_search.py:85-86, arch_0.pt latency02=6.26 ms)
    assert REF_BAND_REL[0] == pytest.approx(155.0 / 159.7)
    assert REF_BAND_REL[1] == pytest.approx(175.0 / 159.7)
