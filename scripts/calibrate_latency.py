"""Calibrate the derived-walk latency estimator against measured FPS.

VERDICT r3 weak #1 / next-step #2: the FPS-band controller
(search/architect.py LatencyWeightController, mirroring
train_search.py:204-212) compares the walk's ABSOLUTE estimated FPS
against the band, so the documented "only relative ordering matters"
defense of the per-op LUT sum does not hold there — the uncalibrated
walk over-prices a whole XLA program by ~45% because cross-op fusion
and zero per-op dispatch are invisible to a sum of isolated timings.

This script measures end-to-end serving latency (InferenceRunner.logits
on the default fast-body path, scoreboard slope harness
latency/measure.py chained_slope_ms, 1024x2048 bf16 — the exact path
and methodology bench.py scores) for the four shipped decoded plans
(teacher/student x lasts [2,0]/[2,1]), fits the scalar
fusion-correction factor minimizing max relative error, and

  * writes the full table to evidence/latency_calib/calibration.json
    (committed — tests/test_latency_calibration.py pins walk-vs-measured
    within 10% from the checkout alone), and
  * with --apply, stores the factor into latency_lut_v5e.json under the
    reserved __fusion_factor__ key that derived_latency_ms applies.

Run on the attached TPU:  python scripts/calibrate_latency.py --apply
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LUT_PATH = os.path.join(REPO, "latency_lut_v5e.json")
EVID = os.path.join(REPO, "evidence", "latency_calib")
HW = (1024, 2048)


def shipped_plans():
    """teacher/student x lasts [2,0]/[2,1] from the shipped genotypes."""
    from fasterseg_tpu.core import ArchParams
    from fasterseg_tpu.core.config import WIDTH_MULT_LIST
    from fasterseg_tpu.core.genotype import decode_network
    from fasterseg_tpu.core.plan import build_plan

    assets = os.path.join(REPO, "tests", "assets")
    plans = {}
    for name, npz, ignore_skip, shw in (
            ("teacher", "arch_0.npz", True, (1.0, 1.0)),
            ("student", "arch_1.npz", False, (8.0 / 12, 8.0 / 12))):
        arch = ArchParams.from_npz(os.path.join(assets, npz))
        genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                               ignore_skip=ignore_skip)
        for lasts in ([2, 0], [2, 1]):
            plans[f"{name}_{lasts[0]}{lasts[1]}"] = build_plan(
                genos, lasts, Fch=12, num_classes=19, stem_head_width=shw)
    return plans


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--apply", action="store_true",
                    help="store the fitted factor into latency_lut_v5e.json")
    ap.add_argument("--refit", action="store_true",
                    help="refit the factors from the already-measured rows "
                         "in evidence/latency_calib/calibration.json "
                         "(no device needed)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from fasterseg_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from fasterseg_tpu.latency import (LatencyLUT, TpuCostModel,
                                       derived_latency_ms)
    from fasterseg_tpu.latency.derived import tpu_fps_band
    from fasterseg_tpu.latency.measure import chained_slope_ms
    from fasterseg_tpu.models import create_derived, student_plan
    from fasterseg_tpu.models.infer import InferenceRunner

    lut = LatencyLUT(LUT_PATH, provider=TpuCostModel().provider)
    rows = {}
    if args.refit:
        rows = json.load(open(os.path.join(EVID, "calibration.json")))[
            "plans"]
    else:
        for name, plan in shipped_plans().items():
            walk = derived_latency_ms(lut, plan, HW, calibrate=False)
            model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                              input_hw=HW,
                                              dtype=jnp.bfloat16)
            runner = InferenceRunner(plan, variables, dtype=jnp.bfloat16)
            x = jnp.zeros((1, HW[0], HW[1], 3), jnp.bfloat16)
            ms, _, _ = chained_slope_ms(runner.logits, variables, x,
                                        reps=args.reps)
            rows[name] = {"walk_ms": round(walk, 4),
                          "measured_ms": round(ms, 4),
                          "ratio": round(ms / walk, 4)}
            print(name, rows[name], flush=True)

    # Per-WIDTH-FAMILY factor (teacher stem/head width 1.0 vs student
    # 8/12): measured ratios split cleanly by family (~0.60 teacher vs
    # ~0.37 student) because the fusion gain over the per-op sum tracks
    # network width — a single scalar cannot sit within 10% of both.
    # Within each family: geometric midrange (minimizes max rel error).
    import math

    widths = {name: plan.stem_head_width[0]
              for name, plan in shipped_plans().items()}
    by_width = {}
    for name, r in rows.items():
        by_width.setdefault(round(widths[name], 4), []).append(r["ratio"])
    factors = {
        w: round(math.exp((math.log(min(rs)) + math.log(max(rs))) / 2), 4)
        for w, rs in by_width.items()}
    max_err = max(abs(r / factors[round(widths[n], 4)] - 1.0)
                  for n, row in rows.items() for r in [row["ratio"]])
    # scalar default = student-family factor: the FPS-band controller
    # (the only consumer of ABSOLUTE estimated fps) binds the student
    student_w = round(8.0 / 12, 4)
    factor = factors.get(student_w, list(factors.values())[0])
    out = {
        "input_hw": list(HW),
        "dtype": "bfloat16",
        "measured_path": "InferenceRunner.logits (fast body default), "
                         "chained_slope_ms scoreboard harness "
                         "(inner=10, m1=1, m2=10)",
        "plans": rows,
        "plan_widths": {n: round(w, 4) for n, w in widths.items()},
        "fusion_factor": factor,
        "fusion_factor_by_width": factors,
        "max_rel_err_pct": round(max_err * 100, 2),
        "backend": ("tpu (rows measured on-device; factors refit "
                    "host-side)" if args.refit else jax.default_backend()),
    }
    os.makedirs(EVID, exist_ok=True)
    with open(os.path.join(EVID, "calibration.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"fusion_factor": out["fusion_factor"],
                      "max_rel_err_pct": out["max_rel_err_pct"]}))

    if args.apply:
        lut.fusion_factor = out["fusion_factor"]
        lut.fusion_factors = {float(w): f for w, f in factors.items()}
        lut.save()
        # with the factor applied, report the TPU-derived band around the
        # shipped student operating point (reference relative semantics)
        band = tpu_fps_band(lut, student_plan())
        print(json.dumps({"applied_to": LUT_PATH,
                          "tpu_fps_band": [round(band[0], 1),
                                           round(band[1], 1)]}))


if __name__ == "__main__":
    main()
