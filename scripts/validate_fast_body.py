"""TPU validation of the fully-planar Pallas fast body (VERDICT r4 weak #3).

The lane-pad fix (commit 008abaf) landed AFTER the round-4 self-search
fps stage fell back to the XLA body on the searched genotype, so the
fast body was never re-validated on real hardware against that
genotype. This script runs, on the attached TPU at 1024x2048 bf16, for
each plan in {shipped student [2,1], shipped teacher [2,0], searched
student (evidence/self_search arch_1)}:

  * one fast-body forward vs one fused-stem+XLA-body forward on the
    SAME input — classmap agreement % and logits max-abs-diff (the
    serving contract: the fast path must decide the same classes), and
  * steady-state ms/frame for BOTH paths under BOTH slope harnesses:
    the scoreboard harness (latency.measure.chained_slope_ms — inner
    frames unrolled inside a traced-trip-count fori_loop, the bench.py
    methodology) and the fully-unrolled chains of
    latency.measure.slope_time_ms. The unrolled chains read the Pallas
    fast body ~1.1-1.2x slower (long unrolled Pallas sequences schedule
    slightly worse than the rolled loop) and are far more sensitive to
    host load, so the committed evidence records both and every
    end-to-end serving number in the repo uses the scoreboard harness.

Writes evidence/fast_body/validation.json. This is the gating evidence
for making the fast body the scoreboard serving path (VERDICT r4 #2/#5);
the reference's serving runtime IS its latency story
(tools/utils/darts_utils.py:97-179).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVID = os.path.join(REPO, "evidence", "fast_body")
HW = (1024, 2048)


def searched_student_plan(num_classes: int = 8):
    """The round-4 self-search winner, decoded from committed evidence."""
    import numpy as np
    from fasterseg_tpu.core import ArchParams
    from fasterseg_tpu.core.config import WIDTH_MULT_LIST
    from fasterseg_tpu.core.genotype import decode_network
    from fasterseg_tpu.core.plan import build_plan, select_lasts

    npz = os.path.join(REPO, "evidence", "self_search", "search",
                       "arch_1.npz")
    d = np.load(npz)
    arch = ArchParams.from_npz(npz)
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=False)
    lasts = select_lasts(float(d["mIoU02"]), float(d["latency02"]),
                         float(d["mIoU12"]), float(d["latency12"]))
    return build_plan(genos, list(lasts), Fch=12, num_classes=num_classes,
                      stem_head_width=(8.0 / 12, 8.0 / 12))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--plans", nargs="*",
                    default=["student", "teacher", "searched"])
    args = ap.parse_args()

    from fasterseg_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from fasterseg_tpu.latency.measure import chained_slope_ms, slope_time_ms
    from fasterseg_tpu.models import (create_derived, student_plan,
                                      teacher_plan)
    from fasterseg_tpu.models.infer import InferenceRunner

    plans = {}
    if "student" in args.plans:
        plans["student_shipped"] = student_plan()
    if "teacher" in args.plans:
        plans["teacher_shipped"] = teacher_plan()
    if "searched" in args.plans:
        plans["student_searched"] = searched_student_plan()

    rows = {}
    for name, plan in plans.items():
        print(f"== {name} (lasts={plan.lasts}) ==", flush=True)
        model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                          input_hw=HW, dtype=jnp.bfloat16)
        variables = jax.device_put(variables)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, HW[0], HW[1], 3),
                              jnp.bfloat16)
        fast = InferenceRunner(plan, variables, dtype=jnp.bfloat16)
        slow = InferenceRunner(plan, variables, dtype=jnp.bfloat16,
                               fast_body_enabled=False)
        row = {"lasts": [int(l) for l in plan.lasts]}
        try:
            t0 = time.time()
            yf = fast.logits(variables, x)
            jax.block_until_ready(yf)
            row["fast_compile_s"] = round(time.time() - t0, 1)
            ys = slow.logits(variables, x)
            # serving contract: same classes decided on the same input
            agree = jnp.mean((jnp.argmax(yf, -1) == jnp.argmax(ys, -1))
                             .astype(jnp.float32))
            maxdiff = jnp.max(jnp.abs(yf.astype(jnp.float32)
                                      - ys.astype(jnp.float32)))
            row["classmap_agree_pct"] = round(float(agree) * 100, 4)
            row["logits_max_abs_diff"] = round(float(maxdiff), 4)
            del yf, ys
            ms, _, _ = chained_slope_ms(fast.logits, variables, x)
            row["fast_ms"] = round(ms, 4)
            row["fast_unrolled_ms"] = round(slope_time_ms(
                lambda im, v: fast.logits(v, im), (x, variables),
                n1=2, n2=10), 4)
        except Exception as e:
            row["fast_error"] = repr(e)[:200]
            print(f"  fast body FAILED: {e!r}", flush=True)
        ms, _, _ = chained_slope_ms(slow.logits, variables, x)
        row["xla_body_ms"] = round(ms, 4)
        row["xla_body_unrolled_ms"] = round(slope_time_ms(
            lambda im, v: slow.logits(v, im), (x, variables),
            n1=2, n2=10), 4)
        if "fast_ms" in row:
            row["speedup"] = round(row["xla_body_ms"] / row["fast_ms"], 3)
        rows[name] = row
        print(f"  {row}", flush=True)

    out = {"input_hw": list(HW), "dtype": "bfloat16",
           "backend": jax.default_backend(),
           "harness": {"*_ms": "chained_slope_ms (scoreboard: inner=10 "
                               "frames unrolled in a traced-trip fori_"
                               "loop, median of 5 slopes)",
                       "*_unrolled_ms": "slope_time_ms (fully-unrolled "
                                        "n1=2/n2=10 chains, min of 3)"},
           "plans": rows}
    os.makedirs(EVID, exist_ok=True)
    with open(os.path.join(EVID, "validation.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
