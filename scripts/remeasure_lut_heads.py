"""Re-measure physically-implausible LUT entries on an idle TPU.

ADVICE r4: the measure-on-miss head entries captured during the round-4
self-search run are implausible — head_H128_W256_Cin{128,192}_Cout8
measured ~1.5-1.6x SLOWER than the same-shape Cout19 entries despite
fewer output classes, almost certainly because the device was loaded by
the concurrently-running search. They skew the latency objective (and
the derived FPS band) for every 8-class search.

Run on an IDLE attached TPU; re-measures the listed keys with the
standard measure-on-miss provider (latency/measure.py measured_provider,
same protocol as every other measured entry) and rewrites
latency_lut_v5e.json, preserving __fusion_factor__.

  python scripts/remeasure_lut_heads.py [--keys K ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LUT_PATH = os.path.join(REPO, "latency_lut_v5e.json")

SUSPECT_KEYS = [
    "head_H128_W256_Cin128_Cout8",
    "head_H128_W256_Cin192_Cout8",
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--keys", nargs="*", default=SUSPECT_KEYS)
    args = ap.parse_args()

    from fasterseg_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()

    import jax
    assert jax.default_backend() == "tpu", \
        "re-measurement must run on the attached TPU"
    from fasterseg_tpu.latency import LatencyLUT
    from fasterseg_tpu.latency.measure import measured_provider

    lut = LatencyLUT(LUT_PATH)
    provider = measured_provider()
    report = {}
    for key in args.keys:
        old = lut.table.get(key)
        new = provider(key)
        # sanity vs the same-shape 19-class neighbor where one exists:
        # fewer output classes must not be slower
        neighbor = key.rsplit("_Cout", 1)[0] + "_Cout19"
        nb = lut.table.get(neighbor)
        report[key] = {"old_ms": old, "new_ms": round(new, 4),
                       "neighbor": neighbor, "neighbor_ms": nb,
                       "plausible": nb is None or new <= nb * 1.25}
        lut.table[key] = round(new, 4)
        print(key, report[key], flush=True)
    if not all(r["plausible"] for r in report.values()):
        print("WARNING: some re-measurements still exceed their "
              "19-class neighbor by >25% — device may not be idle; "
              "NOT saving", file=sys.stderr)
        sys.exit(1)
    lut.save()
    print(json.dumps({"updated": {k: r["new_ms"]
                                  for k, r in report.items()},
                      "saved_to": LUT_PATH}))


if __name__ == "__main__":
    main()
