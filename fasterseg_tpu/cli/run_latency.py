"""CLI: end-to-end latency / FPS of a decoded network.

Equivalent of `python latency/run_latency.py` (latency/run_latency.py:28-82):
decode the genotype, build the inference net, measure real on-device
latency at 1024x2048 (slope method — the TPU replacement for the TensorRT
engine timer, darts_utils.py:97-179) and report the LUT estimate alongside.

  python -m fasterseg_tpu.cli.run_latency --arch tests/assets/arch_1.npz
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default=None,
                   help="arch npz/pt (default: shipped student genotype)")
    p.add_argument("--teacher", action="store_true",
                   help="decode as teacher (ignore_skip, full width)")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--lut", default=None)
    args = p.parse_args(argv)

    from ..utils.logging import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from ..core.config import WIDTH_MULT_LIST
    from ..core.genotype import decode_network
    from ..core.plan import build_plan, select_lasts
    from ..latency import LatencyLUT, TpuCostModel, derived_latency_ms
    from ..latency.measure import chained_slope_ms
    from ..models import create_derived
    from ..train.driver import load_arch_any

    if args.arch is None:
        import os
        args.arch = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(__file__))), "tests", "assets",
            "arch_0.npz" if args.teacher else "arch_1.npz")

    arch, metrics = load_arch_any(args.arch)
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=args.teacher)
    if all(k in metrics for k in ("mIoU02", "latency02", "mIoU12",
                                  "latency12")):
        lasts = select_lasts(metrics["mIoU02"], metrics["latency02"],
                             metrics["mIoU12"], metrics["latency12"])
    else:
        lasts = [2, 1]
    shw = (1.0, 1.0) if args.teacher else (8.0 / 12, 8.0 / 12)
    plan = build_plan(genos, lasts, Fch=12, num_classes=19,
                      stem_head_width=shw)

    lut = LatencyLUT(args.lut, provider=TpuCostModel().provider)
    est_ms = derived_latency_ms(lut, plan, (args.height, args.width))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                      input_hw=(args.height, args.width),
                                      dtype=dtype)
    x = jnp.zeros((1, args.height, args.width, 3), dtype)

    from ..models.infer import InferenceRunner
    runner = InferenceRunner(plan, variables, dtype=dtype)
    serving_path = "fast_body"
    try:
        ms, _, _ = chained_slope_ms(runner.logits, variables, x)
    except Exception as e:
        import sys
        print(f"# fast-body path failed ({e!r}); falling back",
              file=sys.stderr)
        runner = InferenceRunner(plan, variables, dtype=dtype,
                                 fast_body_enabled=False)
        serving_path = "fast_stem_xla_body"
        ms, _, _ = chained_slope_ms(runner.logits, variables, x)
    ms_cm, _, _ = chained_slope_ms(runner.classmap, variables, x)
    print(json.dumps({
        "lasts": lasts,
        "serving_path": serving_path,
        "logits_ms": round(ms, 3),
        "logits_fps": round(1000.0 / ms, 1),
        "classmap_ms": round(ms_cm, 3),
        "classmap_fps": round(1000.0 / ms_cm, 1),
        "lut_estimate_ms": round(est_ms, 3),
        "lut_estimate_fps": round(1000.0 / est_ms, 1),
        "input": f"{args.height}x{args.width}",
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
