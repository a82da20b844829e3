"""CLI: serving-path profile of a decoded network.

The tracing/profiling entry point (SURVEY.md §5.1 — the reference
profiles via thop at build + its TensorRT timer loops,
train_search.py:67-68 / darts_utils.py:96-223). Prints one JSON line:
static FLOPs/params plus the slope-timed per-stage latency split of the
optimized serving path, and optionally writes a TensorBoard/Perfetto
device trace of one forward.

  python -m fasterseg_tpu.cli.profile                  # shipped student
  python -m fasterseg_tpu.cli.profile --teacher --trace /tmp/trace
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default=None,
                   help="arch npz/pt (default: shipped student genotype)")
    p.add_argument("--teacher", action="store_true")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="also write a jax.profiler trace of one forward")
    args = p.parse_args(argv)

    from ..utils.logging import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ..models import create_derived, student_plan, teacher_plan
    from ..models.infer import InferenceRunner
    from ..utils.flops import param_count, plan_flops
    from ..utils.profiling import serving_segments, trace

    hw = (args.height, args.width)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.teacher:
        plan = teacher_plan(arch_npz=args.arch)
    else:
        plan = student_plan(arch_npz=args.arch)
    _, variables = create_derived(plan, jax.random.PRNGKey(0),
                                  input_hw=hw, dtype=dtype)

    row = {
        "network": "teacher" if args.teacher else "student",
        "input_hw": list(hw),
        "gflops": round(plan_flops(plan, hw) / 1e9, 2),
        "mparams": round(param_count(variables["params"]) / 1e6, 3),
    }
    row.update(serving_segments(plan, variables, input_hw=hw, dtype=dtype))

    if args.trace:
        runner = InferenceRunner(plan, variables, dtype=dtype,
                                 fast_stem_enabled=jax.default_backend()
                                 == "tpu")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, *hw, 3), dtype)
        jax.block_until_ready(runner.logits(variables, x))  # compile first
        with trace(args.trace):
            jax.block_until_ready(runner.logits(variables, x))
        row["trace"] = args.trace

    print(json.dumps(row))


if __name__ == "__main__":
    main()
