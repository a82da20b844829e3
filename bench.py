"""Headline benchmark: FasterSeg student inference FPS at 1024x2048.

Measures the decoded student network (shipped genotype, lasts=[2,1]) in
eval mode — image in, full-resolution class logits out — batch 1, bf16
compute, with the fused Pallas stem (models/infer.py). Baseline: 163.9 FPS
on GTX 1080Ti + TensorRT 5.1.5 (BASELINE.md).

Methodology: the remote-attached TPU ("axon" tunnel) has ~30 ms host
round-trip latency and `block_until_ready` does not fence device work, so
per-dispatch timing is meaningless. We time unrolled on-device chains of
N1 and N2 forwards (a full-reduction carry defeats CSE/DCE) with a host
fetch at the end, and take the slope — pure steady-state device time per
frame.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from fasterseg_tpu.models import create_derived, student_plan
from fasterseg_tpu.models.infer import InferenceRunner

BASELINE_FPS = 163.9
H, W = 1024, 2048


def chained(runner, variables, n):
    def fn(x):
        c = jnp.float32(0.0)
        for _ in range(n):
            out = runner(variables, x + c.astype(x.dtype))
            # FULL reduction so no part of the forward can be DCE'd
            c = jnp.mean(out.astype(jnp.float32)) * 1e-9
        return c
    return jax.jit(fn)


def timed(fn, x, reps=4):
    float(fn(x))  # compile + warm; host fetch fences the device queue
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    plan = student_plan()
    model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                      input_hw=(H, W), dtype=jnp.bfloat16)
    variables = jax.device_put(variables)
    runner = InferenceRunner(plan, variables, dtype=jnp.bfloat16)

    def forward(v, x):
        return runner.logits(v, x)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)

    n1, n2 = 2, 10
    t1 = timed(chained(forward, variables, n1), x)
    t2 = timed(chained(forward, variables, n2), x)
    ms = (t2 - t1) / (n2 - n1) * 1e3
    fps = 1e3 / ms
    print(json.dumps({
        "metric": "student_inference_fps_1024x2048_b1",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
