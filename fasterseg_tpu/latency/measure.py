"""On-device latency measurement harness.

TPU-native replacement for the reference's TensorRT / synchronized-CUDA
timers (tools/utils/darts_utils.py:96-223): jit-compile the function, warm
up past compilation, then time steady-state dispatch with
`block_until_ready` fencing. Iteration count auto-calibrates to a minimum
wall-clock budget, like the reference's do_inference loop
(darts_utils.py:138-162).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax


def time_jitted(fn: Callable, args: Sequence, warmup: int = 10,
                min_seconds: float = 0.5, max_iters: int = 100_000) -> float:
    """Return steady-state milliseconds per call of an already-jitted fn.

    Dispatches back-to-back without per-iteration host sync (the device
    queue pipelines), fencing only at the end — the honest way to measure
    sub-ms kernels on TPU where per-call host sync would dominate.
    """
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    jax.block_until_ready(out)

    # calibrate: run batches until the budget is met
    iters_done = 0
    start = time.perf_counter()
    batch = 10
    while True:
        for _ in range(batch):
            out = fn(*args)
        jax.block_until_ready(out)
        iters_done += batch
        elapsed = time.perf_counter() - start
        if elapsed >= min_seconds or iters_done >= max_iters:
            return elapsed / iters_done * 1e3
        # grow batch so the next round roughly completes the budget
        remaining = min_seconds - elapsed
        per_iter = elapsed / iters_done
        batch = max(10, min(int(remaining / per_iter) + 1,
                            max_iters - iters_done))


def measure_apply_ms(fn: Callable, *args, warmup: int = 10,
                     min_seconds: float = 0.5) -> float:
    """jit + measure a python callable on the default device."""
    jfn = jax.jit(fn)
    return time_jitted(jfn, args, warmup=warmup, min_seconds=min_seconds)


def slope_time_ms(fn: Callable, args: Sequence, n1: int = 4, n2: int = 16,
                  reps: int = 3) -> float:
    """Steady-state ms per call via the slope method: time unrolled
    on-device chains of n1 and n2 calls (a scalar carry defeats CSE) with a
    host fetch at the end, and divide the difference.

    This is the only honest timing on remote-attached devices where the
    host round trip (~30 ms here) dwarfs the work and block_until_ready
    does not fence device execution.
    """
    import jax.numpy as jnp

    def chained(n):
        def run(*args):
            c = jnp.float32(0.0)
            first = args[0]
            rest = args[1:]
            for _ in range(n):
                out = fn(first + c.astype(first.dtype), *rest)
                out0 = jax.tree.leaves(out)[0]
                # FULL reduction: consuming only a slice would let XLA
                # dead-code-eliminate most of the computation
                c = jnp.mean(out0.astype(jnp.float32)) * 1e-9
            return c
        return jax.jit(run)

    def timed(jfn):
        float(jfn(*args))  # compile + warm + fence
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(chained(n1))
    t2 = timed(chained(n2))
    return max((t2 - t1) / (n2 - n1) * 1e3, 0.0)
