"""Profiling subsystem (SURVEY.md §5.1): segment split + device trace."""

import glob
import os

import jax
import jax.numpy as jnp

from fasterseg_tpu.models import create_derived, student_plan
from fasterseg_tpu.utils.profiling import serving_segments, trace


def test_serving_segments_keys_and_consistency():
    plan = student_plan()
    _, variables = create_derived(plan, jax.random.PRNGKey(0),
                                  input_hw=(64, 128), dtype=jnp.float32)
    row = serving_segments(plan, variables, input_hw=(64, 128),
                           dtype=jnp.float32, reps=1)
    for k in ("stem_ms", "body_agg_ms", "upsample_ms", "logits_ms",
              "classmap_ms", "logits_fps", "classmap_fps"):
        assert k in row
    # derived deltas are consistent with the stage timings (each value
    # is independently rounded to 3 decimals -> up to ~2e-3 slack).
    # slope_time_ms clamps negative slopes to 0 — CPU timing noise at
    # the short off-TPU chains can trip that, which voids the identity,
    # so only assert it when no stage was clamped.
    if row["stem_ms"] > 0 and row["logits_ms"] > 0:
        assert abs((row["stem_ms"] + row["body_agg_ms"]
                    + row["upsample_ms"]) - row["logits_ms"]) < 5e-3
    assert row["logits_ms"] >= 0 and row["classmap_ms"] >= 0


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(jnp.dot(jnp.ones((64, 64)),
                                      jnp.ones((64, 64))))
    found = glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*"))
    assert found, "jax.profiler trace produced no profile artifacts"
