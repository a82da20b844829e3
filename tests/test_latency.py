"""Latency subsystem golden tests.

The one end-to-end oracle available for the derived-network latency walk:
the reference ships both its measured LUT (latency_lookup_table.npy) and
the search-time latency estimates of the shipped genotypes
(train/fasterseg/arch_0.pt keys latency02=6.2605 / latency12=6.4140 ms,
computed by Network_Multi_Path_Infer.forward_latency,
train/model_seg.py:360-408). Decoding the shipped student genotype and
walking derived_latency_ms over the imported reference LUT must reproduce
those numbers.
"""

import json
import os

import numpy as np
import pytest

from fasterseg_tpu.core.genotype import ArchParams, decode_network
from fasterseg_tpu.core.plan import build_plan
from fasterseg_tpu.latency.derived import derived_latency_ms
from fasterseg_tpu.latency.lut import (LatencyLUT, OP_LUT_NAMES,
                                       OP_TRUE_NAMES, op_key)

WIDTH_MULT_LIST = (4 / 12, 6 / 12, 8 / 12, 10 / 12, 1.0)


@pytest.fixture(scope="module")
def reference_lut(assets_dir):
    lut = LatencyLUT(alias_op4=True)  # reference-import semantics
    with open(os.path.join(assets_dir, "reference_lut.json")) as f:
        lut.table = json.load(f)
    return lut


def test_reference_lut_asset_complete(reference_lut):
    assert len(reference_lut.table) == 667  # latency_lookup_table.py sweep


def test_derived_latency_walk_matches_reference(assets_dir, reference_lut):
    """Golden: student genotype walk == stored latency02/latency12."""
    meta = np.load(os.path.join(assets_dir, "arch_1.npz"), allow_pickle=True)
    ap = ArchParams.from_npz(os.path.join(assets_dir, "arch_1.npz"))
    genos = decode_network(ap, WIDTH_MULT_LIST, 16, ignore_skip=False)
    for lasts, key in (([2, 0], "latency02"), ([2, 1], "latency12")):
        plan = build_plan(genos, lasts, Fch=12, num_classes=19,
                          stem_head_width=(8 / 12, 8 / 12))
        ms = derived_latency_ms(reference_lut, plan, (1024, 2048))
        assert ms == pytest.approx(float(meta[key]), rel=1e-6), (lasts, ms)


def test_teacher_walk_covered_by_reference_lut(assets_dir, reference_lut):
    """The teacher genotype's walk must also resolve every key (no
    measure-on-miss provider is attached here, so a miss raises)."""
    ap = ArchParams.from_npz(os.path.join(assets_dir, "arch_0.npz"))
    genos = decode_network(ap, WIDTH_MULT_LIST, 16, ignore_skip=True)
    for lasts in ([2, 0], [2, 1]):
        plan = build_plan(genos, lasts, Fch=12, num_classes=19,
                          stem_head_width=(1.0, 1.0))
        ms = derived_latency_ms(reference_lut, plan, (1024, 2048))
        assert 10.0 < ms < 40.0  # full-width teacher, sanity band


def test_true_key_priced_differently_without_alias(assets_dir,
                                                   reference_lut):
    """Without reference-import mode, op 4 resolves to its true-name
    entries (present in the reference npy but never read by the reference
    lookup) — the walk must come out different (smaller here: downup_2x is
    genuinely cheaper than 2x), proving the quirk is import-only."""
    lut_true = LatencyLUT()
    lut_true.table = reference_lut.table
    ap = ArchParams.from_npz(os.path.join(assets_dir, "arch_1.npz"))
    genos = decode_network(ap, WIDTH_MULT_LIST, 16, ignore_skip=False)
    plan = build_plan(genos, [2, 0], Fch=12, num_classes=19,
                      stem_head_width=(8 / 12, 8 / 12))
    aliased = derived_latency_ms(reference_lut, plan, (1024, 2048))
    true = derived_latency_ms(lut_true, plan, (1024, 2048))
    assert true < aliased


def test_op_key_downup_2x_alias_is_import_only():
    """op 4 (BasicResidual_downup_2x) aliases to the 2x key only for
    reference-LUT compatibility; the measured-sweep path must use the true
    key so the op gets its own TPU timing (VERDICT weak #2)."""
    assert OP_LUT_NAMES[4] == "BasicResidual2x"
    assert OP_TRUE_NAMES[4] == "BasicResidual_downup_2x"
    assert "BasicResidual2x" in op_key(4, 128, 256, 96, 96, 1)
    assert "BasicResidual_downup_2x" in op_key(4, 128, 256, 96, 96, 1,
                                               true_name=True)


def test_chained_slope_ms_executes_and_carries():
    """The scoreboard slope harness (chained_slope_ms): one compiled
    program (traced trip count) serves both chain lengths, the additive
    carry forces every frame to execute, and the returned (median,
    spread, kind) are well-formed. Functional check on CPU — the ms
    value itself is only meaningful on the TPU."""
    import jax.numpy as jnp

    from fasterseg_tpu.latency.measure import chained_slope_ms

    calls = []

    def fn(variables, x):
        calls.append(1)
        return x * variables["w"] + 1.0

    variables = {"w": jnp.float32(2.0)}
    x = jnp.ones((4, 4), jnp.float32)
    ms, spread, kind = chained_slope_ms(fn, variables, x, m1=1, m2=3,
                                        inner=2, reps=3)
    # ONE program for both trip counts (traced trip count): fn appears
    # in exactly one trace, unrolled `inner` times
    assert len(calls) == 2
    import math
    # on CPU with ~ns of work the slope is noise; only well-formedness
    # is asserted here (sign/magnitude are TPU-meaningful)
    assert math.isfinite(ms) and math.isfinite(spread)
    assert kind == "raw_minmax"
    _, _, kind7 = chained_slope_ms(fn, variables, x, m1=1, m2=2,
                                   inner=1, reps=7)
    assert kind7 == "trimmed"
