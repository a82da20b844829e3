"""Golden + property tests for genotype decode and network planning.

Golden data (tests/assets/golden_decode.json) was produced by running the
reference decode (train/model_seg.py) on the shipped arch_{0,1}.pt
artifacts; these tests pin our pure-numpy decoder to it bit-for-bit.
"""

import numpy as np
import pytest

from fasterseg_tpu.core import (
    WIDTH_MULT_LIST,
    decode_network,
    build_plan,
    path_to_downs,
    downs_to_path,
)
from fasterseg_tpu.core.plan import select_lasts


@pytest.mark.parametrize("arch_idx,ignore_skip,shw", [
    (0, True, (1.0, 1.0)),
    (1, False, (8.0 / 12, 8.0 / 12)),
])
def test_decode_matches_reference(arch_params, golden_decode, arch_idx,
                                  ignore_skip, shw):
    arch = arch_params[arch_idx]
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=ignore_skip)
    gold = golden_decode[f"arch_{arch_idx}"]
    for last in (0, 1, 2):
        g = genos[last]
        ref = gold[f"last{last}"]
        assert list(g.ops) == ref["ops"], f"ops mismatch last={last}"
        assert list(g.path) == ref["path"]
        assert list(g.downs) == ref["downs"]
        np.testing.assert_allclose(list(g.widths), ref["widths"], rtol=1e-9)


@pytest.mark.parametrize("arch_idx,ignore_skip,shw", [
    (0, True, (1.0, 1.0)),
    (1, False, (8.0 / 12, 8.0 / 12)),
])
def test_plan_matches_reference(arch_params, golden_decode, arch_idx,
                                ignore_skip, shw):
    arch = arch_params[arch_idx]
    gold = golden_decode[f"arch_{arch_idx}"]
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=ignore_skip)
    lasts = select_lasts(float(np.load(f"tests/assets/arch_{arch_idx}.npz")["mIoU02"]),
                         float(np.load(f"tests/assets/arch_{arch_idx}.npz")["latency02"]),
                         float(np.load(f"tests/assets/arch_{arch_idx}.npz")["mIoU12"]),
                         float(np.load(f"tests/assets/arch_{arch_idx}.npz")["latency12"]))
    assert lasts == gold["lasts"]
    plan = build_plan(genos, lasts, Fch=12, num_classes=19,
                      stem_head_width=shw)

    # branch groups
    ref_groups = [[tuple(g) for g in layer] for layer in gold["branch_groups"]]
    got_groups = [[tuple(g) for g in layer] for layer in plan.branch_groups]
    assert got_groups == ref_groups

    # cells: geometry of every (layer, branch) alias
    cell_map = plan.cell_map()
    assert len(gold["cells"]) == len(cell_map)
    for key, ref_cell in gold["cells"].items():
        l, b = map(int, key.split("-"))
        c = cell_map[(l, b)]
        assert c.c_in == ref_cell["C_in"], (key, c)
        assert c.c_out == ref_cell["C_out"], (key, c)
        assert int(c.down) == ref_cell["down"], (key, c)
        assert c.op == ref_cell["op"], (key, c)

    assert plan.ch_16 == gold["ch_16"]
    assert plan.ch_8_2 == gold["ch_8_2"]
    assert plan.ch_8_1 == gold["ch_8_1"]
    assert plan.ffm_channels == gold["ffm_in"]
    assert plan.heads8_in == gold["heads8_in"]


def test_path_downs_roundtrip(rng):
    for _ in range(50):
        n = int(rng.integers(2, 17))
        path = [0]
        for _ in range(n - 1):
            path.append(path[-1] + int(rng.integers(0, 2)) if path[-1] < 2
                        else path[-1])
        downs = path_to_downs(path)
        assert downs_to_path(downs) == path
        assert len(downs) == len(path)
        assert downs[-1] == 0


def test_decode_invariants(arch_params):
    """Decode invariants from the reference asserts (model_seg.py:44,93-95,131)."""
    for arch_idx, ignore_skip in [(0, True), (1, False)]:
        genos = decode_network(arch_params[arch_idx], WIDTH_MULT_LIST,
                               layers=16, ignore_skip=ignore_skip)
        for last, g in genos.items():
            assert g.path[-1] == last
            assert len(g.ops) == len(g.path) == len(g.widths) + 1
            min_len = int(np.round(16 / 3.0)) + last * 2
            # compact path must respect the minimum branch length
            assert len(g.path) >= min(min_len, len(g.path))
            if ignore_skip:
                assert all(op != 0 for op in g.ops)
