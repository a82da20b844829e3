"""Slimmable-op parity vs the reference's sliced implementation.

The masked design must equal slicing on the active channel prefix and be
exactly zero beyond it, for every (op, stride, w_in, w_out) case in
tests/assets/slim_parity.npz (see scripts/make_slim_parity_assets.py).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.ops.slimmable import (
    SLIM_OP_CLASSES,
    make_divisible,
    width_index,
    width_mask_table,
)
from fasterseg_tpu.utils.torch_import import import_slim_op_state

WML = (4.0 / 12, 6.0 / 12, 8.0 / 12, 10.0 / 12, 1.0)
C_IN = 48
RATIOS = [(1.0, 1.0), (4.0 / 12, 4.0 / 12), (6.0 / 12, 10.0 / 12),
          (10.0 / 12, 6.0 / 12), (8.0 / 12, 1.0)]
NAMES = ["skip", "conv", "conv_downup", "conv_2x", "conv_2x_downup"]


@pytest.fixture(scope="module")
def slim_golden(assets_dir):
    return np.load(os.path.join(assets_dir, "slim_parity.npz"))


def test_make_divisible_reference_values():
    # slimmable_ops.py:5-18
    assert make_divisible(16) == 16
    assert make_divisible(20) == 24
    assert make_divisible(1) == 1
    assert make_divisible(7) == 8
    assert make_divisible(100) == 104


def test_width_mask_table():
    t = width_mask_table(48, WML)
    assert t.shape == (5, 48)
    np.testing.assert_array_equal(t.sum(1), [16, 24, 32, 40, 48])


@pytest.mark.parametrize("op_idx", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("stride", [1, 2])
def test_slim_op_matches_sliced_reference(slim_golden, op_idx, stride):
    name = NAMES[op_idx]
    key = f"{name}_s{stride}"
    c_out = C_IN * 2 if stride == 2 else C_IN
    sd = {k[len(f"{key}/state/"):]: slim_golden[k] for k in slim_golden.files
          if k.startswith(f"{key}/state/")}
    variables = import_slim_op_state(sd, op_idx, stride, c_out, WML)
    op = SLIM_OP_CLASSES[op_idx](
        c_max_in=C_IN, c_max_out=c_out, stride=stride, width_mult_list=WML)

    x_full = slim_golden[f"{key}/input"]
    for wi, wo in RATIOS:
        ref_key = f"{key}/out/{wi:.4f}_{wo:.4f}"
        if ref_key not in slim_golden.files:
            continue
        k_in = make_divisible(C_IN * wi)
        k_out = make_divisible(c_out * wo)
        x = np.zeros_like(x_full)
        x[..., :k_in] = x_full[..., :k_in]
        y = op.apply(variables, jnp.asarray(x),
                     jnp.int32(width_index(wi, WML)),
                     jnp.int32(width_index(wo, WML)), False)
        y = np.asarray(y)
        ref = slim_golden[ref_key]
        np.testing.assert_allclose(y[..., :k_out], ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"{key} {wi} {wo}")
        assert np.all(y[..., k_out:] == 0), f"{key} {wi} {wo}: mask leak"
