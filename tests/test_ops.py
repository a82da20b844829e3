"""Op-level parity tests: resize semantics vs torch, primitive shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fasterseg_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    downsample_half,
    scale_by,
    make_op,
    conv_padding,
)


def _torch_interp(x_nhwc, out_hw, mode="bilinear"):
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kw = dict(align_corners=True) if mode == "bilinear" else {}
    y = F.interpolate(t, size=out_hw, mode=mode, **kw)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 32), (32, 64)),    # x2 up
    ((32, 64), (16, 32)),    # /2 down
    ((17, 33), (8, 16)),     # odd /2
    ((8, 16), (64, 128)),    # x8 up (final head upsample)
    ((15, 31), (22, 47)),    # arbitrary
    ((4, 4), (4, 4)),        # identity
])
def test_bilinear_align_corners_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    want = _torch_interp(x, out_hw, "bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 32), (32, 64)),     # x2 up
    ((32, 64), (16, 32)),     # /2 down
    ((28, 28), (40, 40)),     # arbitrary up
    ((20, 40), (16, 32)),     # arbitrary down
    ((17, 33), (20, 41)),     # odd
])
def test_halfpixel_bilinear_matches_cv2(rng, in_hw, out_hw):
    """resize_bilinear_halfpixel == cv2.INTER_LINEAR (the eval
    protocol's probability-resize semantics, evaluator.py:219) — the
    guarantee behind the on-device multi-scale accumulate."""
    import cv2
    from fasterseg_tpu.ops.resize import resize_bilinear_halfpixel
    x = rng.random((*in_hw, 7)).astype(np.float32)
    want = cv2.resize(x, (out_hw[1], out_hw[0]),
                      interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear_halfpixel(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 32), (8, 16)),
    ((16, 32), (32, 64)),
    ((10, 14), (7, 9)),
])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    want = _torch_interp(x, out_hw, "nearest")
    np.testing.assert_array_equal(got, want)


def test_downsample_half_matches_torch(rng):
    x = rng.standard_normal((1, 28, 56, 4), dtype=np.float32)
    got = np.asarray(downsample_half(jnp.asarray(x)))
    want = _torch_interp(x, (14, 28), "bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv_padding_formula():
    # reference operations.py:54-58
    assert conv_padding(3, 1) == ((1, 1), (1, 1))
    assert conv_padding(3, 2) == ((1, 1), (1, 1))
    assert conv_padding(1, 1) == ((0, 0), (0, 0))
    assert conv_padding(3, 1, dilation=2) == ((2, 2), (2, 2))


@pytest.mark.parametrize("op_idx", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("stride", [1, 2])
def test_primitive_shapes(rng, op_idx, stride):
    c_in, c_out = 8, 12
    if op_idx == 0 and stride == 1:
        c_out = c_in  # identity skip
    x = jnp.asarray(rng.standard_normal((1, 16, 24, c_in), dtype=np.float32))
    op = make_op(op_idx, c_out, stride)
    variables = op.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = op.apply(variables, x, train=True, mutable=["batch_stats"])
    exp_hw = (16 // stride, 24 // stride)
    assert y.shape == (1, *exp_hw, c_out), (op_idx, stride, y.shape)
    # eval path
    y2 = op.apply(variables, x, train=False)
    assert y2.shape == y.shape
