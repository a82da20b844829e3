"""Fused planar conv kernel parity (Pallas interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.pallas.conv import (
    conv3x3_bn_relu_planar,
    conv3x3_bn_relu_reference,
    fold_bn,
    nhwc_to_planar,
    planar_to_nhwc,
)


@pytest.mark.parametrize("H,W,ci,co,stride", [
    (32, 64, 3, 32, 2),
    (32, 64, 32, 64, 2),
    (16, 32, 64, 64, 1),
    (16, 32, 16, 48, 1),
])
def test_planar_conv_matches_reference(rng, H, W, ci, co, stride):
    x = jnp.asarray(rng.standard_normal((1, H, W, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32)
                    * 0.1)
    scale = jnp.asarray(rng.random(co).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)
    ref = np.asarray(conv3x3_bn_relu_reference(x, w, scale, bias, stride))
    got_p = conv3x3_bn_relu_planar(nhwc_to_planar(x), w, scale, bias,
                                   stride)
    got = np.asarray(planar_to_nhwc(got_p, co))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # channel padding lanes must be exactly zero (chained kernels rely
    # on zero padding for the next conv's taps)
    assert np.all(np.asarray(got_p)[:, co:, :] == 0)


def test_fold_bn():
    g = jnp.asarray([2.0, 1.0])
    b = jnp.asarray([0.5, -0.5])
    m = jnp.asarray([1.0, 2.0])
    v = jnp.asarray([4.0, 1.0])
    scale, bias = fold_bn(g, b, m, v, eps=0.0)
    x = jnp.asarray([[3.0, 4.0]])
    want = (x - m) / jnp.sqrt(v) * g + b
    np.testing.assert_allclose(np.asarray(x * scale + bias),
                               np.asarray(want), rtol=1e-6)


def test_fast_stem_matches_model_stem(rng):
    """fast_stem (interpret mode) vs the flax Stem on real params."""
    from fasterseg_tpu.models.derived import Stem
    from fasterseg_tpu.models.infer import fast_stem

    stem = Stem(8, 8.0 / 12)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 3)).astype(np.float32))
    variables = stem.init(jax.random.PRNGKey(0), x, train=True)
    # give running stats non-trivial values via one train step
    _, upd = stem.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], **upd}
    ref = np.asarray(stem.apply(variables, x, train=False))
    got = np.asarray(fast_stem(variables["params"],
                               variables["batch_stats"], x,
                               dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H,W,ci,co", [(32, 64, 3, 32), (16, 32, 8, 16)])
def test_s2d_conv_matches_reference(H, W, ci, co):
    """Space-to-depth stride-2 conv (2x2-tap kernel on the packed layout)
    == the plain stride-2 conv, elementwise."""
    from fasterseg_tpu.pallas.conv import (conv3x3s2_bn_relu_s2d,
                                           space_to_depth_planar)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, H, W, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(co,)) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32)
    ref = conv3x3_bn_relu_reference(x, w, s, b, stride=2)
    got = conv3x3s2_bn_relu_s2d(space_to_depth_planar(x, ci), w, s, b,
                                interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got[:, :co], (0, 2, 1))[None]),
        np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("H,W,ci,co", [
    (32, 64, 32, 64),   # stem stage1 conv0 geometry (no channel padding)
    (16, 32, 8, 16),    # padded planar channels (cp=16 > ci=8)
])
def test_planar_s2d_conv_matches_reference(H, W, ci, co):
    """planar_space_to_depth + packing='planar' s2d conv == the plain
    stride-2 conv on the same NHWC input, elementwise — including when
    the planar input carries zero padding lanes (ci < cp)."""
    from fasterseg_tpu.pallas.conv import (conv3x3s2_bn_relu_s2d,
                                           planar_space_to_depth)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, H, W, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(co,)) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32)
    ref = conv3x3_bn_relu_reference(x, w, s, b, stride=2)
    xp = nhwc_to_planar(x)                     # (H, cp, W), cp >= ci
    got = conv3x3s2_bn_relu_s2d(planar_space_to_depth(xp), w, s, b,
                                packing="planar", interpret=True)
    np.testing.assert_allclose(
        np.asarray(planar_to_nhwc(got, co)), np.asarray(ref),
        atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(got)[:, co:, :] == 0)
