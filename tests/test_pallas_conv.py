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
