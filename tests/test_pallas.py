"""Fused serving-kernel tests (Pallas interpreter on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from fasterseg_tpu.pallas import upsample8_argmax, upsample8_argmax_xla


def test_upsample8_argmax_matches_unfused(rng):
    p8 = jnp.asarray(rng.standard_normal((1, 16, 32, 19), dtype=np.float32))
    ref = np.asarray(upsample8_argmax_xla(p8))
    got = np.asarray(upsample8_argmax(p8, tile_h=32))
    assert got.shape == ref.shape == (1, 128, 256)
    # fma-order differences may flip exact near-ties only
    mismatch = (got != ref).mean()
    assert mismatch < 0.005, mismatch


def test_upsample8_argmax_onehot_exact(rng):
    """With well-separated logits the fused path must agree everywhere."""
    lbl = rng.integers(0, 19, (1, 16, 32))
    p8 = np.full((1, 16, 32, 19), -5.0, np.float32)
    np.put_along_axis(p8, lbl[..., None], 5.0, axis=-1)
    got = np.asarray(upsample8_argmax(jnp.asarray(p8), tile_h=32))
    ref = np.asarray(upsample8_argmax_xla(jnp.asarray(p8)))
    np.testing.assert_array_equal(got, ref)
