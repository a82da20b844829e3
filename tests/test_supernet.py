"""Supernet construction, forward, gradient-flow and latency-estimator
tests (small geometry — CPU-friendly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.models.supernet import (
    ArchParamsPytree,
    Supernet,
    init_supernet,
)
from fasterseg_tpu.search.gumbel import gumbel_softmax, sample_ratios
from fasterseg_tpu.latency import (
    LatencyLUT,
    TpuCostModel,
    build_supernet_tables,
    stem_latency_ms,
    expected_latency_ms,
)

LAYERS = 5
WML = (4.0 / 12, 6.0 / 12, 8.0 / 12, 10.0 / 12, 1.0)
SHW = ((1.0, 1.0), (8.0 / 12, 8.0 / 12))
HW = (64, 128)  # 1/32 scale stays non-degenerate for the zoomed convs


@pytest.fixture(scope="module")
def supernet():
    model = Supernet(layers=LAYERS, num_classes=7, Fch=8,
                     width_mult_list=WML, stem_head_width=SHW)
    variables = init_supernet(model, jax.random.PRNGKey(0), HW,
                              num_widths_per_arch=[1, len(WML)])
    return model, variables


def _arch(arch_idx):
    nw = 1 if arch_idx == 0 else len(WML)
    return ArchParamsPytree.create(LAYERS, num_widths=nw)


@pytest.mark.parametrize("arch_idx,mode", [
    (0, "max"), (1, "arch_ratio"), (1, "min"), (1, "random"),
])
def test_supernet_forward_shapes(supernet, arch_idx, mode):
    model, variables = supernet
    ap = _arch(arch_idx)
    ratios = sample_ratios(jax.random.PRNGKey(3), ap.ratios, mode, len(WML))
    x = jnp.zeros((1, *HW, 3))
    preds, _ = model.apply(variables, x, arch_idx, ap.alphas, ap.betas,
                           ratios, train=True, mutable=["batch_stats"])
    assert len(preds) == 5
    for p in preds:
        assert p.shape == (1, HW[0] // 8, HW[1] // 8, 7)
    # eval: x8 upsample to input res
    preds_eval = model.apply(variables, x, arch_idx, ap.alphas, ap.betas,
                             ratios, train=False)
    assert preds_eval[0].shape == (1, *HW, 7)


def test_gradients_flow_to_arch_and_weights(supernet):
    model, variables = supernet
    ap = _arch(1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, *HW, 3))

    def loss_fn(params, alphas, betas, ratio_logits):
        ratios = sample_ratios(jax.random.PRNGKey(5), ratio_logits,
                               "arch_ratio", len(WML))
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, 1, alphas, betas, ratios, train=True,
            mutable=["batch_stats"])
        return sum(jnp.sum(p * p) for p in preds)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        variables["params"], ap.alphas, ap.betas, ap.ratios)
    g_params, g_alphas, g_betas, g_ratios = grads
    assert all(float(jnp.abs(g).max()) > 0 for g in g_alphas)
    assert float(jnp.abs(g_betas[1]).max()) > 0
    assert float(jnp.abs(g_betas[2]).max()) > 0
    # ST gumbel must pass gradient into width logits
    assert any(float(jnp.abs(g).max()) > 0 for g in g_ratios)
    leaves = jax.tree.leaves(g_params)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_gumbel_straight_through():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([0.1, 2.0, -1.0])
    y = gumbel_softmax(key, logits, hard=True)
    np.testing.assert_allclose(np.sort(np.asarray(y)), [0, 0, 1], atol=1e-6)
    g = jax.grad(lambda l: jnp.max(gumbel_softmax(key, l, hard=True)))(logits)
    assert float(jnp.abs(g).max()) > 0


def test_latency_estimator(supernet):
    lut = LatencyLUT(provider=TpuCostModel().provider)
    tables = build_supernet_tables(lut, LAYERS, 8, WML, (256, 512))
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    stem_ms = stem_latency_ms(lut, 8, 1.0, (256, 512))
    model, _ = supernet
    ap = _arch(1)
    pin = model.width_pin

    def lat(mode, alphas, betas, key=7):
        ratios = sample_ratios(jax.random.PRNGKey(key), ap.ratios, mode,
                               len(WML))
        return expected_latency_ms(tables, stem_ms, alphas, betas, ratios,
                                   LAYERS, pin(1.0), pin(1.0))

    l_max = float(lat("max", ap.alphas, ap.betas))
    l_min = float(lat("min", ap.alphas, ap.betas))
    assert 0 < l_min < l_max

    # differentiable w.r.t. alphas and betas
    g_a, g_b = jax.grad(
        lambda a, b: lat("max", a, b), argnums=(0, 1))(ap.alphas, ap.betas)
    assert all(float(jnp.abs(g).max()) > 0 for g in g_a)
    assert float(jnp.abs(g_b[1]).max()) > 0

    # differentiable w.r.t. ratio logits through ST gumbel
    def lat_r(rl):
        ratios = sample_ratios(jax.random.PRNGKey(9), rl, "arch_ratio",
                               len(WML))
        return expected_latency_ms(tables, stem_ms, ap.alphas, ap.betas,
                                   ratios, LAYERS, pin(1.0), pin(1.0))
    g_r = jax.grad(lat_r)(ap.ratios)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_r)


def test_lut_measure_on_miss_persists(tmp_path):
    path = str(tmp_path / "lut.json")
    lut = LatencyLUT(path, provider=TpuCostModel().provider)
    v = lut.get("BasicResidual2x_H64_W128_Cin32_Cout32_stride1_dilation1")
    assert v > 0
    lut2 = LatencyLUT(path)
    assert len(lut2) == 1  # persisted without provider
