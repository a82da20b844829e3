"""Scan-supernet parity: the lax.scan-over-layers grid (stacked weights,
layers 3..L-2) must compute exactly what the unrolled graph computes —
forward, batch-stats updates, and gradients (weights + arch params) —
up to float32 reassociation (the two programs schedule differently).

This pins the round-2 rewrite that makes search/pretrain compile on the
real TPU (program size ~L/4 of the unrolled graph): reference
model_search.py:263-358 semantics, one traced layer body.

Width modes (max/min/arch_ratio/random) are traced inputs, so ONE jitted
program per layout serves every mode — itself part of the design under
test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compiling the UNROLLED comparison model dominates (minutes on this
# single-core host) — the scan model itself compiles fast
pytestmark = pytest.mark.slow

from fasterseg_tpu.models.supernet import (ArchParamsPytree, Supernet,
                                           init_supernet,
                                           unrolled_to_scan_variables)
from fasterseg_tpu.search.gumbel import sample_ratios

L = 6          # scan length 2 — exercises a real (non-degenerate) scan
WML = (8.0 / 12, 1.0)
SHW = ((1.0, 1.0), (8.0 / 12, 8.0 / 12))
HW = (64, 128)


@pytest.fixture(scope="module")
def pair():
    kw = dict(layers=L, num_classes=5, Fch=8, width_mult_list=WML,
              stem_head_width=SHW)
    m_u = Supernet(scan=False, **kw)
    m_s = Supernet(scan=True, **kw)
    v_u = init_supernet(m_u, jax.random.PRNGKey(0), HW, [1, len(WML)])
    v_s = unrolled_to_scan_variables(v_u, L)
    return m_u, v_u, m_s, v_s


def _inputs(mode="arch_ratio"):
    ap = ArchParamsPytree.create(L, num_widths=len(WML))
    ratios = sample_ratios(jax.random.PRNGKey(3), ap.ratios, mode, len(WML))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, *HW, 3))
    return ap, ratios, x


def _fwd(m, train):
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def f(v, x, arch_idx, alphas, betas, ratios):
        if train:
            return m.apply(v, x, arch_idx, alphas, betas, ratios,
                           train=True, mutable=["batch_stats"])
        return m.apply(v, x, arch_idx, alphas, betas, ratios, train=False)
    return f


def test_forward_stats_and_eval_parity(pair):
    m_u, v_u, m_s, v_s = pair
    fu, fs = _fwd(m_u, True), _fwd(m_s, True)
    # width modes are traced inputs -> one compile per (layout, arch_idx);
    # arch_idx is static (it names the stem/head modules)
    for arch_idx, mode in ((0, "max"), (1, "arch_ratio"), (1, "min"),
                           (1, "random")):
        ap, ratios, x = _inputs(mode)
        pu, mu = fu(v_u, x, arch_idx, ap.alphas, ap.betas, ratios)
        ps, ms = fs(v_s, x, arch_idx, ap.alphas, ap.betas, ratios)
        for a, b in zip(pu, ps):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-5)
        conv = unrolled_to_scan_variables(
            {"batch_stats": mu["batch_stats"]}, L)["batch_stats"]
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
            conv, ms["batch_stats"])

    # eval mode: x8-upsampled logits from frozen stats
    eu, es = _fwd(m_u, False), _fwd(m_s, False)
    ap, ratios, x = _inputs("max")
    pu = eu(v_u, x, 0, ap.alphas, ap.betas, ratios)
    ps = es(v_s, x, 0, ap.alphas, ap.betas, ratios)
    for a, b in zip(pu, ps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-5)


def test_gradient_parity(pair):
    m_u, v_u, m_s, v_s = pair
    ap, ratios, x = _inputs()

    def make_loss(m, stats):
        def f(params, alphas, betas):
            preds, _ = m.apply(
                {"params": params, "batch_stats": stats},
                x, 1, alphas, betas, ratios, train=True,
                mutable=["batch_stats"])
            return sum(jnp.mean(p * p) for p in preds)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    gu = make_loss(m_u, v_u["batch_stats"])(v_u["params"], ap.alphas,
                                            ap.betas)
    gs = make_loss(m_s, v_s["batch_stats"])(v_s["params"], ap.alphas,
                                            ap.betas)

    gu_p = unrolled_to_scan_variables({"params": gu[0]}, L)["params"]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3), gu_p, gs[0])
    for a, b in zip(gu[1], gs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    for a, b in zip(gu[2][1:], gs[2][1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_remat_scan_matches(pair):
    """remat inside the scan body must not change values."""
    _, _, m_s, v_s = pair
    ap, ratios, x = _inputs()
    m_r = Supernet(scan=True, remat=True, layers=L, num_classes=5, Fch=8,
                   width_mult_list=WML, stem_head_width=SHW)
    ps = _fwd(m_s, False)(v_s, x, 1, ap.alphas, ap.betas, ratios)
    pr = _fwd(m_r, False)(v_s, x, 1, ap.alphas, ap.betas, ratios)
    for a, b in zip(ps, pr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
