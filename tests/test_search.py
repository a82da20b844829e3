"""End-to-end search engine tests on a tiny supernet + synthetic data.

Covers: pretrain (sandwich rule, no arch updates), bi-level search (arch
step moves alpha/beta/ratio, latency penalty, FPS-band controller),
validation of all 5 heads, decode-to-FPS, and checkpoint artifacts.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.core.config import SearchConfig, DataConfig, EvalConfig
from fasterseg_tpu.data import SyntheticDataset
from fasterseg_tpu.search import run_search


def tiny_config(pretrain: bool) -> SearchConfig:
    data = DataConfig(synthetic=True, synthetic_length=8,
                      image_height=64, image_width=128, batch_size=2,
                      gt_down_sampling=8, num_classes=19)
    return SearchConfig(
        data=data,
        eval=EvalConfig(eval_height=64, eval_width=128),
        layers=5, Fch=8, pretrain=pretrain,
        latency_weight=(0.0, 1e-2),
        fps_min=(0.0, 1e9),   # force controller to double the weight
        fps_max=(0.0, 1e12),
    )


@pytest.fixture(scope="module")
def val_dataset():
    return SyntheticDataset(length=2, hw=(64, 128), num_classes=19)


@pytest.mark.slow
def test_engine_steps_single_width(tmp_path):
    """Single-width engine smoke: width_mult_list=(1.0,) collapses the
    slimmable masking and the sandwich rule to single forwards — the
    nw=1 configuration nothing else covers. Slow tier: even this minimal
    bi-level program costs XLA-CPU ~9 min of compile on this host (the
    persistent compilation cache makes repeat runs cheap)."""
    import jax
    from fasterseg_tpu.search import SearchEngine

    data = DataConfig(synthetic=True, synthetic_length=4,
                      image_height=64, image_width=128, batch_size=1,
                      gt_down_sampling=8, num_classes=19)
    cfg = SearchConfig(
        data=data, eval=EvalConfig(eval_height=64, eval_width=128),
        layers=5, Fch=8, pretrain=False, width_mult_list=(1.0,),
        stem_head_width=((1.0, 1.0), (1.0, 1.0)),
        prun_modes=("max", "max"),
        latency_weight=(0.0, 1e-2),
        fps_min=(0.0, 1e9), fps_max=(0.0, 1e12))
    engine = SearchEngine(cfg)
    x = jnp.zeros((1, 64, 128, 3))
    y = jnp.zeros((1, 8, 16), jnp.int32)
    key = jax.random.PRNGKey(0)
    lat_w = jnp.asarray(engine.controller.weights, jnp.float32)

    astep = engine._arch_step()
    ap, aopt, stats, am = astep(engine.arch_params, engine.arch_opt_state,
                                engine.state.params,
                                engine.state.batch_stats, x, y, key, lat_w)
    assert np.isfinite(float(am["loss_arch"]))
    assert float(np.abs(np.asarray(ap[1].alphas[0]) - 1e-3).max()) > 0

    wstep = engine._weight_step(False)
    state, loss = wstep(engine.state, ap, x, y, key)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


@pytest.mark.slow
def test_pretrain_one_epoch(val_dataset, tmp_path_factory):
    cfg = tiny_config(pretrain=True)
    engine = run_search(cfg, val_dataset=val_dataset, epochs=1, niters=2,
                        max_eval_items=1,
                        save_dir=str(tmp_path_factory.mktemp("pre")))
    # arch params must be untouched in pretrain
    ap = engine.arch_params[1]
    np.testing.assert_allclose(np.asarray(ap.alphas[0]), 1e-3)
    assert np.isfinite(engine.metrics_log[-1]["loss"])


@pytest.mark.slow
def test_search_updates_arch_and_controller(val_dataset, tmp_path):
    cfg = tiny_config(pretrain=False)
    engine = run_search(cfg, val_dataset=val_dataset, epochs=1, niters=2,
                        max_eval_items=1, save_dir=str(tmp_path))
    m = engine.metrics_log[-1]
    assert np.isfinite(m["loss"]) and np.isfinite(m["loss_arch"])
    assert m["latency_supernet_ms"] > 0
    # arch step moved the student's arch params
    ap = engine.arch_params[1]
    assert float(np.abs(np.asarray(ap.alphas[0]) - 1e-3).max()) > 0
    assert float(np.abs(np.asarray(ap.betas[1]) - 1e-3).max()) > 0
    assert float(np.abs(np.asarray(ap.ratios[0]) - 1e-3).max()) > 0
    # teacher has zero latency weight; its params still get loss gradients
    ap0 = engine.arch_params[0]
    assert float(np.abs(np.asarray(ap0.alphas[0]) - 1e-3).max()) > 0
    # fps estimates and controller doubling (fps_min=1e9 forces x2)
    fps0, fps1 = engine.arch_fps(1)
    assert fps0 > 0 and fps1 > 0
    assert engine.controller.weights[1] == pytest.approx(2e-2)
    # artifacts
    assert os.path.exists(os.path.join(tmp_path, "arch_1.npz"))
    d = np.load(os.path.join(tmp_path, "arch_1.npz"))
    assert d["alpha0"].shape == (5, 5)
    assert "mIoU02" in d and "latency12" in d


def test_save_per_arch_metrics(tmp_path):
    """Each arch npz must carry its OWN mIoU/latency (the reference
    stamps loop-stale values from the last arch into every arch_{idx}.pt,
    train_search.py:185-202 — fixed here, not replicated)."""
    from fasterseg_tpu.search import SearchEngine

    engine = SearchEngine(tiny_config(pretrain=False))
    engine.save(str(tmp_path), epoch=0, metrics={
        0: {"mIoU02": 0.5, "latency02": 10.0, "mIoU12": 0.4,
            "latency12": 11.0},
        1: {"mIoU02": 0.3, "latency02": 6.0, "mIoU12": 0.2,
            "latency12": 7.0}})
    d0 = np.load(tmp_path / "arch_0.npz")
    d1 = np.load(tmp_path / "arch_1.npz")
    assert float(d0["mIoU02"]) == 0.5 and float(d1["mIoU02"]) == 0.3
    assert float(d0["latency12"]) == 11.0 and float(d1["latency12"]) == 7.0
    # flat dict still applies to every arch (back-compat)
    engine.save(str(tmp_path), epoch=1, metrics={"mIoU02": 0.9})
    assert float(np.load(tmp_path / "arch_1.npz")["mIoU02"]) == 0.9


def test_decoded_arch_is_buildable(val_dataset):
    """Searched (even briefly) arch params must decode into a valid plan
    and network — exercises decode invariants on non-shipped params."""
    import jax
    from fasterseg_tpu.core import decode_network, build_plan, WIDTH_MULT_LIST
    from fasterseg_tpu.models import create_derived, DerivedNet

    cfg = tiny_config(pretrain=False)
    from fasterseg_tpu.search import SearchEngine
    engine = SearchEngine(cfg)
    arch = engine.numpy_arch(1)
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=cfg.layers,
                           ignore_skip=False)
    plan = build_plan(genos, [2, 1], Fch=cfg.Fch, num_classes=19,
                      stem_head_width=cfg.stem_head_width[1])
    model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                      input_hw=(64, 128))
    out = model.apply(variables, jnp.zeros((1, 64, 128, 3)), train=False)
    assert out.shape == (1, 64, 128, 19)


def test_latency_weight_controller_cap():
    """The FPS-band doubling is capped at initial*2^max_doublings
    (deviation from train_search.py:204-212's unbounded x2, PARITY.md):
    the round-4 self-search saturated the unbounded rule to 1.34e6 and
    late-epoch arch updates became latency-only (VERDICT r4 weak #4)."""
    from fasterseg_tpu.search.architect import LatencyWeightController

    c = LatencyWeightController([0.0, 1e-2], fps_min=[0.0, 100.0],
                                fps_max=[0.0, 120.0], max_doublings=4)
    # decoded FPS stuck below the band: doubles, then pins at 2^4x
    for _ in range(20):
        w = c.update(1, 50.0, 50.0)
    assert w == pytest.approx(1e-2 * 16)
    # halving still works from the cap (reference rule above FPS_max)
    assert c.update(1, 500.0, 500.0) == pytest.approx(1e-2 * 8)
    # teacher (zero weight) stays untouched
    assert c.update(0, 50.0, 50.0) == 0.0
