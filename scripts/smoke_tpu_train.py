"""On-device smoke: real-shape training steps run on the attached TPU.

Stage-selectable (argv[1] in {pretrain, search, distill}) so each heavy
compile can run/bound separately:

  pretrain — supernet sandwich weight step, 256x512 crops batch 3
             (config_search.py pretrain block)
  search   — full bi-level step (architect + weights), 224x448 batch 2
  distill  — student+teacher KL step, 512x1024 crops batch 12
             (config_train.py student block)

Synthetic data; asserts finite losses; prints per-phase wall times
(engine build incl. jitted init, first step = compile, steady step).
Not part of the pytest suite (the suite runs the same paths on the CPU
mesh); this validates the real backend + HBM fit + compile latency.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _supernet_stage(pretrain: bool, dtype: str = "float32"):
    from fasterseg_tpu.core.config import (SearchConfig, DataConfig,
                                           EvalConfig)
    from fasterseg_tpu.search.loop import SearchEngine

    data = DataConfig(synthetic=True, synthetic_length=8,
                      image_height=256 if pretrain else 224,
                      image_width=512 if pretrain else 448,
                      batch_size=3 if pretrain else 2, gt_down_sampling=8)
    cfg = SearchConfig(data=data,
                       eval=EvalConfig(eval_height=512, eval_width=1024),
                       pretrain=pretrain, compute_dtype=dtype)

    t0 = time.time()
    engine = SearchEngine(cfg)
    t_build = time.time() - t0

    h, w = data.image_height, data.image_width
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (data.batch_size, h, w, 3), jnp.float32)
    y = jax.random.randint(key, (data.batch_size, h // 8, w // 8), 0, 19,
                           jnp.int32)

    times = {"build_s": round(t_build, 1)}
    if not pretrain:
        astep = engine._arch_step()
        lat_w = jnp.asarray(engine.controller.weights, jnp.float32)
        t0 = time.time()
        ap, aopt, stats, am = astep(engine.arch_params,
                                    engine.arch_opt_state,
                                    engine.state.params,
                                    engine.state.batch_stats, x, y, key,
                                    lat_w)
        jax.block_until_ready(am["loss_arch"])
        times["arch_compile_plus_step_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        ap, aopt, stats, am = astep(ap, aopt, engine.state.params, stats,
                                    x, y, key, lat_w)
        jax.block_until_ready(am["loss_arch"])
        times["arch_step_s"] = round(time.time() - t0, 2)
        engine.arch_params, engine.arch_opt_state = ap, aopt
        engine.state = engine.state.replace(batch_stats=stats)
        assert np.isfinite(float(am["loss_arch"]))

    wstep = engine._weight_step(pretrain)
    t0 = time.time()
    state, loss = wstep(engine.state, engine.arch_params, x, y, key)
    jax.block_until_ready(loss)
    times["weight_compile_plus_step_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    state, loss = wstep(state, engine.arch_params, x, y,
                        jax.random.fold_in(key, 1))
    jax.block_until_ready(loss)
    times["weight_step_s"] = round(time.time() - t0, 2)
    assert np.isfinite(float(loss))
    return times, float(loss)


def main(stage: str, dtype: str = "float32"):
    t0 = time.time()
    if stage in ("pretrain", "search"):
        times, loss = _supernet_stage(stage == "pretrain", dtype)
        print(f"{stage.upper()} [{dtype}] OK on {jax.default_backend()}: "
              f"loss={loss:.3f} {times} total={time.time() - t0:.0f}s",
              flush=True)
    elif stage == "distill":
        from fasterseg_tpu.core.config import cityscapes_student_config
        from fasterseg_tpu.train import run_train
        cfg = cityscapes_student_config()
        data = dataclasses.replace(cfg.data, synthetic=True,
                                   synthetic_length=12)
        cfg = dataclasses.replace(cfg, data=data)
        session = run_train(cfg, "/root/repo/tests/assets",
                            val_dataset=None, epochs=1, niters=2)
        print(f"DISTILL OK on {jax.default_backend()}: "
              f"step={int(session.state.step)} ({time.time() - t0:.0f}s)",
              flush=True)
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pretrain",
         sys.argv[2] if len(sys.argv) > 2 else "float32")
