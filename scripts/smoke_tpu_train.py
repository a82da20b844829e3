"""On-device smoke: real-shape training steps run on the attached TPU.

Stage-selectable (argv[1] in {pretrain, search, distill}) so each heavy
compile can run/bound separately:

  pretrain — supernet sandwich weight step, 256x512 crops batch 3
             (config_search.py pretrain block)
  search   — full bi-level step (architect + weights), 224x448 batch 2
  distill  — student+teacher KL step, 512x1024 crops batch 12
             (config_train.py student block)

Synthetic data; asserts finite losses. Not part of the pytest suite (the
suite runs the same paths on the CPU mesh); this validates the real
backend + HBM fit.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def main(stage: str):
    t0 = time.time()
    if stage in ("pretrain", "search"):
        from fasterseg_tpu.core.config import (SearchConfig, DataConfig,
                                               EvalConfig)
        from fasterseg_tpu.data import SyntheticDataset
        from fasterseg_tpu.search import run_search
        pre = stage == "pretrain"
        data = DataConfig(synthetic=True, synthetic_length=8,
                          image_height=256 if pre else 224,
                          image_width=512 if pre else 448,
                          batch_size=3 if pre else 2, gt_down_sampling=8)
        cfg = SearchConfig(data=data,
                           eval=EvalConfig(eval_height=512, eval_width=1024),
                           pretrain=pre)
        val = SyntheticDataset(length=1, hw=(512, 1024), num_classes=19)
        engine = run_search(cfg, val_dataset=val, epochs=1, niters=2,
                            max_eval_items=1)
        m = engine.metrics_log[-1]
        assert all(v == v for v in m.values() if isinstance(v, float))
        print(f"{stage.upper()} OK on {jax.default_backend()}: {m} "
              f"({time.time() - t0:.0f}s)", flush=True)
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
    main(sys.argv[1] if len(sys.argv) > 1 else "pretrain")
