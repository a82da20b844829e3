"""Did the round-4 latency-weight explosion cost accuracy? (VERDICT r4 #7)

The round-4 self-search's FPS-band controller doubled unbounded to
1.34e6 while search-time val mIoU collapsed after ~epoch 7 (SEARCH.md
trajectory; the ×2 rule mirrors train_search.py:204-212). The question
this probe answers from the committed per-epoch snapshots
(evidence/self_search_r4/search/arch_1_<ep>.npz, the analog of the
reference's arch_logging, train_search.py:274-303): did the
latency-only late epochs keep improving the genotype, or merely freeze
it — and did they cost final accuracy?

Method:
  1. decode EVERY committed epoch snapshot -> genotype signature
     (ops/downs/widths per branch + lasts); report when the decoded
     student stopped changing and its LUT-FPS walk per epoch;
  2. for a small set of DISTINCT decoded archetypes spanning the
     trajectory, train each briefly (same ProcCity recipe as the chain,
     teacher-style: no distillation — the archetypes are compared to
     each other, not to the distilled headline) and report val mIoU.

Writes evidence/self_search_r4/probe_weight_explosion.json.

  python scripts/probe_weight_explosion.py            # decode-only
  python scripts/probe_weight_explosion.py --train    # + short trainings
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEARCH_DIR = os.path.join(REPO, "evidence", "self_search_r4",
                          "search")
OUT = os.path.join(REPO, "evidence", "self_search_r4",
                   "probe_weight_explosion.json")
ROOT = os.path.join(REPO, "artifacts", "proccity")
HW = (256, 512)
NUM_CLASSES = 8
N_TRAIN = 160


def decode_epoch(npz_path):
    import numpy as np
    from fasterseg_tpu.core import ArchParams
    from fasterseg_tpu.core.config import WIDTH_MULT_LIST
    from fasterseg_tpu.core.genotype import decode_network
    from fasterseg_tpu.core.plan import build_plan, select_lasts

    d = np.load(npz_path)
    arch = ArchParams.from_npz(npz_path)
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=False)
    if all(k in d for k in ("mIoU02", "latency02", "mIoU12", "latency12")):
        lasts = list(select_lasts(float(d["mIoU02"]), float(d["latency02"]),
                                  float(d["mIoU12"]), float(d["latency12"])))
    else:
        lasts = [2, 0]
    plan = build_plan(genos, lasts, Fch=12, num_classes=NUM_CLASSES,
                      stem_head_width=(8.0 / 12, 8.0 / 12))
    sig = {s: {"ops": list(map(int, g.ops)),
               "downs": list(map(int, g.downs)),
               "widths": [float(w) for w in g.widths]}
           for s, g in genos.items()}
    return plan, lasts, sig


def short_train(npz_path, epochs):
    """Same recipe as scripts/self_search.py cmd_train, teacher-style
    (single arch, no distillation), on the decoded snapshot."""
    import jax
    from fasterseg_tpu.core.config import (DataConfig, EvalConfig,
                                           cityscapes_teacher_config)
    from fasterseg_tpu.data import get_train_loader
    from fasterseg_tpu.data.datasets import DataSetting
    from fasterseg_tpu.data.procgen import make_dataset_cls
    from fasterseg_tpu.train.driver import TrainSession

    data = DataConfig(
        dataset_path=ROOT, train_source="train.txt", eval_source="val.txt",
        test_source="val.txt", num_classes=NUM_CLASSES,
        num_train_imgs=N_TRAIN, num_eval_imgs=40,
        image_height=HW[0], image_width=HW[1], batch_size=8)
    cfg = cityscapes_teacher_config(
        data=data, eval=EvalConfig(eval_height=HW[0], eval_width=HW[1]),
        arch_idx=(1,), stem_head_width=((8.0 / 12, 8.0 / 12),),
        niters_per_epoch=N_TRAIN // 8, eval_every=1)

    tmp = tempfile.mkdtemp(prefix="probe_arch_")
    shutil.copy(npz_path, os.path.join(tmp, "arch_1.npz"))
    try:
        session = TrainSession(cfg, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    setting = DataSetting(img_root=ROOT, gt_root=ROOT,
                          train_source=os.path.join(ROOT, "train.txt"),
                          eval_source=os.path.join(ROOT, "val.txt"))
    val = make_dataset_cls()(setting, "val")
    loader = get_train_loader(cfg, make_dataset_cls())
    curve = []
    try:
        for epoch in range(epochs):
            session.train_epoch(loader, epoch, cfg.niters_per_epoch)
            res = session.evaluate(val)
            curve.append(round(float(res.mean_iu), 4))
            print(f"  epoch {epoch}: val mIoU {curve[-1]}", flush=True)
    finally:
        loader.close()
    return curve


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", action="store_true",
                    help="short-train the distinct archetypes on ProcCity")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--max-archs", type=int, default=4)
    args = ap.parse_args()

    from fasterseg_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()
    from fasterseg_tpu.latency import LatencyLUT, TpuCostModel
    from fasterseg_tpu.latency.derived import derived_latency_ms

    lut = LatencyLUT(os.path.join(REPO, "latency_lut_v5e.json"),
                     provider=TpuCostModel().provider)

    snaps = sorted(
        (int(f.split("_")[2].split(".")[0]), f)
        for f in os.listdir(SEARCH_DIR)
        if f.startswith("arch_1_") and f.endswith(".npz"))
    epochs_rows = []
    sig_first_seen = {}
    for ep, fname in snaps:
        path = os.path.join(SEARCH_DIR, fname)
        plan, lasts, sig = decode_epoch(path)
        key = json.dumps(sig, sort_keys=True) + str(lasts)
        fresh = key not in sig_first_seen
        if fresh:
            sig_first_seen[key] = ep
        epochs_rows.append({
            "epoch": ep, "file": fname, "lasts": lasts,
            "lut_fps_1024x2048": round(
                1000.0 / derived_latency_ms(lut, plan, (1024, 2048)), 1),
            "genotype_changed": fresh,
            "same_as_epoch": sig_first_seen[key]})
        print(epochs_rows[-1], flush=True)

    distinct = [r for r in epochs_rows if r["genotype_changed"]]
    print(f"{len(distinct)} distinct decoded genotypes across "
          f"{len(snaps)} snapshots", flush=True)

    out = {"snapshots": epochs_rows,
           "n_distinct_genotypes": len(distinct)}
    if args.train:
        # span the trajectory: earliest (accuracy-driven epochs, before
        # the weight explosion), two mid-points, and the final genotype
        # (latency-dominated epochs)
        k = min(args.max_archs, len(distinct))
        idxs = sorted({round(i * (len(distinct) - 1) / max(k - 1, 1))
                       for i in range(k)})
        chosen = [distinct[i] for i in idxs]
        trainings = {}
        for r in chosen:
            print(f"== training epoch-{r['epoch']} archetype ==",
                  flush=True)
            t0 = time.time()
            curve = short_train(os.path.join(SEARCH_DIR, r["file"]),
                                args.epochs)
            trainings[r["epoch"]] = {
                "val_mIoU_curve": curve,
                "final": curve[-1] if curve else None,
                "best": max(curve) if curve else None,
                "wall_s": round(time.time() - t0, 1)}
            print(trainings[r["epoch"]], flush=True)
        out["short_trainings"] = {"epochs_trained": args.epochs,
                                  "recipe": "teacher-style (no distill), "
                                            "ProcCity 256x512 batch 8",
                                  "by_snapshot_epoch": trainings}

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
