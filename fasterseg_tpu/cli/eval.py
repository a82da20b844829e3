"""CLI: evaluate a trained network on the validation set.

Equivalent of the reference's eval-only path (train/train.py:155-176 with
C.is_eval=True) as a first-class command.

  python -m fasterseg_tpu.cli.eval --arch-dir ... --ckpt ... --data-root ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["teacher", "student"],
                   default="student")
    p.add_argument("--arch-dir", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--scales", type=float, nargs="+", default=[1.0])
    p.add_argument("--flip", action="store_true")
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--devices", type=int, default=None, metavar="N",
                   help="evaluate over an N-device mesh (default: 1)")
    p.add_argument("--spatial", action="store_true",
                   help="partition each image over H across the mesh "
                        "(batch-1 full-res; SURVEY.md §5.7) instead of "
                        "sharding the batch")
    p.add_argument("--show-dir", default=None, metavar="DIR",
                   help="also write [image|gt|pred] overlay PNGs for the "
                        "evaluated images (train/eval.py:43-50)")
    args = p.parse_args(argv)

    from ..utils.logging import enable_compilation_cache
    enable_compilation_cache()

    from ..core.config import (cityscapes_student_config,
                               cityscapes_teacher_config)
    from ..data import Cityscapes, DataSetting
    from ..train import TrainSession
    from ..utils.checkpoint import load_pytree, partial_load
    from ..utils.logging import get_logger
    from ..utils.visualize import print_iou

    logger = get_logger()
    cfg = (cityscapes_teacher_config() if args.mode == "teacher"
           else cityscapes_student_config())
    ev = dataclasses.replace(cfg.eval, eval_scale_array=tuple(args.scales),
                             eval_flip=args.flip)
    cfg = dataclasses.replace(cfg, eval=ev, is_eval=True)

    session = TrainSession(cfg, args.arch_dir)
    loaded = load_pytree(args.ckpt)
    sv = session.variables[session.student_idx]
    session.state = session.state.replace(
        params=partial_load(sv["params"], loaded.get("params", {})),
        batch_stats=partial_load(sv["batch_stats"],
                                 loaded.get("batch_stats", {})))

    setting = DataSetting(
        img_root=args.data_root, gt_root=args.data_root,
        train_source=os.path.join(args.data_root,
                                  cfg.data.train_source),
        eval_source=os.path.join(args.data_root, cfg.data.eval_source))
    val = Cityscapes(setting, "val")
    mesh = None
    if args.devices:
        from ..parallel import SPATIAL_AXIS, make_mesh
        mesh = make_mesh(args.devices, axis_names=(
            (SPATIAL_AXIS,) if args.spatial else ("data",)))
    res = session.evaluate(val, max_items=args.max_items, mesh=mesh,
                           spatial=args.spatial)
    print(print_iou(res.iou_per_class, res.pixel_acc,
                    Cityscapes.class_names))

    if args.show_dir:
        import cv2
        import numpy as np
        import jax
        import jax.numpy as jnp
        from ..data.preprocess import eval_preprocess
        from ..utils.visualize import show_img

        os.makedirs(args.show_dir, exist_ok=True)
        model = session.models[session.student_idx]
        variables = session.student_variables()
        predict = jax.jit(lambda v, x: jnp.argmax(
            model.apply(v, x, train=False), -1))
        n = min(len(val), args.max_items or len(val))
        for i in range(n):
            s = val[i]
            x = eval_preprocess(s["data"], cfg.data.image_mean,
                                cfg.data.image_std)
            pred = np.asarray(predict(variables, x[None]))[0]
            panel = show_img(s["data"].astype(np.uint8),
                             s["label"].astype(np.int32), pred,
                             Cityscapes.colors)
            name = os.path.splitext(os.path.basename(s["fn"]))[0] + ".png"
            cv2.imwrite(os.path.join(args.show_dir, name), panel[..., ::-1])
    return res


if __name__ == "__main__":
    main()
