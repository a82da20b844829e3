"""Train-from-scratch driver: teacher, then student with KL distillation.

Equivalent of train/train.py:42-295. Decodes the searched genotypes
(arch_0 = teacher with ignore_skip, arch_1 = student), picks the output
branch pair by the stored search-time accuracy/latency objective
(train.py:102-105), builds the derived networks, and trains:

  teacher:  OHEM(pred8) + 0.2*OHEM(pred16) + 0.2*OHEM(pred32)
  student:  + KL(log_softmax(student8), softmax(teacher8)), teacher frozen
            in eval mode (train.py:225,249-260)

Eval-only and test-submission (Cityscapes PNG) paths included
(train.py:155-176, test(): train.py:283-291, train/test.py).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..core.genotype import ArchParams, decode_network
from ..core.plan import build_plan, select_lasts
from ..data import Cityscapes, SyntheticDataset, get_train_loader
from ..data.preprocess import eval_preprocess
from ..eval.evaluator import Evaluator
from ..eval.metrics import SegMetrics
from ..models import DerivedNet, create_derived
from ..utils.checkpoint import load_arch, partial_load, save_pytree, load_pytree
from .loop import (TrainState, create_train_state, make_optimizer,
                   make_train_step)

logger = logging.getLogger("fasterseg_tpu.train")


def load_arch_any(path: str) -> Tuple[ArchParams, Dict[str, float]]:
    """Load arch params from our .npz or a reference .pt artifact."""
    if path.endswith(".pt"):
        import torch
        state = torch.load(path, map_location="cpu", weights_only=False)
        idx = next(k for k in state if k.startswith("alpha_")).split("_")[1]
        arch = ArchParams(
            alphas=[state[f"alpha_{idx}_{s}"].detach().numpy()
                    for s in (0, 1, 2)],
            betas=[None, state[f"beta_{idx}_1"].detach().numpy(),
                   state[f"beta_{idx}_2"].detach().numpy()],
            ratios=[state[f"ratio_{idx}_{s}"].detach().numpy()
                    for s in (0, 1, 2)])
        metrics = {k: float(state[k]) for k in
                   ("mIoU02", "latency02", "mIoU12", "latency12")
                   if k in state}
        return arch, metrics
    d = np.load(path)
    arch = ArchParams.from_npz(path)
    metrics = {k: float(d[k]) for k in
               ("mIoU02", "latency02", "mIoU12", "latency12") if k in d}
    return arch, metrics


def build_model_from_arch(config: TrainConfig, arch_path: str,
                          arch_idx: int, stem_head_width, rng,
                          input_hw, dtype=jnp.float32):
    """Decode + select branches + construct DerivedNet (train.py:90-105)."""
    arch, metrics = load_arch_any(arch_path)
    genos = decode_network(arch, config.width_mult_list, config.layers,
                           ignore_skip=(arch_idx == 0))
    if all(k in metrics for k in ("mIoU02", "latency02", "mIoU12",
                                  "latency12")):
        lasts = select_lasts(metrics["mIoU02"], metrics["latency02"],
                             metrics["mIoU12"], metrics["latency12"])
    else:
        lasts = [2, 1]
    plan = build_plan(genos, lasts, Fch=config.Fch,
                      num_classes=config.data.num_classes,
                      stem_head_width=stem_head_width)
    model, variables = create_derived(plan, rng, input_hw=input_hw,
                                      dtype=dtype)
    return model, variables, plan, lasts


class TrainSession:
    """Holds teacher + student models, states, and jitted steps.

    With `mesh` (SPMD data parallelism over ICI, SURVEY.md §2.6/§5.8):
    params/optimizer state are replicated, every batch is sharded over
    the mesh's data axis, and the jitted step's in/out shardings make
    XLA insert gradient all-reduces and global (sync) BN statistic
    reductions; the Evaluator shards val batches over the same mesh."""

    def __init__(self, config: TrainConfig, arch_dir: str,
                 dtype=jnp.float32, mesh=None):
        self.config = config
        self.mesh = mesh
        c = config
        hw = (c.data.image_height, c.data.image_width)
        self.models, self.plans, self.variables = {}, {}, {}
        for i, arch_idx in enumerate(c.arch_idx):
            path = os.path.join(arch_dir, f"arch_{arch_idx}.npz")
            if not os.path.exists(path):
                path = os.path.join(arch_dir, f"arch_{arch_idx}.pt")
            model, variables, plan, lasts = build_model_from_arch(
                c, path, arch_idx, c.stem_head_width[i],
                jax.random.PRNGKey(c.seed + arch_idx), hw, dtype)
            self.models[arch_idx] = model
            self.plans[arch_idx] = plan
            self.variables[arch_idx] = variables
            logger.info("arch %d: lasts=%s ops=%s", arch_idx, lasts,
                        [g.ops for g in plan.genotypes])

        self.is_student = len(c.arch_idx) > 1
        self.student_idx = c.arch_idx[-1]
        self.tx = make_optimizer(c.lr, c.momentum, c.weight_decay,
                                 c.lr_decay, c.niters_per_epoch)
        self.state = create_train_state(self.variables[self.student_idx],
                                        self.tx)
        teacher_model = self.models[0] if self.is_student else None
        step = make_train_step(
            self.models[self.student_idx], self.tx,
            teacher_model=teacher_model,
            min_kept=c.min_kept(), ignore_label=c.data.ignore_label,
            aux_weight=c.aux_weight, num_classes=c.data.num_classes)
        if mesh is not None:
            from ..parallel import batch_sharding, replicated
            assert c.data.batch_size % mesh.devices.size == 0, (
                f"global batch {c.data.batch_size} must divide over "
                f"{mesh.devices.size} devices")
            self._repl = replicated(mesh)
            self._data = batch_sharding(mesh)
            self.state = jax.device_put(self.state, self._repl)
            self.variables = {k: jax.device_put(v, self._repl)
                              for k, v in self.variables.items()}
            shard_in = ((self._repl, self._data, self._data, self._repl)
                        if self.is_student
                        else (self._repl, self._data, self._data))
            self.step_fn = jax.jit(step, in_shardings=shard_in,
                                   out_shardings=(self._repl, self._repl))
        else:
            self.step_fn = jax.jit(step)
        self.metric = SegMetrics(c.data.num_classes)

    def load_teacher_weights(self, ckpt_path: str):
        """Frozen teacher for distillation (train.py:124-129)."""
        loaded = load_pytree(ckpt_path)
        tv = self.variables[0]
        new = {
            "params": partial_load(tv["params"], loaded.get("params", {})),
            "batch_stats": partial_load(tv["batch_stats"],
                                        loaded.get("batch_stats", {})),
        }
        if self.mesh is not None:
            new = jax.device_put(new, self._repl)
        self.variables[0] = new

    def train_epoch(self, loader, epoch: int, niters: int):
        loader.seek(epoch)  # batch sequence = f(epoch) -> exact resume
        it = iter(loader)
        teacher_vars = self.variables[0] if self.is_student else None
        self.metric.reset()
        loss = None
        for _ in range(niters):
            x, y = next(it)
            x, y = jnp.asarray(x), jnp.asarray(y)
            if self.mesh is not None:
                x = jax.device_put(x, self._data)
                y = jax.device_put(y, self._data)
            if teacher_vars is not None:
                self.state, m = self.step_fn(self.state, x, y, teacher_vars)
            else:
                self.state, m = self.step_fn(self.state, x, y)
            self.metric.update(np.asarray(m["inter"]), np.asarray(m["union"]))
            loss = m["loss"]
        return {"loss": float(loss), "train_mIoU": self.metric.get_scores()}

    def student_variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def evaluate(self, val_dataset, max_items=None, mesh=None,
                 spatial: bool = False):
        """`mesh` overrides the session mesh for eval only; `spatial=True`
        H-partitions each image across it (batch-1 full-res protocol,
        SURVEY.md §5.7) instead of sharding the batch."""
        model = self.models[self.student_idx]

        def fwd(variables, images):
            return model.apply(variables, images, train=False)
        ev = Evaluator(val_dataset, self.config.data.num_classes,
                       self.config.data.image_mean,
                       self.config.data.image_std, fwd,
                       eval_scales=self.config.eval.eval_scale_array,
                       eval_flip=self.config.eval.eval_flip,
                       mesh=self.mesh if mesh is None else mesh,
                       spatial=spatial)
        return ev.run(self.student_variables(), max_items=max_items)

    def save(self, save_dir: str, epoch: Optional[int] = None):
        os.makedirs(save_dir, exist_ok=True)
        save_pytree(os.path.join(save_dir,
                                 f"weights{self.student_idx}_ckpt"),
                    self.student_variables())
        if epoch is not None:
            save_pytree(os.path.join(save_dir, "resume_ckpt"),
                        self._resume_payload(epoch))

    def _resume_payload(self, epoch: int):
        """Full TrainState incl. optimizer state (so the x0.992/epoch LR
        schedule resumes at its exact position — the reference never
        checkpointed this, SURVEY.md §5.4) + epoch cursor."""
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "epoch": np.asarray(epoch, np.int32)}

    def restore(self, save_dir: str) -> int:
        """Restore a full training state; returns the next epoch to run
        (0 if no resume checkpoint exists)."""
        path = os.path.join(save_dir, "resume_ckpt")
        if not os.path.exists(path):
            return 0
        loaded = load_pytree(path, target=self._resume_payload(0))
        self.state = self.state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"], step=loaded["step"])
        return int(loaded["epoch"]) + 1


def write_test_predictions(session: TrainSession, dataset, out_dir: str,
                           max_items: Optional[int] = None,
                           remap=Cityscapes.train_id_to_label_id):
    """Submission writer: predict, remap train ids, write PNGs
    (train/test.py:60-69). `remap` defaults to the Cityscapes
    trainId->official-labelId map; pass the schema's own map (or None
    for identity) for other datasets — the CLI wires this from
    --dataset."""
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    model = session.models[session.student_idx]
    variables = session.student_variables()

    @jax.jit
    def predict(v, x):
        return jnp.argmax(model.apply(v, x, train=False), -1)

    n = min(len(dataset), max_items or len(dataset))
    for i in range(n):
        s = dataset[i]
        img = eval_preprocess(s["data"], session.config.data.image_mean,
                              session.config.data.image_std)
        pred = np.asarray(predict(variables, img[None]))[0].astype(np.uint8)
        if remap is not None:
            pred = remap(pred)
        name = os.path.splitext(os.path.basename(s["fn"]))[0] + ".png"
        cv2.imwrite(os.path.join(out_dir, name), pred)


def run_train(config: TrainConfig, arch_dir: str, val_dataset=None,
              epochs: Optional[int] = None, niters: Optional[int] = None,
              save_dir: Optional[str] = None,
              teacher_ckpt: Optional[str] = None,
              resume: bool = False,
              dataset_cls=Cityscapes, mesh=None) -> TrainSession:
    """Full driver (train.py:42-216). `mesh`: data-parallel SPMD over
    the mesh's first axis (batches shard, params replicate)."""
    session = TrainSession(config, arch_dir, mesh=mesh)
    if session.is_student and teacher_ckpt:
        session.load_teacher_weights(teacher_ckpt)
    start_epoch = 0
    if resume and save_dir:
        start_epoch = session.restore(save_dir)
        if start_epoch:
            logger.info("resumed from %s at epoch %d", save_dir, start_epoch)

    if config.is_eval:
        assert val_dataset is not None
        res = session.evaluate(val_dataset)
        logger.info("eval-only: %s", res)
        return session

    loader = get_train_loader(config, dataset_cls, test=config.is_test)
    epochs = epochs or config.nepochs
    niters = niters or config.niters_per_epoch
    for epoch in range(start_epoch, epochs):
        stats = session.train_epoch(loader, epoch, niters)
        logger.info("epoch %d: %s", epoch, stats)
        if val_dataset is not None and (epoch + 1) % config.eval_every == 0:
            res = session.evaluate(val_dataset)
            logger.info("epoch %d val: %s", epoch, res)
        if save_dir:
            session.save(save_dir, epoch)
    loader.close()
    return session
