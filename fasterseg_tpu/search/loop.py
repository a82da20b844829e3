"""Search engine: supernet pretrain + bi-level architecture search.

Equivalent of search/train_search.py. Per step (train_search.py:223-253):
arch step on a held-out half-split batch (Architect), then a weight step
(SGD momentum, grad-clip 5) on the supernet multi-forward loss
(model_search.py:478-505):

  search  : per-arch Gumbel-width forward + max-width + min-width passes
  pretrain: max + min + 2x random width passes (the universally-slimmable
            "sandwich rule"), no arch updates

Per epoch: validation of all 5 heads, decoded-architecture FPS estimate
(arch_logging, train_search.py:274-303), checkpointing, and the FPS-band
latency-weight controller.

Reference quirks replicated deliberately:
* pretrain sandwich passes run with arch_idx=0 (the reference never moves
  arch_idx during pretrain); search-phase max/min passes run with the last
  arch (train_search loop leaves arch_idx at 1).
Deviation: validation samples the student's Gumbel widths once per
validation pass rather than per image (the reference resamples per
forward via global RNG) — the estimate is equally stochastic.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import SearchConfig
from ..core.genotype import ArchParams, decode_network
from ..core.plan import build_plan
from ..data import SyntheticDataset, get_train_loader
from ..latency import (LatencyLUT, TpuCostModel, build_supernet_tables,
                       derived_latency_ms, stem_latency_ms)
from ..models.supernet import ArchParamsPytree, Supernet, init_supernet
from ..train.loss import ohem_cross_entropy
from ..train.loop import TrainState
from ..utils.checkpoint import save_arch, save_pytree
from .architect import (LatencyWeightController, latency_terms,
                        make_arch_optimizer)
from .gumbel import sample_ratios

logger = logging.getLogger("fasterseg_tpu.search")


class SearchEngine:
    """With `mesh`, pretrain/search run data-parallel over the mesh's
    first axis (SURVEY.md §2.6/§5.8): supernet weights, arch params and
    both optimizer states replicate; batches shard; the jitted steps'
    in/out shardings make XLA insert weight- AND arch-gradient
    all-reduces plus global (sync) BN statistic reductions over ICI."""

    def __init__(self, config: SearchConfig, lut: Optional[LatencyLUT] = None,
                 dtype=None, input_hw=None, mesh=None):
        self.config = config
        self.mesh = mesh
        c = config
        if dtype is None:
            dtype = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
                     else jnp.float32)
        self.wml = tuple(c.width_mult_list)
        self.nw = len(self.wml)
        self.prun_modes = tuple(c.prun_modes)
        self.num_widths_per_arch = [
            self.nw if m == "arch_ratio" else 1 for m in self.prun_modes]
        self.input_hw = input_hw or (c.data.image_height, c.data.image_width)

        self.model = Supernet(
            layers=c.layers, num_classes=c.num_classes, Fch=c.Fch,
            width_mult_list=self.wml, stem_head_width=tuple(c.stem_head_width),
            dtype=dtype, remat=c.supernet_remat)
        variables = init_supernet(self.model, jax.random.PRNGKey(c.seed),
                                  self.input_hw, self.num_widths_per_arch)
        self.arch_params: Dict[int, ArchParamsPytree] = {
            i: ArchParamsPytree.create(c.layers, num_widths=nwi)
            for i, nwi in enumerate(self.num_widths_per_arch)}

        # weight optimizer (train_search.py:83-101)
        lr = 2e-2 if c.pretrain else c.lr
        steps = c.niters_per_epoch(bool(c.pretrain))
        schedule = optax.exponential_decay(lr, steps, c.lr_decay,
                                           staircase=True)
        self.weight_tx = optax.chain(
            optax.add_decayed_weights(c.weight_decay),
            optax.sgd(schedule, momentum=c.momentum))
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.weight_tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32))

        # arch optimizer (architect.py:22-24)
        self.arch_tx = make_arch_optimizer(c.arch_learning_rate)
        self.arch_opt_state = self.arch_tx.init(self.arch_params)

        # latency tables (architect latency input, architect.py:66)
        self.lut = lut or LatencyLUT(provider=TpuCostModel().provider)
        tables = build_supernet_tables(self.lut, c.layers, c.Fch, self.wml,
                                       c.latency_input_hw)
        self.tables = {k: jnp.asarray(v) for k, v in tables.items()}
        self.stem_ms = [stem_latency_ms(self.lut, c.Fch, shw[0],
                                        c.latency_input_hw)
                        for shw in c.stem_head_width]
        self.stem_pins = [self.model.width_pin(shw[0])
                          for shw in c.stem_head_width]
        self.head_pins = [self.model.width_pin(shw[1])
                          for shw in c.stem_head_width]

        self.controller = LatencyWeightController(
            c.latency_weight, c.fps_min, c.fps_max)
        self.min_kept = c.min_kept(bool(c.pretrain))
        self._jits = {}
        self.metrics_log: List[dict] = []

        self._repl = self._data = None
        if mesh is not None:
            from ..parallel import batch_sharding, replicated
            bs = c.pretrain_batch_size if c.pretrain else c.data.batch_size
            assert bs % mesh.devices.size == 0, (
                f"global batch {bs} must divide over "
                f"{mesh.devices.size} devices")
            self._repl = replicated(mesh)
            self._data = batch_sharding(mesh)
            self.state = jax.device_put(self.state, self._repl)
            self.arch_params = jax.device_put(self.arch_params, self._repl)
            self.arch_opt_state = jax.device_put(self.arch_opt_state,
                                                 self._repl)

    # ---------------- losses and steps ----------------

    def supernet_loss(self, params, batch_stats, x, y, arch_params, key,
                      pretrain: bool):
        """model_search.py:478-505 multi-forward loss; returns
        (loss, new_batch_stats).

        The 3-4 forwards per step differ only in their (traced) width
        samples when they share an arch_idx, so consecutive same-arch
        forwards run as ONE lax.scan over stacked samples — the supernet
        body is traced once per arch instead of once per forward,
        cutting program size (and TPU compile time) another ~3-4x on top
        of the layer scan. Batch-stats chaining stays sequential through
        the scan carry, exactly like the reference's forward order.
        """
        crit = functools.partial(ohem_cross_entropy, ignore_label=255,
                                 thresh=0.7, min_kept=self.min_kept)
        stats = batch_stats
        total = jnp.float32(0.0)
        n_arch = len(arch_params)
        keys = jax.random.split(key, n_arch + 4)

        def fwd(arch_idx, ap, ratios, stats):
            preds, mut = self.model.apply(
                {"params": params, "batch_stats": stats}, x, arch_idx,
                ap.alphas, ap.betas, ratios, train=True,
                mutable=["batch_stats"])
            return (sum(crit(p, y) for p in preds),
                    mut["batch_stats"])

        def fwd_group(arch_idx, ap, ratios_list, stats):
            """Consecutive same-arch forwards as one scan over samples."""
            if len(ratios_list) == 1:
                return fwd(arch_idx, ap, ratios_list[0], stats)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ratios_list)

            def body(stats, ratios):
                loss, new_stats = fwd(arch_idx, ap, ratios, stats)
                return new_stats, loss

            stats, losses = jax.lax.scan(body, stats, stacked)
            return jnp.sum(losses), stats

        # build the forward list: (arch_idx, ratio samples), ref order
        forwards = []
        if not pretrain:
            for idx in range(n_arch):
                forwards.append((idx, sample_ratios(
                    keys[idx], arch_params[idx].ratios,
                    self.prun_modes[idx], self.nw)))
        if self.nw > 1:
            sandwich_arch = 0 if pretrain else n_arch - 1
            modes = ["max", "min"] + (["random", "random"] if pretrain else [])
            for m, mode in enumerate(modes):
                forwards.append((sandwich_arch, sample_ratios(
                    keys[n_arch + m], arch_params[sandwich_arch].ratios,
                    mode, self.nw)))
        elif pretrain:
            forwards.append((0, sample_ratios(
                keys[-1], arch_params[0].ratios, "max", self.nw)))

        # group consecutive same-arch forwards
        i = 0
        while i < len(forwards):
            idx = forwards[i][0]
            j = i
            while j < len(forwards) and forwards[j][0] == idx:
                j += 1
            l, stats = fwd_group(idx, arch_params[idx],
                                 [r for _, r in forwards[i:j]], stats)
            total = total + l
            i = j
        return total, stats

    def _weight_step(self, pretrain: bool):
        key = ("weight", pretrain)
        if key in self._jits:
            return self._jits[key]

        def step(state: TrainState, arch_params, x, y, rng):
            def loss_fn(params):
                return self.supernet_loss(params, state.batch_stats, x, y,
                                          arch_params, rng, pretrain)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads, _ = optax.clip_by_global_norm(
                self.config.grad_clip).update(grads, None)
            updates, opt = self.weight_tx.update(grads, state.opt_state,
                                                 state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, batch_stats=new_stats,
                                 opt_state=opt, step=state.step + 1), loss

        # donate the 252M-param state: in-place update halves peak HBM
        kw = {}
        if self.mesh is not None:
            kw = dict(in_shardings=(self._repl, self._repl, self._data,
                                    self._data, self._repl),
                      out_shardings=(self._repl, self._repl))
        self._jits[key] = jax.jit(step, donate_argnums=(0,), **kw)
        return self._jits[key]

    def _arch_step(self):
        if "arch" in self._jits:
            return self._jits["arch"]

        def loss_fn(arch_params, params, stats, x, y, rng, lat_w):
            k1, k2 = jax.random.split(rng)
            loss, new_stats = self.supernet_loss(params, stats, x, y,
                                                 arch_params, k1, False)
            lat_keys = jax.random.split(k2, len(arch_params))
            lats = latency_terms(self.tables, self.stem_ms, arch_params,
                                 lat_keys, self.config.layers, self.nw,
                                 self.prun_modes, self.stem_pins,
                                 self.head_pins)
            loss_lat = sum(lat_w[i] * l for i, l in lats.items())
            supernet_ms = lats[len(lats) - 1]
            return loss + loss_lat, (new_stats, loss, loss_lat, supernet_ms)

        def step(arch_params, arch_opt, params, stats, x, y, rng, lat_w):
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                arch_params, params, stats, x, y, rng, lat_w)
            new_stats, loss, loss_lat, sup_ms = aux
            updates, arch_opt = self.arch_tx.update(grads, arch_opt,
                                                    arch_params)
            arch_params = jax.tree.map(
                lambda p, u: p + u, arch_params, updates)
            return arch_params, arch_opt, new_stats, {
                "loss_arch": loss, "loss_latency": loss_lat,
                "latency_supernet_ms": sup_ms}

        # arch params/opt are tiny but donating avoids copies anyway
        kw = {}
        if self.mesh is not None:
            kw = dict(in_shardings=(self._repl, self._repl, self._repl,
                                    self._repl, self._data, self._data,
                                    self._repl, self._repl),
                      out_shardings=self._repl)
        self._jits["arch"] = jax.jit(step, donate_argnums=(0, 1), **kw)
        return self._jits["arch"]

    # ---------------- epoch orchestration ----------------

    def train_epoch(self, loader_model, loader_arch, epoch: int,
                    pretrain: bool, update_arch: bool,
                    niters: Optional[int] = None):
        niters = niters or self.config.niters_per_epoch(pretrain)
        wstep = self._weight_step(pretrain)
        astep = self._arch_step() if update_arch else None
        # batches are keyed (seed, epoch, step, slot): seeking makes the
        # sequence a pure function of the epoch -> exact resume
        loader_model.seek(epoch)
        if update_arch:
            loader_arch.seek(epoch)
        it_model = iter(loader_model)
        it_arch = iter(loader_arch) if update_arch else None
        base = jax.random.PRNGKey(self.config.seed + 1)
        last = {}

        def place(x, y):
            x, y = jnp.asarray(x), jnp.asarray(y)
            if self.mesh is not None:
                x = jax.device_put(x, self._data)
                y = jax.device_put(y, self._data)
            return x, y

        for step in range(niters):
            rng = jax.random.fold_in(base, epoch * niters + step)
            if update_arch:
                xa, ya = place(*next(it_arch))
                lat_w = jnp.asarray(self.controller.weights, jnp.float32)
                self.arch_params, self.arch_opt_state, new_stats, am = astep(
                    self.arch_params, self.arch_opt_state, self.state.params,
                    self.state.batch_stats, xa, ya, rng, lat_w)
                self.state = self.state.replace(batch_stats=new_stats)
                last.update({k: float(v) for k, v in am.items()})
            x, y = place(*next(it_model))
            self.state, loss = wstep(self.state, self.arch_params, x, y,
                                     jax.random.fold_in(rng, 1))
            last["loss"] = float(loss)
        self.metrics_log.append({"epoch": epoch, **last})
        return last

    # ---------------- validation / decode / fps ----------------

    def _eval_program(self, arch_idx: int):
        """One jit: image batch + width samples -> per-head confusion
        hists. Evaluating all 5 heads in one forward (vs the reference's
        5 separate eval passes, train_search.py:260-266) and passing the
        ratio samples as traced args keeps this a single compile."""
        key = ("eval", arch_idx)
        if key in self._jits:
            return self._jits[key]
        ap_struct = self.arch_params[arch_idx]

        from ..eval.metrics import confusion_hist

        def program(variables, images, labels, alphas, betas, ratios):
            preds = self.model.apply(variables, images, arch_idx,
                                     alphas, betas, ratios, train=False)
            hists = []
            for p in preds:
                pred = jnp.argmax(p, axis=-1).astype(jnp.int32)
                hists.append(confusion_hist(pred, labels,
                                            self.config.num_classes))
            return jnp.stack(hists)

        self._jits[key] = jax.jit(program)
        return self._jits[key]

    def validate(self, val_dataset, arch_idx: int, prun_mode=None,
                 max_items: Optional[int] = None) -> List[float]:
        """mIoU of all five heads (train_search.py:260-271)."""
        from ..data.preprocess import eval_preprocess
        from ..eval.metrics import compute_score

        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        ap = self.arch_params[arch_idx]
        mode = prun_mode or self.prun_modes[arch_idx]
        ratios = sample_ratios(jax.random.PRNGKey(0), ap.ratios, mode,
                               self.nw)
        program = self._eval_program(arch_idx)
        n = min(len(val_dataset), max_items or len(val_dataset))
        hists = np.zeros((5, self.config.num_classes,
                          self.config.num_classes), np.int64)
        for i in range(n):
            s = val_dataset[i]
            img = eval_preprocess(s["data"], self.config.data.image_mean,
                                  self.config.data.image_std)
            h = program(variables, jnp.asarray(img[None]),
                        jnp.asarray(s["label"][None].astype(np.int32)),
                        ap.alphas, ap.betas, ratios)
            hists += np.asarray(h, np.int64)
        return [compute_score(hists[k])[1] for k in range(5)]

    def numpy_arch(self, arch_idx: int) -> ArchParams:
        ap = self.arch_params[arch_idx]
        return ArchParams(
            alphas=[np.asarray(a, np.float64) for a in ap.alphas],
            betas=[None, np.asarray(ap.betas[1], np.float64),
                   np.asarray(ap.betas[2], np.float64)],
            ratios=[np.asarray(r, np.float64) for r in ap.ratios])

    def arch_fps(self, arch_idx: int):
        """Decoded-net FPS estimates for branch pairs [2,0] and [2,1]
        (arch_logging, train_search.py:274-303)."""
        c = self.config
        arch = self.numpy_arch(arch_idx)
        genos = decode_network(arch, self.wml, c.layers, ignore_skip=False)
        fps = []
        for lasts in ([2, 0], [2, 1]):
            plan = build_plan(genos, lasts, Fch=c.Fch,
                              num_classes=c.num_classes,
                              stem_head_width=c.stem_head_width[arch_idx])
            ms = derived_latency_ms(self.lut, plan, c.latency_input_hw)
            fps.append(1000.0 / ms)
        return fps[0], fps[1]

    # ---------------- persistence ----------------

    def load_weights(self, ckpt_dir: str):
        """Partial-match transfer of pretrained supernet weights
        (train_search.py:70-75: filter by key & shape)."""
        from ..utils.checkpoint import load_pytree, partial_load
        path = os.path.join(ckpt_dir, "weights_ckpt")
        loaded = load_pytree(path if os.path.exists(path) else ckpt_dir)
        self.state = self.state.replace(
            params=partial_load(self.state.params,
                                loaded.get("params", {})),
            batch_stats=partial_load(self.state.batch_stats,
                                     loaded.get("batch_stats", {})))

    def _resume_payload(self, epoch: int):
        """Everything a bit-exact resume needs: weights, BOTH optimizer
        states (incl. the LR-schedule step counts), arch params, the
        FPS-band controller's latency weights, and the epoch cursor.
        Fixes the reference flaw of never checkpointing optimizer state
        (SURVEY.md §5.4: resume restarted LR schedules)."""
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "arch_params": self.arch_params,
            "arch_opt_state": self.arch_opt_state,
            "controller_weights": np.asarray(self.controller.weights,
                                             np.float64),
            "epoch": np.asarray(epoch, np.int32),
        }

    def restore(self, save_dir: str) -> int:
        """Restore a full search/pretrain state; returns the next epoch
        to run (0 if no resume checkpoint exists)."""
        from ..utils.checkpoint import load_pytree
        path = os.path.join(save_dir, "resume_ckpt")
        if not os.path.exists(path):
            return 0
        loaded = load_pytree(path, target=self._resume_payload(0))
        self.state = self.state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"], step=loaded["step"])
        self.arch_params = loaded["arch_params"]
        self.arch_opt_state = loaded["arch_opt_state"]
        self.controller.weights = [
            float(w) for w in np.asarray(loaded["controller_weights"])]
        return int(loaded["epoch"]) + 1

    def save(self, save_dir: str, epoch: int, metrics: Optional[dict] = None):
        """`metrics` maps arch_idx -> {mIoU02, latency02, mIoU12,
        latency12} so each arch npz carries its OWN numbers. (The
        reference saves loop-stale values: train_search.py:185-202
        stamps the last arch's mIoUs/fps into every arch_{idx}.pt, and
        train.py:102-105 then selects branches on the wrong arch's
        metrics — a quirk we fix rather than replicate; PARITY.md.)
        A flat {mIoU02, ...} dict is accepted and applied to every arch."""
        os.makedirs(save_dir, exist_ok=True)
        save_pytree(os.path.join(save_dir, f"weights_ckpt"),
                    {"params": self.state.params,
                     "batch_stats": self.state.batch_stats})
        save_pytree(os.path.join(save_dir, "resume_ckpt"),
                    self._resume_payload(epoch))
        metrics = metrics or {}
        for idx in range(len(self.arch_params)):
            per_arch = metrics.get(idx)
            m = per_arch if isinstance(per_arch, dict) else metrics
            arch = self.numpy_arch(idx)
            for path in (os.path.join(save_dir, f"arch_{idx}.npz"),
                         os.path.join(save_dir, f"arch_{idx}_{epoch}.npz")):
                save_arch(path, arch,
                          mIoU02=m.get("mIoU02"), latency02=m.get("latency02"),
                          mIoU12=m.get("mIoU12"), latency12=m.get("latency12"))


def run_search(config: SearchConfig, val_dataset=None, epochs=None,
               niters=None, save_dir=None, max_eval_items=None,
               lut: Optional[LatencyLUT] = None,
               plot_genotypes: bool = False,
               resume: bool = False, mesh=None,
               dataset_cls=None, save_every: int = 1) -> SearchEngine:
    """Full driver (train_search.py:36-212): pretrain when config.pretrain
    is True, otherwise bi-level search with latency control. Scalars go
    to save_dir/metrics.jsonl (+ TensorBoard when available); with
    plot_genotypes, per-epoch genotype figures are rendered like the
    reference's arch_logging (train_search.py:274-303)."""
    pretrain = bool(config.pretrain)
    update_arch = not pretrain
    engine = SearchEngine(config, lut=lut, mesh=mesh)
    start_epoch = 0
    if resume and save_dir:
        start_epoch = engine.restore(save_dir)
        if start_epoch:
            logger.info("resumed from %s at epoch %d", save_dir, start_epoch)
    if start_epoch == 0 and not pretrain and config.load_path:
        engine.load_weights(config.load_path)
    writer = None
    if save_dir:
        from ..utils.logging import MetricWriter
        writer = MetricWriter(save_dir)

    # one shared shuffled permutation -> balanced disjoint weight/arch
    # halves (train_search.py:109-112)
    perm = None
    if not config.data.synthetic:
        perm = list(np.random.default_rng(config.seed).permutation(
            config.data.num_train_imgs))
    from ..data import Cityscapes
    dataset_cls = dataset_cls or Cityscapes
    loader_model = get_train_loader(config, dataset_cls,
                                    portion=config.train_portion,
                                    index_select=perm)
    loader_arch = get_train_loader(config, dataset_cls,
                                   portion=config.train_portion - 1,
                                   index_select=perm)
    if val_dataset is None:
        # dataset-free smoke: a tiny synthetic val set; with real data
        # the FULL val set is used unless max_eval_items caps it
        val_dataset = SyntheticDataset(
            length=max_eval_items or 8,
            hw=(config.eval.eval_height, config.eval.eval_width),
            num_classes=config.num_classes)

    valid_names = ("8s", "16s", "32s", "8s_32s", "16s_32s")
    epochs = epochs or config.nepochs
    for epoch in range(start_epoch, epochs):
        stats = engine.train_epoch(loader_model, loader_arch, epoch,
                                   pretrain, update_arch, niters=niters)
        logger.info("epoch %d: %s", epoch, stats)
        if writer:
            for k, v in stats.items():
                writer.add_scalar(f"train/{k}", v, epoch)

        metrics = {}
        if pretrain:
            for mode in ("min", "max", "random"):
                mious = engine.validate(val_dataset, 0, prun_mode=mode,
                                        max_items=max_eval_items)
                logger.info("epoch %d pretrain val[%s]: %s", epoch, mode,
                            ["%.3f" % m for m in mious])
                if writer:
                    for i, m in enumerate(mious):
                        writer.add_scalar(
                            f"mIoU/val_{mode}_{valid_names[i]}", m, epoch)
        else:
            from ..core.plan import objective_acc_lat
            for idx in range(len(engine.arch_params)):
                name = "teacher" if idx == 0 else "student"
                mious = engine.validate(val_dataset, idx,
                                        max_items=max_eval_items)
                fps0, fps1 = engine.arch_fps(idx)
                metrics[idx] = {"mIoU02": mious[3], "mIoU12": mious[4],
                                "latency02": 1000.0 / fps0,
                                "latency12": 1000.0 / fps1}
                w = engine.controller.update(idx, fps0, fps1)
                logger.info("epoch %d arch %d val: %s fps=(%.1f, %.1f) "
                            "lat_w=%g", epoch, idx,
                            ["%.3f" % m for m in mious], fps0, fps1, w)
                if writer:
                    for i, m in enumerate(mious):
                        writer.add_scalar(
                            f"mIoU/val_{name}_{valid_names[i]}", m, epoch)
                    writer.add_scalar(f"arch/fps0_{name}", fps0, epoch)
                    writer.add_scalar(f"arch/fps1_{name}", fps1, epoch)
                    writer.add_scalar(f"arch/latency_weight_{name}", w,
                                      epoch + 1)
                    writer.add_scalar(
                        f"objective/val_{name}_8s_32s",
                        objective_acc_lat(mious[3], 1000.0 / fps0), epoch)
                    writer.add_scalar(
                        f"objective/val_{name}_16s_32s",
                        objective_acc_lat(mious[4], 1000.0 / fps1), epoch)
                if writer and plot_genotypes:
                    from ..core.genotype import decode_network
                    from ..utils.plotting import plot_op, plot_path_width
                    genos = decode_network(engine.numpy_arch(idx),
                                           engine.wml, config.layers)
                    for last, g in genos.items():
                        writer.add_figure(
                            f"arch/ops{last}_{name}",
                            plot_op(g.ops, g.path, g.widths, F_base=config.Fch),
                            epoch)
                    writer.add_figure(
                        f"arch/path_width_{name}",
                        plot_path_width(
                            [2, 1, 0],
                            [genos[2].path, genos[1].path, genos[0].path],
                            [genos[2].widths, genos[1].widths,
                             genos[0].widths]), epoch)
        if save_dir and ((epoch + 1) % save_every == 0
                         or epoch == epochs - 1):
            # a full orbax save blocks ~60s over the remote-TPU tunnel;
            # save_every>1 trades resume granularity for epoch time
            engine.save(save_dir, epoch, metrics)
    loader_model.close()
    loader_arch.close()
    return engine
