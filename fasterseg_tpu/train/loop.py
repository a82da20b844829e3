"""Teacher/student training: optimizer, train state, jitted steps.

Equivalent of the reference train driver (train/train.py:219-271):

  student loss = OHEM(pred8) + 0.2*OHEM(pred16) + 0.2*OHEM(pred32)
               + KL(log_softmax(student8), softmax(teacher8))   [train.py:256-260]
  teacher loss = the same without the KL term (teacher trains first,
                 mode="teacher", config_train.py:78-91)
  optimizer    = SGD momentum 0.9, weight decay 5e-4 applied to the
                 gradient torch-style (train.py: optimizer setup), with
                 lr *= 0.992 per epoch (train.py:37-39,194).

The step is one jitted SPMD program: shard the batch over the mesh data
axis, keep params replicated, and XLA inserts gradient all-reduces and
global (sync) BN statistics automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .loss import ohem_cross_entropy, kl_distillation
from ..eval.metrics import batch_intersection_union


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 0.01, momentum: float = 0.9,
                   weight_decay: float = 5e-4, lr_decay: float = 0.992,
                   steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    """torch-SGD semantics: grad += wd*param, then momentum, then lr.
    lr decays x0.992 per epoch, staircase (train.py:37-39)."""
    schedule = optax.exponential_decay(
        init_value=lr, transition_steps=steps_per_epoch,
        decay_rate=lr_decay, staircase=True)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, tx: optax.GradientTransformation,
                    teacher_model=None,
                    min_kept: int = 131072, ignore_label: int = 255,
                    thresh: float = 0.7, aux_weight: float = 0.2,
                    num_classes: int = 19,
                    grad_clip: Optional[float] = None) -> Callable:
    """Build the jitted train step.

    step(state, images, labels[, teacher_vars]) -> (state, metrics).
    `teacher_vars` (frozen, eval-mode) enables KL distillation; the teacher
    never trains (train.py:225,250-252).
    """
    ohem = functools.partial(ohem_cross_entropy, ignore_label=ignore_label,
                             thresh=thresh, min_kept=min_kept)

    def step_fn(state: TrainState, images, labels, teacher_vars=None):
        def loss_fn(params):
            (p8, p16, p32), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            loss = ohem(p8, labels)
            if p16 is not None:
                loss = loss + aux_weight * ohem(p16, labels)
            if p32 is not None:
                loss = loss + aux_weight * ohem(p32, labels)
            loss_kl = jnp.float32(0.0)
            if teacher_vars is not None:
                t8 = teacher_model.apply(teacher_vars, images, train=False)
                loss_kl = kl_distillation(p8, jax.lax.stop_gradient(t8))
                loss = loss + loss_kl
            return loss, (mut["batch_stats"], p8, loss_kl)

        (loss, (new_stats, p8, loss_kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if grad_clip is not None:
            grads, _ = optax.clip_by_global_norm(grad_clip).update(grads, None)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        inter, union = batch_intersection_union(p8, labels, num_classes)
        metrics = {"loss": loss, "loss_kl": loss_kl,
                   "inter": inter, "union": union}
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    return step_fn


def make_eval_step(model) -> Callable:
    """eval step: full-res logits -> argmax class map (jittable)."""
    def eval_fn(variables, images):
        logits = model.apply(variables, images, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return eval_fn
