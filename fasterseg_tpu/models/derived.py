"""Derived (decoded) multi-branch segmentation network.

TPU-native equivalent of `Network_Multi_Path_Infer`
(/root/reference/train/model_seg.py:174-408): a static `NetworkPlan`
(core/plan.py) drives construction — merged-branch cells execute once per
group, then BiSeNet-style aggregation (ARM 1x1 -> align-corners upsample ->
concat skip -> refine 3x3), FeatureFusion, and classification heads.

Differences from the reference, by design:
* NHWC + configurable compute dtype (bf16 for speed; f32 params).
* Aux heads (1/16, 1/32) are traced only when `train=True`, mirroring the
  torch code's `self.training`-conditional construction
  (model_seg.py:215-224). Initialize with `train=True` (see
  `create_derived`) so all parameters exist; the eval path simply leaves
  the aux-head params unused.
* Everything is shape-static and jit-compiles to one XLA program.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.plan import NetworkPlan, num_filters
from ..ops.conv import ConvNorm
from ..ops.primitives import make_op, BasicResidual2x
from ..ops.resize import resize_bilinear, scale_by
from ..ops.seg_heads import FeatureFusion, Head


class Stem(nn.Module):
    """Three stride-2 stages: 1/1 -> 1/8 (model_seg.py:192-196)."""

    Fch: int
    stem_width: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = lambda s: num_filters(s, self.Fch, self.stem_width)
        x = ConvNorm(nf(2) * 2, kernel_size=3, stride=2, padding=1,
                     dtype=self.dtype, name="stage0")(x, train)
        x = BasicResidual2x(nf(4) * 2, stride=2, dtype=self.dtype,
                            name="stage1")(x, train)
        x = BasicResidual2x(nf(8), stride=2, dtype=self.dtype,
                            name="stage2")(x, train)
        return x


class DerivedNet(nn.Module):
    """Plan-driven inference/training network."""

    plan: NetworkPlan
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stem_out=None,
                 upsample: bool = True):
        """`stem_out` (optional): externally computed stem features —
        the fused Pallas fast-stem path (models/infer.py) injects them
        here, bypassing the in-graph stem. `upsample=False` returns
        eval logits at 1/8 resolution for the fused serving head."""
        plan = self.plan
        B = plan.num_branch
        hw = plan.head_width()
        nf = lambda s, w=1.0: num_filters(s, plan.Fch, w)

        if stem_out is None:
            x = x.astype(self.dtype)
            stem = Stem(plan.Fch, plan.stem_head_width[0], dtype=self.dtype,
                        name="stem")(x, train)
        else:
            stem = stem_out.astype(self.dtype)

        # latest feature per branch, plus last-seen feature at each scale
        outputs = [stem] * B
        by_scale = {8: [stem] * B, 16: [stem] * B, 32: [stem] * B}

        cell_specs = {(c.layer, c.branch): c for c in plan.cells}
        for layer, groups in enumerate(plan.branch_groups):
            for group in groups:
                spec = cell_specs[(layer, group[0])]
                cell = make_op(spec.op, spec.c_out, 2 if spec.down else 1,
                               dtype=self.dtype,
                               name=f"cell_{layer}_{group[0]}")
                out = cell(outputs[group[0]], train)
                out_scale = spec.scale * (2 if spec.down else 1)
                for b in group:
                    outputs[b] = out
                    by_scale[out_scale][b] = out

        # ---- BiSeNet aggregation (model_seg.py:298-335) ----
        pred8, pred16, pred32 = [], [], []
        if 2 in plan.lasts:
            arms32 = [
                ConvNorm(nf(16, hw), kernel_size=1, dtype=self.dtype,
                         name="arms32_0"),
                ConvNorm(nf(8, hw), kernel_size=1, dtype=self.dtype,
                         name="arms32_1"),
            ]
            refines32 = [
                ConvNorm(nf(16, hw), kernel_size=3, padding=1,
                         dtype=self.dtype, name="refines32_0"),
                ConvNorm(nf(8, hw), kernel_size=3, padding=1,
                         dtype=self.dtype, name="refines32_1"),
            ]
        if 1 in plan.lasts:
            arms16 = ConvNorm(nf(8, hw), kernel_size=1, dtype=self.dtype,
                              name="arms16")
            refines16 = ConvNorm(nf(8, hw), kernel_size=3, padding=1,
                                 dtype=self.dtype, name="refines16")

        for b, last in enumerate(plan.lasts):
            if last == 2:
                o32, o16, o8 = by_scale[32][b], by_scale[16][b], by_scale[8][b]
                if train:
                    pred32.append(o32)
                out = arms32[0](o32, train)
                out = resize_bilinear(out, (o16.shape[-3], o16.shape[-2]))
                out = refines32[0](jnp.concatenate([out, o16], -1), train)
                if train:
                    pred16.append(o16)
                out = arms32[1](out, train)
                out = resize_bilinear(out, (o8.shape[-3], o8.shape[-2]))
                out = refines32[1](jnp.concatenate([out, o8], -1), train)
                pred8.append(out)
            elif last == 1:
                o16, o8 = by_scale[16][b], by_scale[8][b]
                if train:
                    pred16.append(o16)
                out = arms16(o16, train)
                out = resize_bilinear(out, (o8.shape[-3], o8.shape[-2]))
                out = refines16(jnp.concatenate([out, o8], -1), train)
                pred8.append(out)
            else:
                pred8.append(by_scale[8][b])

        ffm = FeatureFusion(plan.ffm_channels, dtype=self.dtype, name="ffm")
        heads8 = Head(plan.num_classes, is_aux=False, dtype=self.dtype,
                      name="heads8")
        p8 = heads8(ffm(jnp.concatenate(pred8, -1), train), train)

        if train:
            # aux heads exist only when their scale is produced
            p16 = p32 = None
            if 2 in plan.lasts:
                p32 = Head(plan.num_classes, is_aux=True, dtype=self.dtype,
                           name="heads32")(jnp.concatenate(pred32, -1), train)
            if pred16:
                p16 = Head(plan.num_classes, is_aux=True, dtype=self.dtype,
                           name="heads16")(jnp.concatenate(pred16, -1), train)
            p8 = scale_by(p8.astype(jnp.float32), 8)
            if p16 is not None:
                p16 = scale_by(p16.astype(jnp.float32), 16)
            if p32 is not None:
                p32 = scale_by(p32.astype(jnp.float32), 32)
            return p8, p16, p32

        # eval: x8 align-corners upsample in compute dtype; callers cast
        if not upsample:
            return p8
        return scale_by(p8, 8)


def create_derived(plan: NetworkPlan, rng, input_hw: Tuple[int, int] = (512, 1024),
                   dtype: Any = jnp.float32):
    """Build a DerivedNet and initialize all parameter collections.

    Initializes with `train=True` so aux-head params and batch stats are
    created; returns (model, variables)."""
    model = DerivedNet(plan=plan, dtype=dtype)
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    variables = model.init(rng, dummy, train=True)
    return model, variables
