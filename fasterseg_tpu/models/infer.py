"""Optimized batch-1 inference: fused Pallas stem + XLA body.

The serving replacement for the reference's TensorRT engine
(SURVEY.md §2.5): eval-mode forward with the stem — ~70% of end-to-end
latency under this backend's XLA conv lowering — executed by the fused
channel-planar Pallas conv kernels (pallas/conv.py), the decoded cell
body/aggregation by XLA, and the fused upsample+argmax serving head
(pallas/fused.py) for class-map output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.plan import NetworkPlan
from ..pallas.conv import (conv3x3_bn_relu_planar, conv3x3s2_bn_relu_s2d,
                           fold_bn, nhwc_to_planar, planar_space_to_depth,
                           planar_to_nhwc, space_to_depth_planar)
from ..pallas.fused import upsample8_argmax
from .derived import DerivedNet


def _conv_bn(block_p, block_s, conv_name, bn_name):
    k = block_p[conv_name]["conv"]["kernel"]
    bn = block_p[bn_name]["bn"]
    st = block_s[bn_name]["bn"]
    scale, bias = fold_bn(bn["scale"], bn["bias"], st["mean"], st["var"])
    return k, scale, bias


def fast_stem(stem_params, stem_stats, x: jax.Array,
              dtype=jnp.bfloat16, planar_out: bool = False) -> jax.Array:
    """Run the 5 stem convs (ConvNorm + 2x BasicResidual2x,
    derived.Stem) via the fused planar kernels. x: (1, H, W, 3) ->
    (1, H/8, W/8, C_stem) NHWC, or ((H/8, C_pad, W/8), C_stem) planar
    when `planar_out` (the fully-planar fast-body path chains on it
    without leaving the kernel layout).

    Every stride-2 conv runs in space-to-depth formulation: the s2d
    layout is built by free views around one minor-dim transpose
    (space_to_depth_planar for the NHWC entry, planar_space_to_depth for
    the chained planar stages) and the 2x2-tap kernel runs the stride-2
    conv as a stride-1 stencil. This removes both the 16/3 sublane
    padding waste of the 3-channel entry (0.16 vs 0.53 ms measured at
    1024x2048) and the gather-lowered stride-2 lane slices the direct
    kernels' pre-shifted planes need (conv1/conv3: 0.33/0.15 ms)."""
    k, s, b = _conv_bn(stem_params["stage0"], stem_stats["stage0"],
                       "Conv_0", "BatchNorm_0")
    y = conv3x3s2_bn_relu_s2d(space_to_depth_planar(x.astype(dtype), 3),
                              k.astype(dtype), s, b)
    for stage in ("stage1", "stage2"):
        k, s, b = _conv_bn(stem_params[stage], stem_stats[stage],
                           "Conv_0", "BatchNorm_0")
        y = conv3x3s2_bn_relu_s2d(planar_space_to_depth(y),
                                  k.astype(dtype), s, b, packing="planar")
        k, s, b = _conv_bn(stem_params[stage], stem_stats[stage],
                           "Conv_1", "BatchNorm_1")
        y = conv3x3_bn_relu_planar(y, k.astype(dtype), s, b, stride=1)
    c_out = stem_params["stage2"]["Conv_1"]["conv"]["kernel"].shape[-1]
    if planar_out:
        return y, c_out
    return planar_to_nhwc(y, c_out)


class InferenceRunner:
    """Jitted eval-mode forwards of a derived network with the fused
    Pallas path (stem + body + aggregation, models/fast_body.py).

    .logits(v, x)   -> full-resolution class logits (reference contract)
    .classmap(v, x) -> full-resolution int32 class map via the fused
                       upsample+argmax head (never materializes full-res
                       logits in HBM)

    `fast_body_enabled=False` falls back to fused-stem + XLA body;
    `fast_stem_enabled=False` to the plain flax network.
    """

    def __init__(self, plan: NetworkPlan, variables, dtype=jnp.bfloat16,
                 fast_stem_enabled: bool = True,
                 fast_body_enabled: bool = True):
        from .fast_body import fast_body
        from ..ops.resize import scale_by

        self.plan = plan
        self.model = DerivedNet(plan=plan, dtype=dtype)
        self.variables = variables
        self.dtype = dtype
        self.fast_stem_enabled = fast_stem_enabled
        self.fast_body_enabled = fast_body_enabled and fast_stem_enabled

        def _stem(v, x, planar=False):
            if not self.fast_stem_enabled:
                return None
            return fast_stem(v["params"]["stem"], v["batch_stats"]["stem"],
                             x, dtype, planar_out=planar)

        def _p8(v, x):
            if self.fast_body_enabled:
                return fast_body(plan, v["params"], v["batch_stats"],
                                 _stem(v, x, planar=True), dtype)
            return self.model.apply(v, x.astype(dtype), train=False,
                                    stem_out=_stem(v, x), upsample=False)

        def logits_fn(v, x):
            if self.fast_body_enabled:
                return scale_by(_p8(v, x), 8)
            return self.model.apply(v, x.astype(dtype), train=False,
                                    stem_out=_stem(v, x))

        def classmap_fn(v, x):
            return upsample8_argmax(_p8(v, x),
                                    out_hw=(x.shape[1], x.shape[2]))

        # unjitted fns exposed for composition (e.g. the int8 runner
        # dequantizes weights inside its own jit, then calls these)
        self.logits_fn = logits_fn
        self.classmap_fn = classmap_fn
        self.logits = jax.jit(logits_fn)
        self.classmap = jax.jit(classmap_fn)
