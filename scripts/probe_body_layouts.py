"""Measure candidate layouts for the remaining cell-body hot path.

VERDICT round-2 missing #6 asks to revisit body/aggregation fusion
"beyond the roofline argument" — i.e. with measurements. This probe
slope-times, at the decoded student's actual body shapes (cells run at
1/8..1/32 of 1024x2048 with 32..256 channels), the conv3x3+BN+ReLU
building block in three formulations:

  * xla_nhwc    — jitted XLA conv_general_dilated (what the body uses)
  * pallas_plnr — the channel-planar Pallas kernel (what the stem uses)
  * xla_nhwc_x2 — two chained convs in one jit (residual-block shape;
                  measures XLA's own producer fusion headroom)

Run ON THE TPU (scripts/tpu_return.sh runs it when the tunnel revives):

  python scripts/probe_body_layouts.py  ->  artifacts/body_probe.json

Reading the result: if pallas_plnr beats xla_nhwc at a shape, porting
that cell chain to the planar kernels is worth it; if not, the body is
XLA-bound and fusion work should target aggregation instead.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (H, W, C_in, C_out, stride): the student body's conv shapes at
# 1024x2048 serving resolution (see core/plan.py decode of arch_1 —
# cells at 1/8 run convs at 1/8 or 1/16 for the "zoomed" downup ops)
SHAPES = [
    (128, 256, 32, 32, 1),    # 1/8 conv_2x cells (L0-L2)
    (64, 128, 32, 32, 1),     # 1/8 downup cells' zoomed convs
    (64, 128, 64, 64, 1),     # 1/16 cells
    (32, 64, 128, 128, 1),    # 1/32 cells
    (32, 64, 192, 128, 1),    # L8 br1
    (16, 32, 128, 256, 1),    # 1/32 zoomed (L9)
    (128, 256, 32, 64, 2),    # stride-2 down cells
]


def main():
    from fasterseg_tpu.latency.measure import slope_time_ms
    from fasterseg_tpu.pallas.conv import (conv3x3_bn_relu_planar,
                                           conv3x3s2_bn_relu_s2d,
                                           nhwc_to_planar,
                                           planar_space_to_depth)

    assert jax.default_backend() != "cpu", "probe is meaningful on TPU only"
    dtype = jnp.bfloat16
    rows = []
    for (h, w, ci, co, stride) in SHAPES:
        key = jax.random.PRNGKey(hash((h, w, ci, co, stride)) % (2**31))
        x = jax.random.normal(key, (1, h, w, ci), dtype)
        k = jax.random.normal(key, (3, 3, ci, co), dtype) * 0.1
        k2 = jax.random.normal(key, (3, 3, co, co), dtype) * 0.1
        scale = jnp.ones((co,), jnp.float32)
        bias = jnp.zeros((co,), jnp.float32)

        def xla_conv(im, kk=k, s=stride):
            y = jax.lax.conv_general_dilated(
                im, kk, (s, s), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y * scale.astype(dtype)
                               + bias.astype(dtype))

        def xla_conv_x2(im):
            return xla_conv(xla_conv(im), kk=k2, s=1)

        row = {"shape": [h, w, ci, co, stride]}
        row["xla_nhwc_ms"] = round(slope_time_ms(
            xla_conv, (x,), n1=8, n2=48, reps=3), 4)
        row["xla_nhwc_x2_ms"] = round(slope_time_ms(
            xla_conv_x2, (x,), n1=8, n2=48, reps=3), 4)

        if stride == 1:
            xp = nhwc_to_planar(x)

            def pl(imp):
                return conv3x3_bn_relu_planar(imp, k, scale, bias)

            row["pallas_plnr_ms"] = round(slope_time_ms(
                pl, (xp,), n1=8, n2=48, reps=3), 4)
        else:
            xp = nhwc_to_planar(x)

            def pl(imp):
                return conv3x3s2_bn_relu_s2d(
                    planar_space_to_depth(imp), k, scale, bias,
                    packing="planar")

            row["pallas_s2d_ms"] = round(slope_time_ms(
                pl, (xp,), n1=8, n2=48, reps=3), 4)
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "body_probe.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
