"""Analytical TPU latency model (roofline) for LUT entries.

Standalone-op latency estimate: max(FLOPs / peak_flops, bytes / bandwidth)
plus a fixed launch overhead. The reference's LUT values came from
standalone TensorRT engines (latency/latency_lookup_table.py); this model
plays the same role for TPU — a fast, deterministic provider that ranks
ops by true hardware cost. Constants are calibrated for the attached
chip (defaults below measured on the v5e-class device in this image) and
can be re-calibrated with `calibrate()`.

The search only needs *relative* per-op costs plus a meaningful absolute
scale for the FPS-band controller, which the roofline provides; a
measured LUT (cli/latency_lut.py) can replace it entry-for-entry.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from .lut import parse_key


@dataclasses.dataclass
class TpuCostModel:
    peak_tflops: float = 90.0       # bf16 MXU, measured ~97 on this chip
    hbm_gbps: float = 180.0         # measured ~189 on this chip
    overhead_us: float = 15.0       # per-op dispatch/launch overhead
    bytes_per_elem: int = 2         # bf16 activations/weights
    mxu_min_channels: int = 128     # lane width: narrow channels waste MXU

    def conv_ms(self, h: int, w: int, c_in: int, c_out: int, k: int,
                stride: int, n_convs: int = 1) -> float:
        """One conv (+BN+ReLU fused): compute and memory roofline."""
        ho, wo = h // stride, w // stride
        # MXU efficiency: contraction/output channels below lane width
        # waste the array proportionally
        eff_in = min(c_in / self.mxu_min_channels, 1.0)
        eff_out = min(c_out / self.mxu_min_channels, 1.0)
        eff = max(eff_in * eff_out, 0.02)
        flops = 2.0 * ho * wo * k * k * c_in * c_out
        t_compute = flops / (self.peak_tflops * 1e12 * eff)
        bytes_ = (h * w * c_in + ho * wo * c_out) * self.bytes_per_elem \
            + k * k * c_in * c_out * self.bytes_per_elem
        t_mem = bytes_ / (self.hbm_gbps * 1e9)
        return (max(t_compute, t_mem) + self.overhead_us * 1e-6) * 1e3 * n_convs

    def resize_ms(self, h: int, w: int, c: int, out_h: int, out_w: int) -> float:
        bytes_ = (h * w + out_h * out_w) * c * self.bytes_per_elem
        return (bytes_ / (self.hbm_gbps * 1e9) + self.overhead_us * 1e-6) * 1e3

    # ---- per-op estimates, matching reference op structure ----

    def op_ms(self, op_idx: int, h: int, w: int, c_in: int, c_out: int,
              stride: int) -> float:
        if op_idx == 0:  # FactorizedReduce
            if stride == 1:
                return self.conv_ms(h, w, c_in, c_out, 1, 1)
            # two half 1x1/s2 convs + concat
            return 2 * self.conv_ms(h, w, c_in, c_out // 2, 1, 2)
        if op_idx == 1:  # BasicResidual1x
            return self.conv_ms(h, w, c_in, c_out, 3, stride)
        if op_idx == 2:  # downup 1x: resize/2 + conv + (resize x2)
            t = self.resize_ms(h, w, c_in, h // 2, w // 2)
            t += self.conv_ms(h // 2, w // 2, c_in, c_out, 3, 1)
            if stride == 1:
                t += self.resize_ms(h // 2, w // 2, c_out, h, w)
            return t
        if op_idx == 3:  # BasicResidual2x
            return (self.conv_ms(h, w, c_in, c_out, 3, stride)
                    + self.conv_ms(h // stride, w // stride, c_out, c_out, 3, 1))
        if op_idx == 4:  # downup 2x
            t = self.resize_ms(h, w, c_in, h // 2, w // 2)
            t += self.conv_ms(h // 2, w // 2, c_in, c_out, 3, 1)
            t += self.conv_ms(h // 2, w // 2, c_out, c_out, 3, 1)
            if stride == 1:
                t += self.resize_ms(h // 2, w // 2, c_out, h, w)
            return t
        raise ValueError(op_idx)

    def provider(self, name: str) -> float:
        """LUT provider: estimate from a parsed key."""
        op, f = parse_key(name)
        if op == "ConvNorm":
            return self.conv_ms(f["H"], f["W"], f["Cin"], f["Cout"],
                                f.get("kernel", 3), f.get("stride", 1))
        if op == "ff":
            return self.conv_ms(f["H"], f["W"], f["C"], f["C"], 1, 1)
        if op == "head":
            c_in = f["Cin"]
            mid = c_in if c_in <= 256 else c_in // 2
            return (self.conv_ms(f["H"], f["W"], c_in, mid, 3, 1)
                    + self.conv_ms(f["H"], f["W"], mid, f["Cout"], 1, 1))
        names = {"FactorizedReduce": 0, "BasicResidual1x": 1,
                 "BasicResidual_downup_1x": 2, "BasicResidual2x": 3,
                 "BasicResidual_downup_2x": 4}
        if op in names:
            return self.op_ms(names[op], f["H"], f["W"], f["Cin"],
                              f["Cout"], f.get("stride", 1))
        raise KeyError(f"cannot model key: {name}")


def calibrate(sample_shapes: Tuple[Tuple[int, int, int, int], ...] = (
        (256, 512, 64, 64), (128, 256, 96, 96))) -> TpuCostModel:
    """Fit overhead/efficiency constants from a few on-device measurements
    (best-effort; returns defaults if the device is unavailable)."""
    model = TpuCostModel()
    try:
        import jax
        import jax.numpy as jnp
        from .measure import slope_time_ms
        h, w, ci, co = sample_shapes[0]
        x = jnp.ones((1, h, w, ci), jnp.bfloat16)
        kw = jax.random.normal(jax.random.PRNGKey(0), (3, 3, ci, co),
                               jnp.bfloat16) * 0.05

        def conv(x, kernel):
            from jax import lax
            dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            return lax.conv_general_dilated(x, kernel, (1, 1),
                                            [(1, 1), (1, 1)],
                                            dimension_numbers=dn)
        measured = slope_time_ms(conv, (x, kw))
        predicted = model.conv_ms(h, w, ci, co, 3, 1)
        if measured > 0:
            # scale efficiency so prediction matches this device
            model.peak_tflops *= predicted / measured
    except Exception:
        pass
    return model
