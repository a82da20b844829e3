"""Segmentation heads and fusion modules (BiSeNet-derived).

Equivalents of search/seg_oprs.py. `FeatureFusion.forward` in the
reference defines a channel-attention branch but bypasses it (returns the
1x1 conv directly, seg_oprs.py:219-225); we implement the effective
behavior and keep the attention modules available for completeness.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .conv import ConvBnRelu, Conv


class FeatureFusion(nn.Module):
    """Effective behavior: a single 1x1 ConvBnRelu over the concatenated
    branch features (seg_oprs.py:181-225)."""

    features: int
    reduction: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBnRelu(self.features, 1, 1, 0, dtype=self.dtype,
                          name="conv_1x1")(x, train)


class Head(nn.Module):
    """3x3 ConvBnRelu -> 1x1 conv to classes (seg_oprs.py:228-274).
    mid = in_planes when in <= 256 else in//2 (seg_oprs.py:230-243)."""

    num_classes: int = 19
    is_aux: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        mid_planes = in_planes if in_planes <= 256 else in_planes // 2
        x = ConvBnRelu(mid_planes, 3, 1, 1, dtype=self.dtype,
                       name="conv_3x3")(x, train)
        x = Conv(self.num_classes, 1, 1, padding=0,
                 use_bias=True, dtype=self.dtype, name="conv_1x1")(x)
        return x


class SELayer(nn.Module):
    """Squeeze-excitation (seg_oprs.py:76-92) — kept for API parity."""

    out_planes: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(-3, -2))
        y = nn.Dense(self.out_planes // self.reduction, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dense(self.out_planes, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y)
        return y[:, None, None, :]


class SeparableConvBnRelu(nn.Module):
    """Depthwise + pointwise conv (seg_oprs.py:42-60) — API parity."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    has_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = Conv(c_in, self.kernel_size, self.stride, self.dilation,
                 groups=c_in, padding=self.pad, dtype=self.dtype,
                 name="depthwise")(x)
        from .conv import BatchNorm
        x = BatchNorm(dtype=self.dtype)(x, train)
        return ConvBnRelu(self.features, 1, 1, 0, has_relu=self.has_relu,
                          dtype=self.dtype, name="pointwise")(x, train)


class ChannelAttention(nn.Module):
    """DFN channel attention over two concatenated streams
    (seg_oprs.py:96-106) — API parity."""

    out_planes: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        fm = jnp.concatenate([x1, x2], axis=-1)
        att = SELayer(self.out_planes, self.reduction, dtype=self.dtype)(fm)
        return x1 * att + x2


class BNRefine(nn.Module):
    """Residual conv refine block (seg_oprs.py:109-128) — API parity."""

    features: int
    kernel_size: int = 3
    has_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = ConvBnRelu(self.features, self.kernel_size, 1,
                       self.kernel_size // 2, dtype=self.dtype,
                       name="conv_bn_relu")(x, train)
        t = Conv(self.features, self.kernel_size, 1,
                 padding=self.kernel_size // 2, use_bias=False,
                 dtype=self.dtype, name="conv_refine")(t)
        out = t + x
        return nn.relu(out) if self.has_relu else out


class RefineResidual(nn.Module):
    """1x1 project + residual refine (seg_oprs.py:131-154) — API parity."""

    features: int
    kernel_size: int = 3
    has_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, 1, 1, padding=0, dtype=self.dtype,
                 name="conv_1x1")(x)
        t = ConvBnRelu(self.features, self.kernel_size, 1,
                       self.kernel_size // 2, dtype=self.dtype,
                       name="cbr")(x, train)
        t = Conv(self.features, self.kernel_size, 1,
                 padding=self.kernel_size // 2, use_bias=False,
                 dtype=self.dtype, name="conv_refine")(t)
        out = t + x
        return nn.relu(out) if self.has_relu else out


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """GlobalAvgPool2d (seg_oprs.py:63-73): NHWC -> (N,1,1,C)."""
    return jnp.mean(x, axis=(-3, -2), keepdims=True)


class AttentionRefinement(nn.Module):
    """BiSeNet ARM (seg_oprs.py:158-178) — kept for API parity."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = ConvBnRelu(self.features, 3, 1, 1, dtype=self.dtype)(x, train)
        se = jnp.mean(fm, axis=(-3, -2), keepdims=True)
        se = ConvBnRelu(self.features, 1, 1, 0, has_relu=False,
                        dtype=self.dtype)(se, train)
        return fm * nn.sigmoid(se)
