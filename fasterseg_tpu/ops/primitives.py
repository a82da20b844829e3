"""The five searchable primitives — derived (fixed-width) variants.

TPU-native equivalents of search/operations.py (slimmable=False paths),
used by the decoded inference networks. Index-aligned with
core.genotype.PRIMITIVES:

  0 skip           FactorizedReduce (identity at stride 1; operations.py:449-534)
  1 conv           BasicResidual1x   (operations.py:131-200)
  2 conv_downup    BasicResidualDownup1x — "zoomed" conv (operations.py:203-277)
  3 conv_2x        BasicResidual2x   (operations.py:280-359)
  4 conv_2x_downup BasicResidualDownup2x (operations.py:362-446)

All NHWC. The downup ops sample with align-corners bilinear (resize.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .conv import BatchNorm, Conv
from .resize import downsample_half, resize_bilinear


class BasicResidual1x(nn.Module):
    """3x3 conv -> BN -> ReLU."""

    c_out: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation = 1 if self.stride == 2 else self.dilation
        x = Conv(self.c_out, 3, self.stride, dilation, padding=dilation,
                 dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        return nn.relu(x)


class BasicResidualDownup1x(nn.Module):
    """Zoomed conv: bilinear /2 -> 3x3 conv (stride 1) -> BN ->
    (bilinear x2 back if stride==1) -> ReLU (operations.py:270-277)."""

    c_out: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        dilation = 1 if self.stride == 2 else self.dilation
        out = downsample_half(x)
        out = Conv(self.c_out, 3, 1, dilation, padding=dilation,
                   dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype)(out, train)
        if self.stride == 1:
            out = resize_bilinear(out, (h, w))
        return nn.relu(out)


class BasicResidual2x(nn.Module):
    """Two stacked conv+BN+ReLU blocks; first carries the stride."""

    c_out: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation = 1 if self.stride == 2 else self.dilation
        x = Conv(self.c_out, 3, self.stride, dilation, padding=dilation,
                 dtype=self.dtype, name="Conv_0")(x)
        x = BatchNorm(dtype=self.dtype, name="BatchNorm_0")(x, train)
        x = nn.relu(x)
        x = Conv(self.c_out, 3, 1, dilation, padding=dilation,
                 dtype=self.dtype, name="Conv_1")(x)
        x = BatchNorm(dtype=self.dtype, name="BatchNorm_1")(x, train)
        return nn.relu(x)


class BasicResidualDownup2x(nn.Module):
    """Zoomed double conv (operations.py:436-446): /2 -> conv+BN+ReLU ->
    conv+BN -> (x2 back if stride==1) -> ReLU."""

    c_out: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        dilation = 1 if self.stride == 2 else self.dilation
        out = downsample_half(x)
        out = Conv(self.c_out, 3, 1, dilation, padding=dilation,
                   dtype=self.dtype, name="Conv_0")(out)
        out = BatchNorm(dtype=self.dtype, name="BatchNorm_0")(out, train)
        out = nn.relu(out)
        out = Conv(self.c_out, 3, 1, dilation, padding=dilation,
                   dtype=self.dtype, name="Conv_1")(out)
        out = BatchNorm(dtype=self.dtype, name="BatchNorm_1")(out, train)
        if self.stride == 1:
            out = resize_bilinear(out, (h, w))
        return nn.relu(out)


class FactorizedReduce(nn.Module):
    """'skip': identity at stride 1 (non-slimmable, operations.py:533-534);
    at stride 2, two offset 1x1 stride-2 convs concatenated on channels,
    then BN + ReLU (operations.py:521-526)."""

    c_out: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 1:
            return x
        a = Conv(self.c_out // 2, 1, 2, padding=0, dtype=self.dtype,
                 name="Conv_0")(x)
        b = Conv(self.c_out // 2, 1, 2, padding=0, dtype=self.dtype,
                 name="Conv_1")(x[:, 1:, 1:, :])
        out = jnp.concatenate([a, b], axis=-1)
        out = BatchNorm(dtype=self.dtype)(out, train)
        return nn.relu(out)


# PRIMITIVES-indexed constructors: OP_CLASSES[i](c_out, stride, dtype)
OP_CLASSES = (
    FactorizedReduce,
    BasicResidual1x,
    BasicResidualDownup1x,
    BasicResidual2x,
    BasicResidualDownup2x,
)


def make_op(op_idx: int, c_out: int, stride: int, dtype: Any = jnp.float32,
            name: str = None) -> nn.Module:
    cls = OP_CLASSES[op_idx]
    return cls(c_out=c_out, stride=stride, dtype=dtype, name=name)
