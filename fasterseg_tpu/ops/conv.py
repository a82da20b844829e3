"""NHWC conv/norm building blocks (flax.linen), bf16-on-MXU friendly.

Equivalents of the reference's `ConvNorm` (search/operations.py:42-128) and
`ConvBnRelu` (search/seg_oprs.py:17-39), redesigned for TPU:

* NHWC layout throughout (TPU-native; torch reference is NCHW).
* Separate compute dtype (`dtype`, default bf16-capable) and parameter
  dtype (f32) so the MXU runs low precision while optimizer state stays
  exact.
* BatchNorm keeps running stats in f32; `train=True` uses batch stats
  (and updates the running stats via the 'batch_stats' mutable collection),
  `train=False` uses the running averages — matching torch BN semantics
  with momentum 0.1 (config_train.py:55 -> flax momentum 0.9).
* Kaiming-normal fan_in/relu conv init, BN scale=1 shift=0
  (tools/utils/init_func.py:5-29).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv_padding(kernel_size: int, stride: int, dilation: int = 1,
                 padding: Optional[int] = None) -> Tuple[Tuple[int, int], ...]:
    """Reference ConvNorm default: pad = ceil((d*(k-1)+1-s)/2)
    (operations.py:54-58), symmetric on H and W."""
    if padding is None:
        padding = int(np.ceil((dilation * (kernel_size - 1) + 1 - stride) / 2.0))
    return ((padding, padding), (padding, padding))


class BatchNorm(nn.Module):
    """Torch-semantics BN: f32 stats/params, cast output to compute dtype."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return y.astype(self.dtype)


class Conv(nn.Module):
    """Bare conv with torch-style explicit padding, NHWC."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    padding: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=conv_padding(self.kernel_size, self.stride,
                                 self.dilation, self.padding),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=KAIMING,
            name="conv",
        )(x)


class ConvNorm(nn.Module):
    """conv -> BN -> ReLU (reference ConvNorm, slimmable=False path,
    operations.py:76-82). kernel 1 forces groups=1 (operations.py:61-64)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    padding: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = 1 if self.kernel_size == 1 else self.groups
        x = Conv(self.features, self.kernel_size, self.stride, self.dilation,
                 groups, self.use_bias, self.padding, self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        return nn.relu(x)


class ConvBnRelu(nn.Module):
    """Reference seg_oprs.ConvBnRelu: conv with explicit pad, optional
    BN / ReLU / bias (seg_oprs.py:17-39)."""

    features: int
    kernel_size: int
    stride: int
    pad: int
    dilation: int = 1
    groups: int = 1
    has_bn: bool = True
    has_relu: bool = True
    has_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel_size, self.stride, self.dilation,
                 self.groups, self.has_bias, self.pad, self.dtype)(x)
        if self.has_bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        if self.has_relu:
            x = nn.relu(x)
        return x
