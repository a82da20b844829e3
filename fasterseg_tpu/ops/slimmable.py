"""Slimmable (universally-width-switchable) ops — masked, not sliced.

The reference implements slimmable convs by *slicing* weight tensors at
forward time (search/slimmable_ops.py:36-48) and per-width private
BatchNorms (slimmable_ops.py:51-70). Dynamic channel counts cannot cross
into XLA (SURVEY.md §7 hard part #1), so the TPU-native design keeps every
tensor at maximum width and applies *channel masks*:

* A conv on an input whose channels beyond k are zero equals the conv on
  the k-sliced input (linearity); masking the output beyond k' equals
  slicing the output. One compiled program serves every width.
* Width choices arrive as traced (index, score) pairs — index selects a
  precomputed mask row / BN row, score is the straight-through gradient
  carrier (reference model_search.py:60-78 multiplies by the max prob of
  the hard Gumbel sample, whose value is 1.0).
* BatchNorm keeps per-width parameter/statistic rows, matching the
  reference's one-BN-per-width behavior (slimmable_ops.py:58-70); in train
  mode statistics come from the batch (track_running_stats=False parent
  semantics) and the selected width's running stats row is updated.

`make_divisible` (slimmable_ops.py:5-18) defines the active channel count.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conv import KAIMING, conv_padding
from .resize import downsample_half, resize_bilinear


def make_divisible(v: float, divisor: int = 8, min_value: int = 1) -> int:
    """Round channel count to a multiple of `divisor`, never dropping more
    than 10% (slimmable_ops.py:5-18)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@functools.lru_cache(maxsize=None)
def width_mask_table(c_max: int, width_mult_list: Tuple[float, ...]) -> np.ndarray:
    """(num_widths, c_max) float32: row w has make_divisible(c_max*w) ones."""
    table = np.zeros((len(width_mult_list), c_max), np.float32)
    for i, w in enumerate(width_mult_list):
        table[i, :make_divisible(c_max * w)] = 1.0
    return table


def width_index(width: float, width_mult_list: Sequence[float]) -> int:
    """Static index of a forced width in the width list."""
    for i, w in enumerate(width_mult_list):
        if abs(w - width) < 1e-9:
            return i
    raise ValueError(f"width {width} not in {width_mult_list}")


class SlimConv(nn.Module):
    """Full-width conv with traced input/output channel masks
    (USConv2d equivalent, slimmable_ops.py:21-48)."""

    c_max_in: int
    c_max_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    padding: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx):
        in_table = jnp.asarray(width_mask_table(self.c_max_in,
                                                tuple(self.width_mult_list)))
        out_table = jnp.asarray(width_mask_table(self.c_max_out,
                                                 tuple(self.width_mult_list)))
        x = x * in_table[in_idx].astype(x.dtype)
        y = nn.Conv(self.c_max_out, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=conv_padding(self.kernel_size, self.stride,
                                         self.dilation, self.padding),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=KAIMING,
                    name="conv")(x)
        return y * out_table[out_idx].astype(y.dtype)


class SlimBatchNorm(nn.Module):
    """Per-width BN rows (USBatchNorm2d equivalent, slimmable_ops.py:51-70).

    Train: normalize with batch statistics (the reference parent has
    track_running_stats=False but dispatches to per-width child BNs in
    train mode, which also use batch stats) and update the selected width's
    running-stats row. Eval: use the selected row's running stats.
    """

    features: int
    num_widths: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, width_idx, train: bool):
        nw, c = self.num_widths, self.features
        scale = self.param("scale", nn.initializers.ones, (nw, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (nw, c), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((nw, c), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((nw, c), jnp.float32))

        xf = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = ra_mean.value.at[width_idx].set(
                    ra_mean.value[width_idx] * m + mean * (1 - m))
                ra_var.value = ra_var.value.at[width_idx].set(
                    ra_var.value[width_idx] * m + unbiased * (1 - m))
        else:
            mean = ra_mean.value[width_idx]
            var = ra_var.value[width_idx]

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale[width_idx] + bias[width_idx]
        return y.astype(self.dtype)


class SlimConvNorm(nn.Module):
    """Slimmable conv -> per-width BN -> ReLU (ConvNorm slimmable path,
    operations.py:70-75)."""

    c_max_in: int
    c_max_out: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    padding: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx, train: bool):
        y = SlimConv(self.c_max_in, self.c_max_out, self.kernel_size,
                     self.stride, self.dilation, self.width_mult_list,
                     self.padding, self.dtype, name="conv")(x, in_idx, out_idx)
        y = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                          dtype=self.dtype, name="bn")(y, out_idx, train)
        out_table = jnp.asarray(width_mask_table(self.c_max_out,
                                                 tuple(self.width_mult_list)))
        return nn.relu(y) * out_table[out_idx].astype(y.dtype)


def _masked_bn_relu(y, bn, out_table, out_idx, train, relu=True):
    y = bn(y, out_idx, train)
    if relu:
        y = nn.relu(y)
    return y * out_table[out_idx].astype(y.dtype)


class SlimBasicResidual1x(nn.Module):
    """Slimmable 'conv' (operations.py:131-200)."""

    c_max_in: int
    c_max_out: int
    stride: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx, train: bool):
        out_table = jnp.asarray(width_mask_table(self.c_max_out,
                                                 tuple(self.width_mult_list)))
        y = SlimConv(self.c_max_in, self.c_max_out, 3, self.stride,
                     width_mult_list=self.width_mult_list, padding=1,
                     dtype=self.dtype, name="conv1")(x, in_idx, out_idx)
        bn1 = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                            dtype=self.dtype, name="bn1")
        return _masked_bn_relu(y, bn1, out_table, out_idx, train)


class SlimBasicResidualDownup1x(nn.Module):
    """Slimmable zoomed conv (operations.py:203-277)."""

    c_max_in: int
    c_max_out: int
    stride: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        out_table = jnp.asarray(width_mask_table(self.c_max_out,
                                                 tuple(self.width_mult_list)))
        y = downsample_half(x)
        y = SlimConv(self.c_max_in, self.c_max_out, 3, 1,
                     width_mult_list=self.width_mult_list, padding=1,
                     dtype=self.dtype, name="conv1")(y, in_idx, out_idx)
        y = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                          dtype=self.dtype, name="bn1")(y, out_idx, train)
        if self.stride == 1:
            y = resize_bilinear(y, (h, w))
        return nn.relu(y) * out_table[out_idx].astype(y.dtype)


class SlimBasicResidual2x(nn.Module):
    """Slimmable double conv (operations.py:280-359)."""

    c_max_in: int
    c_max_out: int
    stride: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx, train: bool):
        out_table = jnp.asarray(width_mask_table(self.c_max_out,
                                                 tuple(self.width_mult_list)))
        y = SlimConv(self.c_max_in, self.c_max_out, 3, self.stride,
                     width_mult_list=self.width_mult_list, padding=1,
                     dtype=self.dtype, name="conv1")(x, in_idx, out_idx)
        bn1 = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                            dtype=self.dtype, name="bn1")
        y = _masked_bn_relu(y, bn1, out_table, out_idx, train)
        y = SlimConv(self.c_max_out, self.c_max_out, 3, 1,
                     width_mult_list=self.width_mult_list, padding=1,
                     dtype=self.dtype, name="conv2")(y, out_idx, out_idx)
        bn2 = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                            dtype=self.dtype, name="bn2")
        return _masked_bn_relu(y, bn2, out_table, out_idx, train)


class SlimBasicResidualDownup2x(nn.Module):
    """Slimmable zoomed double conv (operations.py:362-446)."""

    c_max_in: int
    c_max_out: int
    stride: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        out_table = jnp.asarray(width_mask_table(self.c_max_out,
                                                 tuple(self.width_mult_list)))
        y = downsample_half(x)
        y = SlimConv(self.c_max_in, self.c_max_out, 3, 1,
                     width_mult_list=self.width_mult_list, padding=1,
                     dtype=self.dtype, name="conv1")(y, in_idx, out_idx)
        bn1 = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                            dtype=self.dtype, name="bn1")
        y = _masked_bn_relu(y, bn1, out_table, out_idx, train)
        y = SlimConv(self.c_max_out, self.c_max_out, 3, 1,
                     width_mult_list=self.width_mult_list, padding=1,
                     dtype=self.dtype, name="conv2")(y, out_idx, out_idx)
        y = SlimBatchNorm(self.c_max_out, len(self.width_mult_list),
                          dtype=self.dtype, name="bn2")(y, out_idx, train)
        if self.stride == 1:
            y = resize_bilinear(y, (h, w))
        return nn.relu(y) * out_table[out_idx].astype(y.dtype)


class SlimFactorizedReduce(nn.Module):
    """Slimmable 'skip' (operations.py:449-534). Stride 1: 1x1 conv + BN +
    ReLU (operations.py:460-463 — a real conv when slimmable); stride 2:
    two offset 1x1/s2 convs concatenated + BN + ReLU.

    TPU note on the stride-2 concat: the reference concatenates two
    half-width *sliced* tensors, so the k = make_divisible(C_out*w) active
    channels are contiguous. With masks, a plain concat would leave branch
    b's active k/2 channels stranded at [C/2, C/2 + k/2); we roll them to
    [k/2, k) with a traced shift so downstream prefix masks see the same
    contiguous layout as the reference.
    """

    c_max_in: int
    c_max_out: int
    stride: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, in_idx, out_idx, train: bool):
        nwl = tuple(self.width_mult_list)
        out_table = jnp.asarray(width_mask_table(self.c_max_out, nwl))
        if self.stride == 1:
            y = SlimConv(self.c_max_in, self.c_max_out, 1, 1,
                         width_mult_list=nwl, padding=0, dtype=self.dtype,
                         name="conv1")(x, in_idx, out_idx)
            bn = SlimBatchNorm(self.c_max_out, len(nwl), dtype=self.dtype,
                               name="bn")
            return _masked_bn_relu(y, bn, out_table, out_idx, train)

        half = self.c_max_out // 2
        # per-width half counts: ref slices conv{1,2} each to
        # make_divisible((C_out//2)*w) channels (operations.py:467-468)
        half_counts = np.asarray(
            [make_divisible(half * wm) for wm in nwl], np.int32)
        half_table = np.zeros((len(nwl), half), np.float32)
        for i, hc in enumerate(half_counts):
            half_table[i, :hc] = 1.0
        half_table = jnp.asarray(half_table)
        half_counts = jnp.asarray(half_counts)
        in_table = jnp.asarray(width_mask_table(self.c_max_in, nwl))

        xm = x * in_table[in_idx].astype(x.dtype)
        conv = functools.partial(
            nn.Conv, half, (1, 1), strides=(2, 2), padding=((0, 0), (0, 0)),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=KAIMING)
        a = conv(name="conv1")(xm)
        b = conv(name="conv2")(xm[:, 1:, 1:, :])
        hm = half_table[out_idx]
        a = a * hm.astype(a.dtype)
        b = b * hm.astype(b.dtype)
        pad = [(0, 0)] * (x.ndim - 1)
        a_pad = jnp.pad(a, pad + [(0, self.c_max_out - half)])
        b_pad = jnp.pad(b, pad + [(half, self.c_max_out - 2 * half)])
        # move b's active block from [half, half+k/2) to [k/2, k);
        # the wrapped-around region is zeros by construction
        k_half = half_counts[out_idx]
        b_pad = jnp.roll(b_pad, k_half - half, axis=-1)
        y = a_pad + b_pad
        bn = SlimBatchNorm(self.c_max_out, len(nwl), dtype=self.dtype,
                           name="bn")
        return _masked_bn_relu(y, bn, out_table, out_idx, train)


SLIM_OP_CLASSES = (
    SlimFactorizedReduce,
    SlimBasicResidual1x,
    SlimBasicResidualDownup1x,
    SlimBasicResidual2x,
    SlimBasicResidualDownup2x,
)
