"""Spatial resize ops with PyTorch `align_corners=True` semantics.

The reference network is stitched together with
`F.interpolate(..., mode='bilinear', align_corners=True)` (e.g.
train/model_seg.py:305-319,359-365; search/operations.py:271-275,437-444).
`jax.image.resize` implements only half-pixel (align_corners=False)
sampling, and mIoU moves by whole points if the sampling grid is wrong
(SURVEY.md §7 hard part #5), so we implement align-corners sampling
directly.

Implementation: separable 1-D linear interpolation as two static gathers +
a lerp per axis. Indices/weights are compile-time constants, so XLA lowers
the common integer-upsampling cases to cheap slice/concat + fma and fuses
them with neighbors. Everything is differentiable (gather transposes to
scatter-add).

Layout: NHWC (TPU-native).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _ac_coords(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Align-corners source indices (lo, hi) and lerp weight for each output
    position: src = i * (in-1)/(out-1)."""
    if out_size == 1:
        src = np.zeros(1, dtype=np.float64)
    else:
        src = np.arange(out_size, dtype=np.float64) * (
            (in_size - 1) / (out_size - 1))
    lo = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    return lo, hi, t


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) align-corners interpolation matrix (2 taps per row)."""
    lo, hi, t = _ac_coords(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - t)
    np.add.at(m, (np.arange(out_size), hi), t)
    return m


def _interp_axis(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """1-D align-corners interpolation along `axis`.

    Implemented as a contraction with a constant interpolation matrix —
    on TPU this rides the MXU and measures ~2x faster than the
    two-gather lerp formulation (same weights, same result up to fma
    ordering)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_interp_matrix_np(in_size, out_size), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("oi,...i->...o", m, moved,
                     preferred_element_type=x.dtype)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear align-corners resize of an NHWC (or HWC) tensor."""
    h_axis = x.ndim - 3
    x = _interp_axis(x, out_hw[0], h_axis)
    x = _interp_axis(x, out_hw[1], h_axis + 1)
    return x


def scale_by(x: jax.Array, factor: float) -> jax.Array:
    """F.interpolate(scale_factor=f, align_corners=True) equivalent."""
    h_axis = x.ndim - 3
    out_h = int(x.shape[h_axis] * factor)
    out_w = int(x.shape[h_axis + 1] * factor)
    return resize_bilinear(x, (out_h, out_w))


def downsample_half(x: jax.Array) -> jax.Array:
    """Bilinear align-corners downsample to (H//2, W//2) — the front half of
    the reference's 'zoomed conv' (operations.py:271,437)."""
    h_axis = x.ndim - 3
    return resize_bilinear(x, (x.shape[h_axis] // 2, x.shape[h_axis + 1] // 2))


@functools.lru_cache(maxsize=None)
def _hp_interp_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) half-pixel bilinear matrix — cv2.INTER_LINEAR semantics
    (src = (i+0.5)*in/out - 0.5, edge-clamped 2-tap), the sampling the
    eval protocol's probability resizes use on host
    (data/preprocess._resize, evaluator.py:219). Matches cv2's float32
    path bit-for-bit up to fma ordering (tests/test_ops.py)."""
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * (
        in_size / out_size) - 0.5
    lo = np.floor(src).astype(np.int64)
    t = (src - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, in_size - 1)
    hi_c = np.clip(lo + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo_c), 1.0 - t)
    np.add.at(m, (np.arange(out_size), hi_c), t)
    return m


def _hp_interp_axis(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_hp_interp_matrix_np(in_size, out_size), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("oi,...i->...o", m, moved,
                     preferred_element_type=x.dtype)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear_halfpixel(x: jax.Array,
                              out_hw: Tuple[int, int]) -> jax.Array:
    """cv2.INTER_LINEAR-equivalent resize of an NHWC (or HWC) tensor —
    the on-device replacement for the eval protocol's host-side
    probability-map resizes."""
    h_axis = x.ndim - 3
    x = _hp_interp_axis(x, out_hw[0], h_axis)
    x = _hp_interp_axis(x, out_hw[1], h_axis + 1)
    return x


@functools.lru_cache(maxsize=None)
def _nearest_coords(in_size: int, out_size: int) -> np.ndarray:
    """PyTorch `mode='nearest'` index map: src = floor(i * in/out)."""
    return np.minimum(
        (np.arange(out_size, dtype=np.float64) * (in_size / out_size)).astype(np.int32),
        in_size - 1)


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize (torch semantics). Used by the latency-stage
    model variant (latency/model_seg.py — TensorRT could not export bilinear)
    and for label maps."""
    h_axis = x.ndim - 3
    ih = jnp.asarray(_nearest_coords(x.shape[h_axis], out_hw[0]))
    iw = jnp.asarray(_nearest_coords(x.shape[h_axis + 1], out_hw[1]))
    x = jnp.take(x, ih, axis=h_axis)
    x = jnp.take(x, iw, axis=h_axis + 1)
    return x
