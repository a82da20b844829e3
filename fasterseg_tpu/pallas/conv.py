"""Fused 3x3 conv + folded-BN + ReLU Pallas kernels for batch-1 inference.

Motivation: this backend's XLA conv lowering runs the large-spatial,
narrow-channel stem convolutions ~10x off the HBM roofline at batch 1
(measured: 3->32/s2 @1024x2048 ~1.8 ms against ~0.05 ms of traffic). The
stem is ~70% of end-to-end student latency, so these are the
speed-of-light kernels BASELINE.md calls for.

Design — dictated by Mosaic tiling rules (bf16 sublane tile 16, no
narrow lane concats, no bf16 lane rotates):
* Activations are **channel-planar**: (H, C, W) with C on sublanes
  (padded to the sublane tile) and W on lanes. Kernels chain in this
  layout; only the stem entry/exit transpose to/from NHWC.
* The three column taps are prepared as **pre-shifted planes** in XLA
  (strided slices of the padded input), so every in-kernel access is an
  offset-0 static slice — no gathers, rotates, or misaligned layouts.
* Each grid step DMAs an overlapping row window (halo) of each plane from
  HBM into VMEM scratch; per output row the 9 taps stack on sublanes into
  a (9*C_in, W_out) patch and ONE MXU matmul (C_out, 9*C_in) @ patch
  produces the row. Folded BN scale/bias + ReLU run in the epilogue; the
  conv->BN->ReLU chain never round-trips HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 16  # bf16 sublane tile
LANE = 128    # lane tile


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """BN(eval) as y = x*scale + bias."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad_lanes(p: jax.Array, wo_p: int) -> jax.Array:
    """Pad a tap plane's minor (lane) dim to the lane tile. Mosaic
    rejects scratch/window slices whose lane dim is not 128-aligned
    ("Slice shape along dimension 2 must be aligned to tiling (128)") —
    hit by the body cells at 1/32 scale (wo=64/32) that the wide stem
    never reaches. The pad lanes compute garbage that the caller slices
    off; only maps already narrower than one lane tile pay it."""
    if p.shape[-1] == wo_p:
        return p
    return jnp.pad(p, ((0, 0), (0, 0), (0, wo_p - p.shape[-1])))


def _kernel(p0_hbm, p1_hbm, p2_hbm, wmat_ref, sb_ref, out_ref,
            t0, t1, t2, s0, s1, s2, *, tr: int, rstride: int, wo: int,
            relu: bool):
    """Double-buffered: each tile's 3 plane windows are prefetched during
    the previous tile's matmuls (slot = i % 2)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = rstride * tr + (3 - rstride)

    def dma(idx, slot):
        return [
            pltpu.make_async_copy(
                h.at[pl.ds(idx * rstride * tr, rows)], t.at[slot],
                s.at[slot])
            for h, t, s in ((p0_hbm, t0, s0), (p1_hbm, t1, s1),
                            (p2_hbm, t2, s2))]

    @pl.when(i == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in dma(i + 1, (i + 1) % 2):
            c.start()

    for c in dma(i, i % 2):
        c.wait()

    slot = i % 2
    wmat = wmat_ref[:]
    scale = sb_ref[:, 0:1]
    bias = sb_ref[:, 1:2]
    for r in range(tr):
        parts = []
        for dy in range(3):
            row = rstride * r + dy
            parts += [t0[slot, row], t1[slot, row], t2[slot, row]]
        p = jnp.concatenate(parts, axis=0)          # (9*cip, wo)
        acc = jnp.dot(wmat, p, preferred_element_type=jnp.float32)
        y = acc * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[r] = y.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("stride", "relu", "tile_rows",
                                    "interpret"))
def conv3x3_bn_relu_planar(x: jax.Array, w: jax.Array, scale: jax.Array,
                           bias: jax.Array, stride: int = 1,
                           relu: bool = True,
                           tile_rows: Optional[int] = None,
                           interpret: Optional[bool] = None) -> jax.Array:
    """x: (H, C_in_padded, W) channel-planar; w: (3, 3, Ci, Co) HWIO;
    scale/bias: (Co,) folded BN. Returns (H/s, Co_padded, W/s) planar,
    pad=1 conv semantics. Ci may be smaller than x's padded channel dim
    as long as the padding lanes are zero."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, cip, W = x.shape
    ci, co = w.shape[2], w.shape[3]
    cop = _round_up(co, SUBLANE)
    ho, wo = H // stride, W // stride
    if tile_rows is None:
        tile_rows = 16 if ho % 16 == 0 else 8
    while ho % tile_rows:
        tile_rows -= 1

    # weight matrix (cop, 9*cip): rows = out channel, col blocks (dy, dx)
    wp = jnp.zeros((3, 3, cip, cop), w.dtype).at[:, :, :ci, :co].set(w)
    wmat = wp.transpose(3, 0, 1, 2).reshape(cop, 9 * cip).astype(x.dtype)
    sb = jnp.zeros((cop, 2), jnp.float32)
    sb = sb.at[:co, 0].set(scale.astype(jnp.float32))
    sb = sb.at[:co, 1].set(bias.astype(jnp.float32))

    xp = jnp.pad(x, ((1, 1), (0, 0), (1, 1)))
    # pre-shifted column-tap planes, each (H+2, cip, wo) lane-padded
    wo_p = _round_up(wo, LANE)
    if stride == 2:
        planes = [xp[:, :, 0::2][:, :, :wo], xp[:, :, 1::2][:, :, :wo],
                  xp[:, :, 2::2][:, :, :wo]]
    else:
        planes = [xp[:, :, dx:dx + wo] for dx in range(3)]
    planes = [_pad_lanes(p, wo_p) for p in planes]

    rows = stride * tile_rows + (3 - stride)
    out = pl.pallas_call(
        functools.partial(_kernel, tr=tile_rows, rstride=stride, wo=wo_p,
                          relu=relu),
        out_shape=jax.ShapeDtypeStruct((ho, cop, wo_p), x.dtype),
        grid=(ho // tile_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + [
            pl.BlockSpec((cop, 9 * cip), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cop, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, cop, wo_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cip, wo_p), x.dtype),
            pltpu.VMEM((2, rows, cip, wo_p), x.dtype),
            pltpu.VMEM((2, rows, cip, wo_p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*planes, wmat, sb)
    return out[:, :, :wo] if wo_p != wo else out


def _kernel2(p0_hbm, p1_hbm, wmat_ref, sb_ref, out_ref,
             t0, t1, s0, s1, *, tr: int, wo: int, relu: bool):
    """2x2-tap stride-1 variant of _kernel (2 pre-shifted planes, window
    tr+1 rows) — the compute body of the space-to-depth stride-2 conv."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tr + 1

    def dma(idx, slot):
        return [
            pltpu.make_async_copy(h.at[pl.ds(idx * tr, rows)], t.at[slot],
                                  s.at[slot])
            for h, t, s in ((p0_hbm, t0, s0), (p1_hbm, t1, s1))]

    @pl.when(i == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in dma(i + 1, (i + 1) % 2):
            c.start()

    for c in dma(i, i % 2):
        c.wait()

    slot = i % 2
    wmat = wmat_ref[:]
    scale = sb_ref[:, 0:1]
    bias = sb_ref[:, 1:2]
    for r in range(tr):
        parts = []
        for dy in range(2):
            parts += [t0[slot, r + dy], t1[slot, r + dy]]
        p = jnp.concatenate(parts, axis=0)          # (4*cip, wo)
        acc = jnp.dot(wmat, p, preferred_element_type=jnp.float32)
        y = acc * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[r] = y.astype(out_ref.dtype)


def space_to_depth_planar(x: jax.Array, c: int) -> jax.Array:
    """NHWC (1, H, W, C) -> planar (H/2, 4C_padded, W/2) where the channel
    axis packs the 2x2 pixel cell as (ry, rx, c) blocks.

    Built as free row-major reshapes around ONE minor-dim transpose:
    (H, W, C) -> view (H, W/2, 2C) [cell, (rx, c)] -> transpose last two
    dims -> (H, 2C, W/2) -> view (H/2, 4C, W/2) [(ry, rx, c)]. The
    transpose never crosses the major (row) dim, so XLA lowers it as a
    cheap tiled shuffle: measured ~0.03 ms at 1024x2048x3 — against
    ~4.5 ms for a fused reshape/transpose of the packed layout (gather)
    and ~0.56 ms for the direct stride-2 planar conv this feeds replaces."""
    _, H, W, _ = x.shape
    cp = _round_up(4 * c, SUBLANE)
    x3 = x.reshape(H, W // 2, 2 * c)
    t = jnp.transpose(x3, (0, 2, 1))
    y = t.reshape(H // 2, 4 * c, W // 2)
    return jnp.pad(y, ((0, 0), (0, cp - 4 * c), (0, 0)))


def planar_space_to_depth(x: jax.Array) -> jax.Array:
    """Planar (H, Cp, W) -> s2d planar (H/2, 4Cp, W/2) with channel
    blocks packed (ry, c, rx): index = ry*2Cp + c*2 + rx.

    Same trick as space_to_depth_planar but starting from the planar
    layout the stem chains in: ONE minor-dim transpose ((H, Cp, W/2, 2)
    -> (H, Cp, 2, W/2), never crossing the major dims) surrounded by
    free row-major views. This removes the gather-lowered stride-2 lane
    slices the direct stride-2 kernel needs for its pre-shifted planes —
    the dominant cost of the stem's 32->64 and 64->64 stride-2 convs
    (measured 0.33/0.15 ms at 1024x2048 input, ~5x off roofline).
    Padded channel lanes stay zero (they interleave into the packing and
    the matching weight rows are zero)."""
    H, cp, W = x.shape
    t = jnp.transpose(x.reshape(H, cp, W // 2, 2), (0, 1, 3, 2))
    return t.reshape(H // 2, 4 * cp, W // 2)


def _w_s2d_planar(w: jax.Array, cp: int) -> jax.Array:
    """(3,3,Ci,Co) HWIO -> (2,2,4Cp,Co) for planar_space_to_depth's
    (ry, c, rx) channel packing (cp = padded planar channel count,
    Ci <= cp; rows for padding channels are zero). Tap map as _w_s2d."""
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 2, cp, 2, co), w.dtype)  # (dy',dx',ry,c,rx)
    kmap = {0: (0, 1), 1: (1, 0), 2: (1, 1)}       # k -> (d', r)
    for ky in range(3):
        dy, ry = kmap[ky]
        for kx in range(3):
            dx, rx = kmap[kx]
            w2 = w2.at[dy, dx, ry, :ci, rx].set(w[ky, kx])
    return w2.reshape(2, 2, 4 * cp, co)


def _w_s2d(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) HWIO -> (2,2,4Ci,Co): the 3x3/stride-2 kernel expressed
    over 2x2 space-to-depth cell taps. Output pixel (i,j) reads original
    pixel (2i+ky-1, 2j+kx-1) = cell (i-1+dy', ry) with ky = 2dy'+ry-... :
    ky=0 -> cell tap dy'=0 (i-1), ry=1; ky=1 -> dy'=1, ry=0; ky=2 ->
    dy'=1, ry=1. (Same map for kx/dx'/rx.) Slot (dy'=0, ry=0) is unused
    (zero)."""
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 2, 2, ci, co), w.dtype)  # (dy', dx', ry, rx)
    kmap = {0: (0, 1), 1: (1, 0), 2: (1, 1)}       # ky -> (dy', ry)
    for ky in range(3):
        dy, ry = kmap[ky]
        for kx in range(3):
            dx, rx = kmap[kx]
            w2 = w2.at[dy, dx, ry, rx].set(w[ky, kx])
    return w2.reshape(2, 2, 4 * ci, co)


@functools.partial(jax.jit,
                   static_argnames=("relu", "tile_rows", "interpret",
                                    "packing"))
def conv3x3s2_bn_relu_s2d(x: jax.Array, w: jax.Array, scale: jax.Array,
                          bias: jax.Array, relu: bool = True,
                          tile_rows: Optional[int] = None,
                          interpret: Optional[bool] = None,
                          packing: str = "cell") -> jax.Array:
    """3x3 stride-2 conv + folded BN + ReLU via space-to-depth.

    x: s2d planar (Ho, 4Ci_padded, Wo) from space_to_depth_planar
    (packing="cell", (ry, rx, c) blocks) or planar_space_to_depth
    (packing="planar", (ry, c, rx) blocks); padding lanes must be zero.
    w: (3,3,Ci,Co) HWIO. Returns (Ho, Co_padded, Wo).

    Why: the direct stride-2 kernel reads 3 pre-shifted full-resolution
    planes (fatal for the 3-channel stem conv: 16/3 sublane padding on
    every byte) and its in-kernel taps stride over rows. In s2d space the
    same conv is a 2x2 stride-1 stencil: 2 half-size tap planes, half the
    window rows, 4x less padding waste at Ci=3, and a 4x taller matmul K.
    Measured on the v5e stem conv0 (1024x2048, 3->32): ~3x faster."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ho, cip4, wo = x.shape
    ci, co = w.shape[2], w.shape[3]
    cop = _round_up(co, SUBLANE)
    if tile_rows is None:
        tile_rows = 16 if ho % 16 == 0 else 8
    while ho % tile_rows:
        tile_rows -= 1

    if packing == "planar":
        wp = _w_s2d_planar(w, cip4 // 4)            # (2, 2, 4Cp, Co pad)
        wp = jnp.zeros((2, 2, cip4, cop), w.dtype).at[:, :, :, :co].set(wp)
    else:
        w2 = _w_s2d(w)                              # (2, 2, 4Ci, Co)
        wp = jnp.zeros((2, 2, cip4, cop),
                       w.dtype).at[:, :, :4 * ci, :co].set(w2)
    # rows of the per-pixel patch stack as (dy(, plane dx), channel)
    wmat = wp.transpose(3, 0, 1, 2).reshape(cop, 4 * cip4).astype(x.dtype)
    sb = jnp.zeros((cop, 2), jnp.float32)
    sb = sb.at[:co, 0].set(scale.astype(jnp.float32))
    sb = sb.at[:co, 1].set(bias.astype(jnp.float32))

    # pad one leading row/col (the dy'=0/dx'=0 taps read cell i-1/j-1)
    xp = jnp.pad(x, ((1, 0), (0, 0), (1, 0)))
    wo_p = _round_up(wo, LANE)
    planes = [_pad_lanes(xp[:, :, dx:dx + wo], wo_p) for dx in range(2)]

    out = pl.pallas_call(
        functools.partial(_kernel2, tr=tile_rows, wo=wo_p, relu=relu),
        out_shape=jax.ShapeDtypeStruct((ho, cop, wo_p), x.dtype),
        grid=(ho // tile_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [
            pl.BlockSpec((cop, 4 * cip4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cop, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, cop, wo_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 1, cip4, wo_p), x.dtype),
            pltpu.VMEM((2, tile_rows + 1, cip4, wo_p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*planes, wmat, sb)
    return out[:, :, :wo] if wo_p != wo else out


def nhwc_to_planar(x: jax.Array, c_pad: Optional[int] = None) -> jax.Array:
    """(1, H, W, C) -> (H, C_padded, W)."""
    _, H, W, c = x.shape
    cp = _round_up(c_pad or c, SUBLANE)
    y = jnp.transpose(x[0], (0, 2, 1))           # (H, C, W)
    return jnp.pad(y, ((0, 0), (0, cp - c), (0, 0)))


def planar_to_nhwc(x: jax.Array, c: int) -> jax.Array:
    """(H, C_padded, W) -> (1, H, W, C)."""
    return jnp.transpose(x[:, :c, :], (0, 2, 1))[None]


def conv3x3_bn_relu_reference(x, w, scale, bias, stride=1, relu=True):
    """XLA reference implementation (same math) for parity tests.
    NHWC in/out."""
    from jax import lax
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w.astype(x.dtype), (stride, stride),
                                 [(1, 1), (1, 1)], dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
    y = y * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
