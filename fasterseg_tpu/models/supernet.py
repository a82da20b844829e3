"""Multi-resolution searchable supernet.

TPU-native equivalent of `Network_Multi_Path`
(/root/reference/search/model_search.py:131-548): a 16-layer grid over
scales {1/8, 1/16, 1/32} where every cell is a mixture of the five
slimmable primitives (alpha-weighted), every inter-scale edge is
beta-weighted, and channel widths are Gumbel-sampled (gamma/"ratio").

Functional redesign for XLA:
* Architecture parameters live OUTSIDE the module (an `ArchParamsPytree`
  managed by the search loop) and are passed as traced arguments; the
  module owns only weights.
* Width samples arrive as (index, score) pairs (see search/gumbel.py) —
  one compiled program serves arch_ratio/min/max/random width modes.
* The grid is an explicit unrolled graph (16 x <=3 cells — small);
  beta-weighted sums always evaluate both incoming edges (softmax betas
  are strictly positive, so the reference's `if beta > 0` guards always
  fire too, model_search.py:326-329).
* Boundary adapters: the stem's exact-width output is zero-padded to the
  grid's max width; head/refine modules consume static slices at the
  pinned head width — both equal the reference's sliced-tensor layout.
* `jax.checkpoint` wraps each layer's cells to keep the 3-4x multi-forward
  `_loss` within HBM (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import num_filters
from ..ops.conv import ConvNorm
from ..ops.resize import scale_by
from ..ops.seg_heads import Head
from ..ops.slimmable import SLIM_OP_CLASSES, width_index
from .derived import Stem

RatioSample = Tuple[jax.Array, jax.Array]


class SlimMixedOp(nn.Module):
    """Alpha-weighted sum of all five slimmable primitives
    (model_search.py:46-78). Every primitive executes; outputs are width-
    masked and scaled by alpha * r_score_in * r_score_out."""

    c_in: int
    c_out: int
    stride: int = 1
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, alpha, r_in: RatioSample, r_out: RatioSample,
                 train: bool):
        in_idx, in_score = r_in
        out_idx, out_score = r_out
        gate = (in_score * out_score).astype(jnp.float32)
        acc = None
        for i, cls in enumerate(SLIM_OP_CLASSES):
            y = cls(c_max_in=self.c_in, c_max_out=self.c_out,
                    stride=self.stride, width_mult_list=self.width_mult_list,
                    dtype=self.dtype, name=f"op{i}")(x, in_idx, out_idx, train)
            w = (alpha[i] * gate).astype(y.dtype)
            acc = y * w if acc is None else acc + y * w
        return acc


class SlimCell(nn.Module):
    """Keep-op + optional stride-2 down-op (model_search.py:102-128)."""

    c_in: int
    down: bool = True
    width_mult_list: Tuple[float, ...] = (1.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, alpha, ratios, train: bool):
        r_in, r_out, r_down = ratios
        op = SlimMixedOp(self.c_in, self.c_in, 1, self.width_mult_list,
                         self.dtype, name="op")
        out = op(x, alpha, r_in, r_out, train)
        down = None
        if self.down:
            assert r_down is not None
            down = SlimMixedOp(self.c_in, self.c_in * 2, 2,
                               self.width_mult_list, self.dtype,
                               name="down")(x, alpha, r_in, r_down, train)
        else:
            assert r_down is None
        return out, down


class GridLayer(nn.Module):
    """One uniform supernet layer (all 3 scales alive, downs at scales
    0/1) — the lax.scan body. Cells at a given scale are shape-identical
    across layers (model_search.py:153-170), so the 12 middle layers of
    the reference's 16-layer grid share ONE traced program with stacked
    per-layer weights; program size (and compile time) drops ~16x vs the
    fully unrolled graph.

    carry = (x0, d0, x1, d1, x2): keep/down activations per scale.
    xs    = per-layer (alpha0..2, beta1, beta2, ratio wiring per cell).
    """

    Fch: int
    width_mult_list: Tuple[float, ...]
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        x0, d0, x1, d1, x2 = carry
        alpha0, alpha1, alpha2, beta1, beta2, r0, r1, r2 = xs
        wml, train = tuple(self.width_mult_list), self.train
        nf = lambda s: num_filters(s, self.Fch, 1.0)

        cell0 = SlimCell(nf(8), down=True, width_mult_list=wml,
                         dtype=self.dtype, name="cell0")
        o0, nd0 = cell0(x0, alpha0, r0, train)

        # beta-weighted two-input cells (model_search.py:318-333):
        # w[0] gates the down-input path, w[1] the same-scale keep path
        cell1 = SlimCell(nf(16), down=True, width_mult_list=wml,
                         dtype=self.dtype, name="cell1")
        o1a, d1a = cell1(d0, alpha1, r1, train)
        o1b, d1b = cell1(x1, alpha1, r1, train)
        w = beta1.astype(o1a.dtype)
        o1 = o1a * w[0] + o1b * w[1]
        nd1 = d1a * w[0] + d1b * w[1]

        cell2 = SlimCell(nf(32), down=False, width_mult_list=wml,
                         dtype=self.dtype, name="cell2")
        o2a, _ = cell2(d1, alpha2, r2, train)
        o2b, _ = cell2(x2, alpha2, r2, train)
        w = beta2.astype(o2a.dtype)
        o2 = o2a * w[0] + o2b * w[1]
        return (o0, nd0, o1, nd1, o2), None


@dataclasses.dataclass
class ArchParamsPytree:
    """Continuous arch params for one arch_idx (model_search.py:507-531)."""

    alphas: List[jax.Array]   # [(L,5), (L-1,5), (L-2,5)]
    betas: List[Optional[jax.Array]]    # [None, (L-2,2), (L-3,2)]
    ratios: List[jax.Array]   # [(L-1,nw), (L-1,nw), (L-2,nw)]

    @staticmethod
    def create(layers: int, num_ops: int = 5, num_widths: int = 5,
               init: float = 1e-3) -> "ArchParamsPytree":
        ones = lambda *s: jnp.full(s, init, jnp.float32)
        return ArchParamsPytree(
            alphas=[ones(layers, num_ops), ones(layers - 1, num_ops),
                    ones(layers - 2, num_ops)],
            betas=[None, ones(layers - 2, 2), ones(layers - 3, 2)],
            ratios=[ones(layers - 1, num_widths), ones(layers - 1, num_widths),
                    ones(layers - 2, num_widths)],
        )


jax.tree_util.register_dataclass(
    ArchParamsPytree, data_fields=["alphas", "betas", "ratios"],
    meta_fields=[])


class Supernet(nn.Module):
    """The searchable grid + per-arch stems, refines and heads."""

    layers: int = 16
    num_classes: int = 19
    Fch: int = 12
    width_mult_list: Tuple[float, ...] = (1.0,)
    stem_head_width: Tuple[Tuple[float, float], ...] = ((1.0, 1.0),)
    dtype: Any = jnp.float32
    # remat each cell: trades recompute for HBM across the multi-forward
    # _loss (SURVEY.md §7 hard part #2); off by default — the search
    # crops fit comfortably, flip on for large-crop supernet training
    remat: bool = False
    # scan the uniform middle layers (3..L-2) with stacked weights —
    # collapses program size ~16x so search/pretrain steps compile in
    # seconds instead of tens of minutes (VERDICT round-1 missing #1).
    # False keeps the fully unrolled graph (parity tests compare the two).
    scan: bool = True

    def nf(self, scale: int, width: float = 1.0) -> int:
        return num_filters(scale, self.Fch, width)

    def _scales_at(self, layer: int) -> int:
        return min(layer + 1, 3)

    def width_pin(self, width: float):
        """A forced width as a (static index, score 1) sample."""
        return (jnp.int32(width_index(width, self.width_mult_list)),
                jnp.float32(1.0))

    def _cell_ratio(self, ratios, i, j, arch_idx):
        """Ratio wiring (in, out, down) per cell — model_search.py:297-316,
        shared with the latency estimator (latency/estimator.py)."""
        from ..latency.estimator import cell_ratio_wiring
        stem_w, head_w = self.stem_head_width[arch_idx]
        return cell_ratio_wiring(ratios, i, j, self.layers,
                                 self.width_pin(stem_w),
                                 self.width_pin(head_w))

    def _scan_middle(self, out_prev, al, be, ratios, train: bool):
        """Scan layers 3..L-2 (the uniform region: every scale alive,
        i != j, downs at scales 0/1) with per-layer stacked weights.

        Per-layer arch inputs are sliced once here and fed as scan xs;
        the slice index arithmetic mirrors cell_ratio_wiring
        (latency/estimator.py) over i in [3, L-2]:
          scale 0: in=r0[i-1]  out=r0[i]    down=r1[i]
          scale 1: in=r1[i-1]  out=r1[i]    down=r2[i-1]
          scale 2: in=r2[i-2]  out=r2[i-1]
        """
        L = self.layers
        n = L - 4  # scan length

        def sl(sample: RatioSample, lo):
            idx, score = sample
            return (jax.lax.dynamic_slice_in_dim(idx, lo, n),
                    jax.lax.dynamic_slice_in_dim(score, lo, n))

        r0 = (sl(ratios[0], 2), sl(ratios[0], 3), sl(ratios[1], 3))
        r1 = (sl(ratios[1], 2), sl(ratios[1], 3), sl(ratios[2], 2))
        r2 = (sl(ratios[2], 1), sl(ratios[2], 2), None)
        xs = (al[0][3:3 + n], al[1][2:2 + n], al[2][1:1 + n],
              be[1][1:1 + n], be[2][0:n], r0, r1, r2)

        body = GridLayer
        if self.remat:
            # prevent_cse must be off inside scan (XLA handles it there)
            body = nn.remat(GridLayer, prevent_cse=False)
        scan = nn.scan(body,
                       variable_axes={"params": 0, "batch_stats": 0},
                       split_rngs={"params": True},
                       in_axes=0, out_axes=0, length=n)
        carry = (out_prev[0][0], out_prev[0][1],
                 out_prev[1][0], out_prev[1][1], out_prev[2][0])
        carry, _ = scan(Fch=self.Fch,
                        width_mult_list=tuple(self.width_mult_list),
                        train=train, dtype=self.dtype,
                        name="slayers")(carry, xs)
        x0, d0, x1, d1, x2 = carry
        return [(x0, d0), (x1, d1), (x2, None)]

    @nn.compact
    def __call__(self, x, arch_idx: int, alphas, betas, ratios,
                 train: bool = True):
        """alphas/betas: raw logits (softmaxed here, model_search.py:275-281);
        ratios: list of 3 (idx, score) per-layer samples from
        search.gumbel.sample_ratios. arch_idx is static."""
        L = self.layers
        wml = tuple(self.width_mult_list)
        stem_w, head_w = self.stem_head_width[arch_idx]

        al = [jax.nn.softmax(a, axis=-1) for a in alphas]
        be = [None, jax.nn.softmax(betas[1], axis=-1),
              jax.nn.softmax(betas[2], axis=-1)]

        x = x.astype(self.dtype)
        stem_out = Stem(self.Fch, stem_w, dtype=self.dtype,
                        name=f"stem{arch_idx}")(x, train)
        # pad exact stem width up to grid max width (mask-layout boundary)
        pad_c = self.nf(8) - stem_out.shape[-1]
        if pad_c:
            stem_out = jnp.pad(stem_out, [(0, 0)] * 3 + [(0, pad_c)])

        def run_layer(i, out_prev):
            """One explicitly unrolled grid layer (boundary layers)."""
            out = []
            for j in range(self._scales_at(i)):
                down_cell = (j < 2) and (i < L - 1)
                cell_cls = (nn.remat(SlimCell, static_argnums=(4,))
                            if self.remat else SlimCell)
                cell = cell_cls(self.nf(8 * 2 ** j), down=down_cell,
                                width_mult_list=wml, dtype=self.dtype,
                                name=f"cell_{i}_{j}")
                alpha = al[j][i - j]
                ratio = self._cell_ratio(ratios, i, j, arch_idx)
                if j == 0:
                    o1, d1 = cell(out_prev[0][0], alpha, ratio, train)
                    out.append((o1, d1))
                elif i == j:
                    o0, d0 = cell(out_prev[j - 1][1], alpha, ratio, train)
                    out.append((o0, d0))
                else:
                    w = be[j][i - j - 1]
                    o0, d0 = cell(out_prev[j - 1][1], alpha, ratio, train)
                    o1, d1 = cell(out_prev[j][0], alpha, ratio, train)
                    o = o0 * w[0].astype(o0.dtype) + o1 * w[1].astype(o1.dtype)
                    d = None
                    if down_cell:
                        d = (d0 * w[0].astype(d0.dtype)
                             + d1 * w[1].astype(d1.dtype))
                    out.append((o, d))
            return out

        out_prev = [(stem_out, None)]
        if self.scan and L >= 5:
            for i in range(3):
                out_prev = run_layer(i, out_prev)
            out_prev = self._scan_middle(out_prev, al, be, ratios, train)
            out_prev = run_layer(L - 1, out_prev)
        else:
            for i in range(L):
                out_prev = run_layer(i, out_prev)

        # head-width static slices (grid -> fixed-width refine/heads)
        s8 = out_prev[0][0][..., :self.nf(8, head_w)]
        s16 = out_prev[1][0][..., :self.nf(16, head_w)]
        s32 = out_prev[2][0][..., :self.nf(32, head_w)]

        cn = lambda c, k, name: ConvNorm(c, kernel_size=k,
                                         padding=k // 2, dtype=self.dtype,
                                         name=f"{name}{arch_idx}")
        # refines (model_search.py:172-181, forward :338-344)
        out0 = s8
        out1 = scale_by(cn(self.nf(8, head_w), 1, "refine16_0")(s16, train), 2)
        out1 = cn(self.nf(8, head_w), 3, "refine16_1")(
            jnp.concatenate([out1, s8], -1), train)
        out2 = scale_by(cn(self.nf(16, head_w), 1, "refine32_0")(s32, train), 2)
        out2 = cn(self.nf(16, head_w), 3, "refine32_1")(
            jnp.concatenate([out2, s16], -1), train)
        out2 = scale_by(cn(self.nf(8, head_w), 1, "refine32_2")(out2, train), 2)
        out2 = cn(self.nf(8, head_w), 3, "refine32_3")(
            jnp.concatenate([out2, s8], -1), train)

        head = lambda name: Head(self.num_classes, dtype=self.dtype,
                                 name=f"{name}{arch_idx}")
        preds = [
            head("head0")(out0, train),
            head("head1")(out1, train),
            head("head2")(out2, train),
            head("head02")(jnp.concatenate([out0, out2], -1), train),
            head("head12")(jnp.concatenate([out1, out2], -1), train),
        ]
        if not train:
            preds = [scale_by(p, 8) for p in preds]
        return tuple(preds)


def unrolled_to_scan_variables(variables, layers: int):
    """Convert unrolled-layout variables (cell_{i}_{j} modules per layer)
    into the scan layout (slayers/cell{j} with weights stacked over layers
    3..L-2). Boundary layers and stems/refines/heads pass through. Used by
    the parity tests that pin scan == unrolled element-exactly."""
    mid = range(3, layers - 1)

    def convert(col):
        names = {f"cell_{i}_{j}" for i in mid for j in range(3)}
        out = {k: v for k, v in col.items() if k not in names}
        stacked = {}
        for j in range(3):
            subs = [col[f"cell_{i}_{j}"] for i in mid]
            stacked[f"cell{j}"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *subs)
        out["slayers"] = stacked
        return out

    return {c: (convert(v) if c in ("params", "batch_stats") else v)
            for c, v in variables.items()}


def init_supernet(model: Supernet, key, input_hw: Tuple[int, int],
                  num_widths_per_arch: Sequence[int]):
    """Initialize weights for every arch_idx (flax traces one call per
    init, so we init per arch and merge — shared grid params coincide
    because names and rng streams match)."""
    from ..search.gumbel import sample_ratios

    def deep_merge(a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(out[k], v) if (
                k in out and isinstance(v, dict)) else v
        return out

    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    merged = {}
    for arch_idx in range(len(model.stem_head_width)):
        ap = ArchParamsPytree.create(model.layers,
                                     num_widths=num_widths_per_arch[arch_idx])
        ratios = sample_ratios(jax.random.PRNGKey(0), ap.ratios, "max",
                               len(model.width_mult_list))
        # jit: eager init dispatches thousands of host ops (the scan
        # layout is pathological eagerly); compiled it is one program
        init_fn = jax.jit(functools.partial(model.init, arch_idx=arch_idx,
                                            train=True))
        v = init_fn(key, dummy, alphas=ap.alphas, betas=ap.betas,
                    ratios=ratios)
        merged = deep_merge(merged, jax.tree.map(lambda x: x, v))
    return merged
