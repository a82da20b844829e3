"""Differentiable expected supernet latency.

Equivalent of Network_Multi_Path.forward_latency
(model_search.py:361-476): expected latency under the current architecture
distribution, differentiable w.r.t. alpha (op mix), beta (downsample
topology) and ratio (width) parameters. Consumes the precomputed latency
tensors from latency/tables.py — inside jit it is a pure gather +
contraction, no dict lookups.

Semantics notes:
* Per-cell latency = sum_op alpha_op * LUT[op, w_in, w_out] * s_in * s_out
  where (w, s) are the hard width index and straight-through score —
  exactly the reference MixedOp.forward_latency (model_search.py:80-99).
* The beta-weighted path recurrence follows model_search.py:456-469,
  including the sequential update where a cell's down-branch accumulator
  sees its own keep-branch latency. One deliberate fix: the reference
  indexes `betas[j][i-j-1]` with a stale loop variable j
  (model_search.py:468-469, SURVEY.md quirk list); we use the accumulating
  scale's own beta, betas[ii][i-ii-1].
* The architect's alpha/beta/ratio switches (architect.py:62-74 →
  model_search.py:366-392) map to `use_alpha/use_beta/use_ratio`; disabled
  terms use uniform alpha/beta or max-width ratios.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .tables import has_down, scales_at

RatioSample = Tuple[jax.Array, jax.Array]


def cell_ratio_wiring(ratios: Sequence[RatioSample], i: int, j: int,
                      layers: int, stem_pin: RatioSample,
                      head_pin: RatioSample):
    """(in, out, down) width samples for cell (layer i, scale j) —
    model_search.py:297-316. Shared by supernet forward and this
    estimator so compute and latency always agree."""
    at = lambda s, k: (ratios[s][0][k], ratios[s][1][k])
    if i == 0 and j == 0:
        return (stem_pin, at(0, 0), at(1, 0))
    if i == layers - 1:
        r_in = at(j, i - j - 1) if j == 0 else at(j, i - j)
        return (r_in, head_pin, None)
    if j == 2:
        return (at(2, i - 2), at(2, i - 1), None)
    if j == 0:
        return (at(0, i - 1), at(0, i), at(1, i))
    return (at(1, i - 1), at(1, i), at(2, i - 1))


def _cell_ms(table_ij: jax.Array, alpha: jax.Array, r_in: RatioSample,
             r_out: RatioSample) -> jax.Array:
    v = table_ij[:, r_in[0], r_out[0]]            # (num_ops,)
    return jnp.dot(alpha, v) * r_in[1] * r_out[1]


def expected_latency_ms(tables, stem_ms: float, alphas, betas,
                        ratios: Sequence[RatioSample], layers: int,
                        stem_pin: RatioSample, head_pin: RatioSample,
                        use_alpha: bool = True, use_beta: bool = True
                        ) -> jax.Array:
    """Expected end-to-end ms. `tables` = {'keep','down'} jnp arrays
    (L,3,5,nw,nw); ratios are (idx, score) per-layer samples (already
    reflecting use_ratio: pass mode='max' samples to disable)."""
    keep_t = tables["keep"]
    down_t = tables["down"]
    num_ops = keep_t.shape[2]

    if use_alpha:
        al = [jax.nn.softmax(a, axis=-1) for a in alphas]
    else:
        al = [jnp.full(a.shape, 1.0 / num_ops) for a in alphas]
    if use_beta:
        be = [None, jax.nn.softmax(betas[1], axis=-1),
              jax.nn.softmax(betas[2], axis=-1)]
    else:
        be = [None, jnp.full(betas[1].shape, 0.5),
              jnp.full(betas[2].shape, 0.5)]

    # accumulators per scale: [keep_path_ms, down_path_ms]
    total = [[jnp.float32(stem_ms), jnp.float32(0)],
             [jnp.float32(0), jnp.float32(0)],
             [jnp.float32(0), jnp.float32(0)]]

    for i in range(layers):
        lat: List[List[Optional[jax.Array]]] = []
        for j in range(scales_at(i)):
            alpha = al[j][i - j]
            r_in, r_out, r_down = cell_ratio_wiring(ratios, i, j, layers,
                                                    stem_pin, head_pin)
            k_ms = _cell_ms(keep_t[i, j], alpha, r_in, r_out)
            d_ms = None
            if has_down(i, j, layers):
                d_ms = _cell_ms(down_t[i, j], alpha, r_in, r_down)
            lat.append([k_ms, d_ms])

        for ii, l in enumerate(lat):
            if ii == 0:
                total[0][0] = total[0][0] + l[0]
                if l[1] is not None:
                    total[0][1] = total[0][0] + l[1]
            elif i == ii:
                total[ii][0] = total[ii - 1][1] + l[0]
                if l[1] is not None:
                    total[ii][1] = total[ii - 1][1] + l[1]
            else:
                w = be[ii][i - ii - 1]
                total[ii][0] = (w[1] * total[ii][0] + w[0] * total[ii - 1][1]
                                + l[0])
                if l[1] is not None:
                    total[ii][1] = (w[1] * total[ii][0]
                                    + w[0] * total[ii - 1][1] + l[1])
        # scales beyond current layer keep their accumulators

    return total[0][0] + total[1][0] + total[2][0]
