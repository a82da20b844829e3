"""Architect: bi-level architecture-parameter optimization.

Equivalent of search/architect.py: first-order DARTS — one Adam
(lr 3e-4, betas (0.5, 0.999), no weight decay; architect.py:22-24) over
all alpha/beta/ratio parameters, minimizing validation-batch supernet loss
plus a fine-grained latency penalty (architect.py:55-76):

  loss_latency = sum_idx w_idx * [ r0 * E_lat(alpha | beta uniform, width max)
                                 + r1 * E_lat(beta  | alpha uniform, width max)
                                 + r2 * E_lat(width | alpha,beta uniform) ]
  (r0, r1, r2) = (1, 497, 2)/500  (or (1, 499)/500 with a single width)

The latency weights w_idx are traced scalars so the FPS-band controller
(train_search.py:204-212) can double/halve them without recompiling.
The unrolled second-order DARTS path (architect.py:78-127) is dead code in
the reference (config_search.py:107 unrolled=False) and is intentionally
not reproduced.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import optax

from ..latency.estimator import expected_latency_ms
from .gumbel import sample_ratios


def make_arch_optimizer(lr: float = 3e-4) -> optax.GradientTransformation:
    return optax.adam(learning_rate=lr, b1=0.5, b2=0.999)


def latency_terms(tables, stem_ms_per_arch: Sequence[float], arch_params,
                  keys, layers: int, num_widths: int, prun_modes,
                  stem_pins, head_pins):
    """Per-arch expected latency with the reference's alpha/beta/ratio
    split (architect.py:62-74). Returns {arch_idx: latency_ms}."""
    out: Dict[int, jax.Array] = {}
    if num_widths == 1:
        r0, r1, r2 = 1.0 / 500, 499.0 / 500, 0.0
    else:
        r0, r1, r2 = 1.0 / 500, 497.0 / 500, 2.0 / 500
    for idx, ap in arch_params.items():
        max_ratios = sample_ratios(keys[idx], ap.ratios, "max", num_widths)
        stem_ms = stem_ms_per_arch[idx]
        args = dict(tables=tables, stem_ms=stem_ms, layers=layers,
                    stem_pin=stem_pins[idx], head_pin=head_pins[idx])
        lat = r0 * expected_latency_ms(
            alphas=ap.alphas, betas=ap.betas, ratios=max_ratios,
            use_alpha=True, use_beta=False, **args)
        lat = lat + r1 * expected_latency_ms(
            alphas=ap.alphas, betas=ap.betas, ratios=max_ratios,
            use_alpha=False, use_beta=True, **args)
        if r2 > 0:
            g_ratios = sample_ratios(keys[idx], ap.ratios,
                                     prun_modes[idx], num_widths)
            lat = lat + r2 * expected_latency_ms(
                alphas=ap.alphas, betas=ap.betas, ratios=g_ratios,
                use_alpha=False, use_beta=False, **args)
        out[idx] = lat
    return out


class LatencyWeightController:
    """FPS-band feedback on the latency penalty
    (train_search.py:204-212): halve when either decoded branch is at or
    above FPS_max, double when either is at or below FPS_min.

    Deviation from the reference (PARITY.md): the doubling is CAPPED at
    `initial_weight * 2**max_doublings` (default 2^8 = 256x). The
    reference's rule is unbounded because its band straddles its
    supernet's starting operating point, so its authors never saw the
    failure mode; when the decoded arch starts below the band the
    unbounded rule doubles every epoch and the latency term swamps the
    task loss — the round-4 self-search run reached weight 1.34e6
    (6.7e7x initial) and search-time val mIoU collapsed while the
    genotype froze (SEARCH.md trajectory; VERDICT r4 weak #4). 256x
    initial is already ~8x the total dynamic range the reference's own
    runs traverse, so the cap cannot bind in a reference-faithful run."""

    def __init__(self, latency_weight: Sequence[float],
                 fps_min: Sequence[float], fps_max: Sequence[float],
                 max_doublings: int = 8):
        self.weights = list(latency_weight)
        self.fps_min = list(fps_min)
        self.fps_max = list(fps_max)
        self.max_weights = [w * 2.0 ** max_doublings for w in self.weights]

    def update(self, arch_idx: int, fps0: float, fps1: float) -> float:
        if self.weights[arch_idx] > 0:
            if fps0 >= self.fps_max[arch_idx] or fps1 >= self.fps_max[arch_idx]:
                self.weights[arch_idx] /= 2
            elif fps0 <= self.fps_min[arch_idx] or fps1 <= self.fps_min[arch_idx]:
                self.weights[arch_idx] = min(self.weights[arch_idx] * 2,
                                             self.max_weights[arch_idx])
        return self.weights[arch_idx]
