"""Gumbel-softmax sampling and width-ratio sampling.

Equivalents of the reference's straight-through Gumbel
(search/model_search.py:14-43) and `sample_prun_ratio`
(model_search.py:209-261). Widths travel through the jitted supernet as
(index, score) pairs: `index` (traced int) selects channel masks / BN
rows, `score` carries the straight-through gradient (the hard sample's
max entry — value 1.0, gradient of the soft sample), exactly the
r_score the reference multiplies into MixedOp outputs
(model_search.py:60-78).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def sample_gumbel(key, shape, eps: float = 1e-20):
    u = jax.random.uniform(key, shape)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax(key, logits, temperature: float = 1.0,
                   hard: bool = False):
    """ST Gumbel-softmax (model_search.py:25-43)."""
    y = jax.nn.softmax((logits + sample_gumbel(key, logits.shape))
                       / temperature, axis=-1)
    if not hard:
        return y
    idx = jnp.argmax(y, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(y_hard - y) + y


RatioSample = Tuple[jax.Array, jax.Array]  # (idx int32 [n], score float [n])


def _st_sample(key, logits) -> RatioSample:
    y = gumbel_softmax(key, jax.nn.log_softmax(logits, axis=-1), hard=True)
    idx = jnp.argmax(jax.lax.stop_gradient(y), axis=-1).astype(jnp.int32)
    score = jnp.max(y, axis=-1)  # value 1.0, grad flows to logits
    return idx, score


def sample_ratios(key, ratio_logits: Sequence[jax.Array], mode: str,
                  num_widths: int) -> List[RatioSample]:
    """Per-layer width samples for the three scales
    (model_search.py:209-261). Modes:
      arch_ratio — ST Gumbel over log-softmax logits
      min / max  — force the smallest / largest width
      random     — uniform width choice (pretrain sandwich rule)

    Indices refer to the GLOBAL width_mult_list; 'max' maps to its last
    entry even when the arch's ratio params are 1-wide (teacher search
    with prun_mode='max', model_search.py:523-527).
    """
    out: List[RatioSample] = []
    keys = jax.random.split(key, len(ratio_logits))
    for k, logits in zip(keys, ratio_logits):
        n = logits.shape[0]
        if mode == "arch_ratio":
            idx, score = _st_sample(k, logits)
            if logits.shape[-1] == 1:
                # 1-wide ratio params: argmax is 0; remap to global max width
                idx = jnp.full((n,), num_widths - 1, jnp.int32)
            out.append((idx, score))
        elif mode == "min":
            out.append((jnp.zeros((n,), jnp.int32), jnp.ones((n,))))
        elif mode == "max":
            out.append((jnp.full((n,), num_widths - 1, jnp.int32),
                        jnp.ones((n,))))
        elif mode == "random":
            idx = jax.random.randint(k, (n,), 0, num_widths, jnp.int32)
            out.append((idx, jnp.ones((n,))))
        else:
            raise ValueError(mode)
    return out
