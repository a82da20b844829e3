"""Post-training int8 quantization of the decoded serving network.

The reference's production serving story is a TensorRT engine with
fp32/int8 builder modes (darts_utils.py:97-179); this is the TPU-native
equivalent: per-output-channel symmetric int8 weights for every conv
kernel, dequantized to the compute dtype inside the jitted forward
(weight-only PTQ). Checkpoint/off-chip weight bytes drop 4x vs f32
(2x vs bf16) and classmaps agree with the bf16 path on >99.9% of
pixels (tests/test_quantize.py).

Measured reality on this backend (probed, see README): XLA's int8
convolutions run at ~0.9-1.0x the bf16 conv rate on the attached TPU —
int8 ACTIVATION paths buy no speed here, so the default serving dtype
stays bf16 and int8 is a deployment-size/feature-parity option, not the
throughput path. `quantize_variables` therefore dequantizes weights at
use; XLA folds the (tiny) per-kernel dequant into the conv's producer
fusion.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.plan import NetworkPlan
from .infer import InferenceRunner


def _is_conv_kernel(path, leaf) -> bool:
    names = [getattr(k, "key", None) for k in path]
    return names and names[-1] == "kernel" and getattr(leaf, "ndim", 0) == 4


def quantize_params(params) -> Tuple[Any, Any]:
    """Split params into (quantized pytree, scales pytree).

    Conv kernels (HWIO) become int8 with per-output-channel symmetric
    scales (absmax / 127, the TensorRT weight-quantization rule); every
    other leaf passes through unchanged (scale leaf = None)."""

    def q(path, leaf):
        if not _is_conv_kernel(path, leaf):
            return leaf, None
        w = jnp.asarray(leaf, jnp.float32)
        absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        qw = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return qw, scale.astype(jnp.float32)

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    qleaves, sleaves = [], []
    for path, leaf in leaves:
        ql, sl = q(path, leaf)
        qleaves.append(ql)
        sleaves.append(sl)
    qtree = jax.tree_util.tree_unflatten(treedef, qleaves)
    stree = jax.tree_util.tree_unflatten(
        treedef, [s if s is not None else 0.0 for s in sleaves])
    return qtree, stree


def dequantize_params(qtree, stree, dtype=jnp.bfloat16):
    """Inverse of quantize_params (inside jit; fused by XLA)."""

    def dq(qleaf, sleaf):
        if qleaf.dtype == jnp.int8:
            return (qleaf.astype(jnp.float32) * sleaf).astype(dtype)
        return qleaf

    return jax.tree.map(dq, qtree, stree)


class QuantizedRunner:
    """InferenceRunner over int8 weights: dequantize inside the jit,
    then the identical bf16 serving path (fast Pallas stem + fused
    heads). .logits / .classmap as InferenceRunner."""

    def __init__(self, plan: NetworkPlan, dtype=jnp.bfloat16,
                 fast_stem_enabled: bool = True):
        self.plan = plan
        self.dtype = dtype
        self._inner = None
        self._fast_stem = fast_stem_enabled

        def _build(qvars):
            params = dequantize_params(qvars["params_q"],
                                       qvars["params_scale"], dtype)
            return {"params": params,
                    "batch_stats": qvars["batch_stats"]}

        inner = InferenceRunner(plan, None, dtype=dtype,
                                fast_stem_enabled=fast_stem_enabled)

        def logits(qvars, x):
            return inner.logits_fn(_build(qvars), x)

        def classmap(qvars, x):
            return inner.classmap_fn(_build(qvars), x)

        self.logits = jax.jit(logits)
        self.classmap = jax.jit(classmap)


def quantize_variables(plan: NetworkPlan, variables,
                       dtype=jnp.bfloat16) -> Tuple[Dict, QuantizedRunner]:
    """variables (bf16/f32) -> (int8 qvars, QuantizedRunner)."""
    qtree, stree = quantize_params(variables["params"])
    qvars = {"params_q": qtree, "params_scale": stree,
             "batch_stats": variables.get("batch_stats", {})}
    return qvars, QuantizedRunner(plan, dtype=dtype)
