"""Checkpointing: weights, optimizer state, arch params.

Reference behavior (SURVEY.md §5.4): raw state_dict written every epoch
(darts_utils.py:68-69), arch params saved per-epoch and rolling
(train_search.py:185-202), and *partial-match* loading that keeps only
key-and-shape-matching entries with warnings (pyt_utils.py:40-77,
train_search.py:70-75). Optimizer state was never checkpointed — here we
checkpoint full TrainStates via orbax so resume is exact, while keeping
partial-match loading for transfer (pretrain -> search).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np

logger = logging.getLogger("fasterseg_tpu")


def save_pytree(path: str, tree: Any):
    """Orbax StandardCheckpointer save (directory-based)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), target)
    except ValueError as e:
        if "not found in jax.local_devices" not in str(e):
            raise
        # Checkpoint written on a device this process doesn't have (e.g.
        # a TPU-trained ckpt opened on the CPU mesh): restore every leaf
        # as host numpy instead of onto the recorded sharding.
        path = os.path.abspath(path)
        with ocp.PyTreeCheckpointer() as ptc:
            meta = ptc.metadata(path).item_metadata.tree
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            out = ptc.restore(path, restore_args=restore_args)
        if target is not None:
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(target),
                jax.tree_util.tree_leaves(out))
        return out


def save_npz_tree(path: str, tree: Any):
    """Flat npz snapshot (small artifacts: arch params, genotypes)."""
    flat = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[jax.tree_util.keystr(p)] = np.asarray(leaf)
    np.savez_compressed(path, **flat)


def partial_load(target: Dict, loaded: Dict, prefix: str = "") -> Dict:
    """Merge `loaded` into `target`, keeping only path+shape matches.

    Reference semantics (pyt_utils.py:40-77): intersect keys, require
    matching shapes, warn about missing / unexpected / shape-mismatched
    entries, return the merged tree.
    """
    missing: List[str] = []
    mismatched: List[str] = []
    used = set()

    def walk(dst, src, path):
        out = {}
        for k, v in dst.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                out[k] = walk(v, src.get(k, {}) if isinstance(src, dict) else {}, p)
            elif isinstance(src, dict) and k in src and not isinstance(src[k], dict):
                if np.shape(src[k]) == np.shape(v):
                    out[k] = src[k]
                    used.add(p)
                else:
                    mismatched.append(p)
                    out[k] = v
            else:
                missing.append(p)
                out[k] = v
        return out

    merged = walk(target, loaded, prefix)

    def collect(src, path):
        for k, v in src.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                collect(v, p)
            elif p not in used:
                unexpected.append(p)

    unexpected: List[str] = []
    collect(loaded, prefix)
    if missing:
        logger.warning("partial_load: %d params not in checkpoint (e.g. %s)",
                       len(missing), missing[:3])
    if unexpected:
        logger.warning("partial_load: %d checkpoint entries unused (e.g. %s)",
                       len(unexpected), unexpected[:3])
    if mismatched:
        logger.warning("partial_load: %d shape mismatches skipped (e.g. %s)",
                       len(mismatched), mismatched[:3])
    return merged


def save_arch(path: str, arch, mIoU02: Optional[float] = None,
              latency02: Optional[float] = None,
              mIoU12: Optional[float] = None,
              latency12: Optional[float] = None):
    """Arch-params artifact, reference-shaped (train_search.py:186-202):
    alpha/beta/ratio tensors + search-time branch metrics."""
    payload = {
        "alpha0": np.asarray(arch.alphas[0]),
        "alpha1": np.asarray(arch.alphas[1]),
        "alpha2": np.asarray(arch.alphas[2]),
        "beta1": np.asarray(arch.betas[1]),
        "beta2": np.asarray(arch.betas[2]),
        "ratio0": np.asarray(arch.ratios[0]),
        "ratio1": np.asarray(arch.ratios[1]),
        "ratio2": np.asarray(arch.ratios[2]),
    }
    for k, v in [("mIoU02", mIoU02), ("latency02", latency02),
                 ("mIoU12", mIoU12), ("latency12", latency12)]:
        if v is not None:
            payload[k] = np.float64(v)
    np.savez_compressed(path, **payload)


def load_arch(path: str):
    from ..core.genotype import ArchParams
    return ArchParams.from_npz(path)
