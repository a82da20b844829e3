"""Import reference (PyTorch) checkpoints into fasterseg_tpu variables.

Converts a `Network_Multi_Path_Infer` state_dict (reference
train/model_seg.py — the published FasterSeg weights use this format) into
our flax parameter/batch-stats pytrees, so users of the reference can bring
their trained weights across. Also powers the full-network numeric parity
tests (tests/test_torch_parity.py).

Layout conversions:
  conv weight  torch (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
  BN weight/bias -> scale/bias; running_mean/var -> batch_stats mean/var

The state_dict may be a real torch state_dict or any mapping of
numpy-convertible arrays keyed by the torch names.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from ..core.plan import NetworkPlan

# torch module layout per primitive (PRIMITIVES index -> [(torch_sub, flax_sub, kind)])
_OP_LAYOUTS = {
    0: [("conv1", "Conv_0", "conv"), ("conv2", "Conv_1", "conv"),
        ("bn", "BatchNorm_0", "bn")],                      # FactorizedReduce s2
    1: [("conv1", "Conv_0", "conv"), ("bn1", "BatchNorm_0", "bn")],
    2: [("conv1", "Conv_0", "conv"), ("bn1", "BatchNorm_0", "bn")],
    3: [("conv1", "Conv_0", "conv"), ("bn1", "BatchNorm_0", "bn"),
        ("conv2", "Conv_1", "conv"), ("bn2", "BatchNorm_1", "bn")],
    4: [("conv1", "Conv_0", "conv"), ("bn1", "BatchNorm_0", "bn"),
        ("conv2", "Conv_1", "conv"), ("bn2", "BatchNorm_1", "bn")],
}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class _Writer:
    def __init__(self, sd: Mapping):
        self.sd = sd
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used = set()

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, tkey: str, fpath: Tuple[str, ...], bias: bool = False):
        w = _np(self.sd[f"{tkey}.weight"]).transpose(2, 3, 1, 0)
        self.used.add(f"{tkey}.weight")
        self._set(self.params, fpath + ("conv", "kernel"), w)
        if bias:
            b = _np(self.sd[f"{tkey}.bias"])
            self.used.add(f"{tkey}.bias")
            self._set(self.params, fpath + ("conv", "bias"), b)

    def bn(self, tkey: str, fpath: Tuple[str, ...]):
        self._set(self.params, fpath + ("bn", "scale"), _np(self.sd[f"{tkey}.weight"]))
        self._set(self.params, fpath + ("bn", "bias"), _np(self.sd[f"{tkey}.bias"]))
        self.used.update({f"{tkey}.weight", f"{tkey}.bias"})
        mean_key, var_key = f"{tkey}.running_mean", f"{tkey}.running_var"
        if mean_key in self.sd:
            self._set(self.stats, fpath + ("bn", "mean"), _np(self.sd[mean_key]))
            self._set(self.stats, fpath + ("bn", "var"), _np(self.sd[var_key]))
            self.used.update({mean_key, var_key})
        else:
            # search-time USBatchNorm parents have no running stats
            n = _np(self.sd[f"{tkey}.weight"]).shape[0]
            self._set(self.stats, fpath + ("bn", "mean"), np.zeros(n, np.float32))
            self._set(self.stats, fpath + ("bn", "var"), np.ones(n, np.float32))

    def convnorm(self, tkey: str, fpath: Tuple[str, ...]):
        """Reference ConvNorm: Sequential(conv, bn, relu) (operations.py:76-82)."""
        self.conv(f"{tkey}.conv.0", fpath + ("Conv_0",))
        self.bn(f"{tkey}.conv.1", fpath + ("BatchNorm_0",))

    def conv_bn_relu(self, tkey: str, fpath: Tuple[str, ...]):
        """Reference seg_oprs.ConvBnRelu: named .conv / .bn children."""
        self.conv(f"{tkey}.conv", fpath + ("Conv_0",))
        self.bn(f"{tkey}.bn", fpath + ("BatchNorm_0",))

    def residual2x(self, tkey: str, fpath: Tuple[str, ...]):
        self.conv(f"{tkey}.conv1", fpath + ("Conv_0",))
        self.bn(f"{tkey}.bn1", fpath + ("BatchNorm_0",))
        self.conv(f"{tkey}.conv2", fpath + ("Conv_1",))
        self.bn(f"{tkey}.bn2", fpath + ("BatchNorm_1",))

    def op(self, op_idx: int, stride: int, tkey: str, fpath: Tuple[str, ...]):
        if op_idx == 0 and stride == 1:
            return  # identity skip has no params
        for tsub, fsub, kind in _OP_LAYOUTS[op_idx]:
            if kind == "conv":
                self.conv(f"{tkey}.{tsub}", fpath + (fsub,))
            else:
                self.bn(f"{tkey}.{tsub}", fpath + (fsub,))

    def head(self, tkey: str, fpath: Tuple[str, ...]):
        self.conv_bn_relu(f"{tkey}.conv_3x3", fpath + ("conv_3x3",))
        self.conv(f"{tkey}.conv_1x1", fpath + ("conv_1x1",), bias=True)


def import_slim_op_state(sd: Mapping, op_idx: int, stride: int,
                         c_max_out: int,
                         width_mult_list, prefix: str = ""):
    """Convert a reference slimmable-op state_dict (USConv2d full-width
    weights + per-width USBatchNorm2d children, slimmable_ops.py:21-70)
    into variables for our ops.slimmable modules.

    Per-width BN rows are filled on their active prefix
    (make_divisible(C*w) channels); the padding region is inert because
    outputs are masked."""
    from ..ops.slimmable import make_divisible

    params: Dict = {}
    stats: Dict = {}

    def conv(tkey, fname):
        w = _np(sd[f"{prefix}{tkey}.weight"]).transpose(2, 3, 1, 0)
        params[fname] = {"conv": {"kernel": w}}

    def us_bn(tkey, fname, c_max):
        nw = len(width_mult_list)
        scale = np.ones((nw, c_max), np.float32)
        bias = np.zeros((nw, c_max), np.float32)
        mean = np.zeros((nw, c_max), np.float32)
        var = np.ones((nw, c_max), np.float32)
        for i, wm in enumerate(width_mult_list):
            k = make_divisible(c_max * wm)
            scale[i, :k] = _np(sd[f"{prefix}{tkey}.bn.{i}.weight"])
            bias[i, :k] = _np(sd[f"{prefix}{tkey}.bn.{i}.bias"])
            mean[i, :k] = _np(sd[f"{prefix}{tkey}.bn.{i}.running_mean"])
            var[i, :k] = _np(sd[f"{prefix}{tkey}.bn.{i}.running_var"])
        params[fname] = {"scale": scale, "bias": bias}
        stats[fname] = {"mean": mean, "var": var}

    if op_idx == 0:
        if stride == 1:
            conv("conv1", "conv1")
            us_bn("bn", "bn", c_max_out)
        else:
            w1 = _np(sd[f"{prefix}conv1.weight"]).transpose(2, 3, 1, 0)
            w2 = _np(sd[f"{prefix}conv2.weight"]).transpose(2, 3, 1, 0)
            params["conv1"] = {"kernel": w1}
            params["conv2"] = {"kernel": w2}
            us_bn("bn", "bn", c_max_out)
    else:
        conv("conv1", "conv1")
        us_bn("bn1", "bn1", c_max_out)
        if op_idx in (3, 4):
            conv("conv2", "conv2")
            us_bn("bn2", "bn2", c_max_out)
    return {"params": params, "batch_stats": stats}


def import_derived_state_dict(sd: Mapping, plan: NetworkPlan):
    """state_dict of Network_Multi_Path_Infer -> {'params':…, 'batch_stats':…}.

    Returns variables compatible with models.derived.DerivedNet(plan).
    Keys present in the checkpoint but unused (e.g. eval-only checkpoints
    without aux heads) are tolerated; missing required keys raise KeyError.
    """
    w = _Writer(sd)

    # stem (model_seg.py:192-196)
    w.convnorm("stem.0", ("stem", "stage0"))
    w.residual2x("stem.1", ("stem", "stage1"))
    w.residual2x("stem.2", ("stem", "stage2"))

    # cells
    for c in plan.cells:
        tkey = f"cells.{c.layer}-{c.branch}._op._op"
        w.op(c.op, 2 if c.down else 1, tkey,
             (f"cell_{c.layer}_{c.branch}",))

    # aggregation (model_seg.py:227-239)
    if 2 in plan.lasts:
        w.convnorm("arms32.0", ("arms32_0",))
        w.convnorm("arms32.1", ("arms32_1",))
        w.convnorm("refines32.0", ("refines32_0",))
        w.convnorm("refines32.1", ("refines32_1",))
    if 1 in plan.lasts:
        w.convnorm("arms16", ("arms16",))
        w.convnorm("refines16", ("refines16",))
    w.conv_bn_relu("ffm.conv_1x1", ("ffm", "conv_1x1"))
    w.head("heads8", ("heads8",))
    if any(k.startswith("heads16.") for k in sd):
        w.head("heads16", ("heads16",))
    if any(k.startswith("heads32.") for k in sd):
        w.head("heads32", ("heads32",))

    return {"params": w.params, "batch_stats": w.stats}
