"""Golden data for slimmable-op parity: reference sliced ops vs our masks.

For each primitive (slimmable=True), stride, and a set of (w_in, w_out)
ratio pairs: build the torch op with seeded weights + running stats, run
eval-mode forward on a sliced random input, and record the full-width
state_dict plus outputs. tests/test_slimmable.py checks our masked ops
reproduce the outputs on the active channel prefix and stay zero beyond.

Requires the reference copy at /tmp/FasterSeg. Run once; npz is committed.
"""

import os
import sys

sys.path.insert(0, "/tmp/shims")
sys.path.insert(0, "/tmp/FasterSeg/search")
sys.path.insert(0, "/tmp/FasterSeg/tools")
os.chdir("/tmp/FasterSeg/search")

import numpy as np
import torch

import operations as OPS
from slimmable_ops import make_divisible

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WML = [4.0 / 12, 6.0 / 12, 8.0 / 12, 10.0 / 12, 1.0]
# supernet-realistic geometry: stride-1 cells keep width, stride-2 (down)
# cells double it (model_search.py:111-114); C=48/96 keeps make_divisible
# exactly linear, as in the real supernet (scale widths 96/192/384)
C_IN, H, W = 48, 16, 24


def c_out_for(stride):
    return C_IN * 2 if stride == 2 else C_IN

CASES = [
    ("skip", OPS.FactorizedReduce, 1),
    ("skip", OPS.FactorizedReduce, 2),
    ("conv", OPS.BasicResidual1x, 1),
    ("conv", OPS.BasicResidual1x, 2),
    ("conv_downup", OPS.BasicResidual_downup_1x, 1),
    ("conv_downup", OPS.BasicResidual_downup_1x, 2),
    ("conv_2x", OPS.BasicResidual2x, 1),
    ("conv_2x", OPS.BasicResidual2x, 2),
    ("conv_2x_downup", OPS.BasicResidual_downup_2x, 1),
    ("conv_2x_downup", OPS.BasicResidual_downup_2x, 2),
]
RATIOS = [(1.0, 1.0), (4.0 / 12, 4.0 / 12), (6.0 / 12, 10.0 / 12),
          (10.0 / 12, 6.0 / 12), (8.0 / 12, 1.0)]


def main():
    payload = {}
    rng = np.random.default_rng(11)
    g = torch.Generator().manual_seed(55)
    for name, cls, stride in CASES:
        c_out = c_out_for(stride)
        if name == "skip":
            op = cls(C_IN, c_out, stride, slimmable=True, width_mult_list=WML)
        else:
            op = cls(C_IN, c_out, kernel_size=3, stride=stride,
                     slimmable=True, width_mult_list=WML)
        with torch.no_grad():
            for p in op.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
            for mod in op.modules():
                if isinstance(mod, torch.nn.BatchNorm2d) and mod.track_running_stats:
                    mod.running_mean.copy_(torch.randn(mod.running_mean.shape,
                                                       generator=g) * 0.2)
                    mod.running_var.copy_(torch.rand(mod.running_var.shape,
                                                     generator=g) * 0.5 + 0.75)
        op.eval()
        key = f"{name}_s{stride}"
        for k, v in op.state_dict().items():
            payload[f"{key}/state/{k}"] = v.numpy()
        x_full = rng.standard_normal((1, C_IN, H, W)).astype(np.float32)
        payload[f"{key}/input"] = np.transpose(x_full, (0, 2, 3, 1))
        for wi, wo in RATIOS:
            if name == "skip" and stride == 1 and abs(wi - wo) > 1e-9:
                continue  # identity-ish path requires c_in==c_out slicing
            op.set_ratio((wi, wo))
            k_in = make_divisible(C_IN * wi)
            with torch.no_grad():
                y = op(torch.from_numpy(x_full[:, :k_in]))
            payload[f"{key}/out/{wi:.4f}_{wo:.4f}"] = (
                np.transpose(y.numpy(), (0, 2, 3, 1)))
    path = os.path.join(REPO, "tests", "assets", "slim_parity.npz")
    np.savez_compressed(path, **payload)
    print("wrote", path, len(payload), "entries")


if __name__ == "__main__":
    main()
