"""Generate full-network numeric parity assets from the reference code.

Builds the reference torch Network_Multi_Path_Infer (student and teacher)
from the shipped genotypes with seeded random weights, runs an eval-mode
forward on a fixed random input, and saves:

  tests/assets/parity_{student,teacher}.npz
      input            (1, H, W, 3) NHWC float32
      output           (1, 8H', 8W', 19) reference eval logits (NHWC)
      state/<torch key> every state_dict tensor

The parity test (tests/test_torch_parity.py) imports the state dict with
utils.torch_import and checks our DerivedNet reproduces `output`
elementwise. Requires a copy of the reference at /tmp/FasterSeg (see
README); run once — the npz files are committed.
"""

import os
import sys

sys.path.insert(0, "/tmp/shims")  # thop/easydict stubs
sys.path.insert(0, "/tmp/FasterSeg/train")
sys.path.insert(0, "/tmp/FasterSeg/tools")
os.chdir("/tmp/FasterSeg/train")

import numpy as np
import torch

import model_seg as M

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WML = [4.0 / 12, 6.0 / 12, 8.0 / 12, 10.0 / 12, 1.0]
H, W = 64, 128


def build(arch_idx, ignore_skip, shw):
    state = torch.load(f"/tmp/FasterSeg/train/fasterseg/arch_{arch_idx}.pt",
                       map_location="cpu", weights_only=False)
    alphas = [state[f"alpha_{arch_idx}_{s}"].detach() for s in (0, 1, 2)]
    betas = [None, state[f"beta_{arch_idx}_1"].detach(),
             state[f"beta_{arch_idx}_2"].detach()]
    ratios = [state[f"ratio_{arch_idx}_{s}"].detach() for s in (0, 1, 2)]
    model = M.Network_Multi_Path_Infer(
        alphas, betas, ratios, num_classes=19, layers=16, Fch=12,
        width_mult_list=WML, stem_head_width=shw, ignore_skip=ignore_skip)
    from utils.darts_utils import objective_acc_lat
    obj02 = objective_acc_lat(float(state["mIoU02"]), float(state["latency02"]))
    obj12 = objective_acc_lat(float(state["mIoU12"]), float(state["latency12"]))
    model.build_structure([2, 0] if obj02 > obj12 else [2, 1])
    return model


def main():
    for name, arch_idx, ignore_skip, shw in [
        ("student", 1, False, (8.0 / 12, 8.0 / 12)),
        ("teacher", 0, True, (1.0, 1.0)),
    ]:
        torch.manual_seed(7)
        model = build(arch_idx, ignore_skip, shw)
        # randomize all params deterministically (seeded normal) so the
        # parity check exercises non-trivial weights + running stats
        g = torch.Generator().manual_seed(123)
        with torch.no_grad():
            for p in model.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
            for b in model.buffers():  # running mean/var
                if b.ndim >= 1:
                    b.copy_(torch.rand(b.shape, generator=g) * 0.5 +
                            (0.75 if "var" in str(b.dtype) else 0.0))
        # distinguish mean vs var buffers properly
        with torch.no_grad():
            for mod in model.modules():
                if isinstance(mod, torch.nn.BatchNorm2d) and mod.track_running_stats:
                    mod.running_mean.copy_(
                        torch.randn(mod.running_mean.shape, generator=g) * 0.2)
                    mod.running_var.copy_(
                        torch.rand(mod.running_var.shape, generator=g) * 0.5 + 0.75)
                    mod.num_batches_tracked.fill_(1)
        model.eval()
        rng = np.random.default_rng(42)
        x = rng.standard_normal((1, H, W, 3), dtype=np.float32)
        with torch.no_grad():
            t_in = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            y = model(t_in).numpy()
        y_nhwc = np.transpose(y, (0, 2, 3, 1))
        payload = {"input": x, "output": y_nhwc}
        for k, v in model.state_dict().items():
            payload[f"state/{k}"] = v.numpy()
        path = os.path.join(REPO, "tests", "assets", f"parity_{name}.npz")
        np.savez_compressed(path, **payload)
        print(f"{name}: wrote {path}, output shape {y_nhwc.shape}, "
              f"{len(payload)-2} state tensors")


if __name__ == "__main__":
    main()
