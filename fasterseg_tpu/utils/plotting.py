"""Genotype figures: op tables and path/width plots.

Equivalent of tools/utils/darts_utils.py plot_op (:308-341) and
plot_path_width (:256-306): render a decoded architecture as (a) a table
of per-cell ops/scales/widths and (b) the downsampling path with line
width proportional to channel width.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..core.genotype import PRIMITIVES

OP_SHORT = {0: "skip", 1: "conv", 2: "conv-zoom", 3: "conv2x",
            4: "conv2x-zoom"}


def plot_op(ops: Sequence[int], path: Sequence[int],
            widths: Sequence[float] = None, head_width: float = None,
            F_base: int = 12):
    """Table figure: one column per cell with op name, scale, #filters."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(ops)
    assert len(path) == n
    table = []
    for i in range(n):
        scale = 2 ** (path[i] + 3)
        if widths is not None:
            w = widths[i] if i < len(widths) else (head_width or 1.0)
            f = int(np.round(scale * F_base / 8 * 8 * w / 8))
            cell = f"{OP_SHORT[ops[i]]}\n1/{scale}\nw={w:.2f}"
        else:
            cell = f"{OP_SHORT[ops[i]]}\n1/{scale}"
        table.append(cell)
    fig, ax = plt.subplots(figsize=(max(6, n * 0.9), 1.6))
    ax.axis("off")
    tb = ax.table(cellText=[table],
                  colLabels=[str(i) for i in range(n)], loc="center",
                  cellLoc="center")
    tb.auto_set_font_size(False)
    tb.set_fontsize(7)
    tb.scale(1, 2.2)
    return fig


def plot_path_width(lasts: Sequence[int], paths: Sequence[Sequence[int]],
                    widths: Sequence[Sequence[float]]):
    """Downsample-path plot; line width tracks channel width
    (darts_utils.py:256-306)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 2.5))
    colors = ["tab:blue", "tab:orange", "tab:green"]
    for b, (last, path) in enumerate(zip(lasts, paths)):
        ws = list(widths[b]) + [widths[b][-1] if len(widths[b]) else 1.0]
        x = np.arange(len(path))
        y = -np.asarray(path, float) - b * 0.06  # slight offset per branch
        for i in range(len(path) - 1):
            ax.plot(x[i:i + 2], y[i:i + 2], color=colors[b % 3],
                    linewidth=1 + 4 * ws[i],
                    label=f"1/{2 ** (last + 3)}" if i == 0 else None)
    ax.set_yticks([0, -1, -2])
    ax.set_yticklabels(["1/8", "1/16", "1/32"])
    ax.set_xlabel("layer")
    ax.legend(loc="lower left", fontsize=7)
    fig.tight_layout()
    return fig
