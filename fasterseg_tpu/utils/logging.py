"""Observability: colored console/file logging + scalar/image writers.

Equivalent of tools/engine/logger.py (colored logger with the
ENGINE_LOGGING_LEVEL env override) and the tensorboardX SummaryWriter usage
throughout train_search.py / train.py. The metric writer prefers
TensorBoard (torch.utils.tensorboard) and always mirrors scalars into a
JSONL file so runs remain inspectable without TB.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional

_COLORS = {"WARNING": 33, "INFO": 36, "DEBUG": 37, "CRITICAL": 35,
           "ERROR": 31}


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        if sys.stdout.isatty() and record.levelname in _COLORS:
            return f"\x1b[{_COLORS[record.levelname]}m{msg}\x1b[0m"
        return msg


def get_logger(name: str = "fasterseg_tpu",
               log_file: Optional[str] = None,
               level: Optional[str] = None) -> logging.Logger:
    """Colored console logger; optional file sink; level from
    FASTERSEG_LOGGING_LEVEL (tools/engine/logger.py:5 equivalent)."""
    logger = logging.getLogger(name)
    if not getattr(logger, "_fasterseg_configured", False):
        level = level or os.environ.get("FASTERSEG_LOGGING_LEVEL", "INFO")
        logger.setLevel(getattr(logging, level.upper(), logging.INFO))
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(_ColorFormatter(
            "%(asctime)s %(levelname)s %(message)s", datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(h)
        logger._fasterseg_configured = True
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(fh)
    return logger


class MetricWriter:
    """add_scalar/add_image/add_figure like SummaryWriter; JSONL mirror."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "time": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_figure(self, tag: str, figure, step: int):
        path = os.path.join(self.log_dir,
                            f"{tag.replace('/', '_')}_{step}.png")
        figure.savefig(path, bbox_inches="tight")
        if self._tb is not None:
            self._tb.add_figure(tag, figure, step)

    def add_image(self, tag: str, image_hwc, step: int):
        if self._tb is not None:
            import numpy as np
            self._tb.add_image(tag, np.transpose(image_hwc, (2, 0, 1)), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def create_exp_dir(base: str, name: Optional[str] = None) -> str:
    """Timestamped run directory (darts_utils.py:85-94 behavior — the
    reference also snapshots *.py scripts; we record the git revision
    instead, which identifies the exact code)."""
    run = f"{name or 'run'}-{time.strftime('%Y%m%d-%H%M%S')}"
    path = os.path.join(base, run)
    os.makedirs(path, exist_ok=True)
    try:
        import subprocess
        rev = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
        with open(os.path.join(path, "GIT_REVISION"), "w") as f:
            f.write(rev + "\n")
    except Exception:
        pass
    return path


def enable_compilation_cache(cache_dir: str = None):
    """Persistent XLA compilation cache for CLI runs.

    The supernet engine programs cost minutes of (remote) TPU compile;
    caching them makes repeat CLI invocations start in seconds. Called
    by every CLI entry point; safe to call more than once. Default
    location: ~/.cache/fasterseg_tpu/xla."""
    import jax
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "fasterseg_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
