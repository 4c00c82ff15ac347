"""Scalar/image loss logging to TensorBoard + git provenance capture.

Reference: ``vision_base/utils/logger.py`` (``AverageMeter:6``, ``LossLogger:36``,
``update_hm:60``, ``styling_git_info:90``). TensorBoard writing is optional: when
the ``tensorboard`` package (or a writer) is unavailable the logger degrades to
keeping in-memory averages, so headless/test runs carry no heavy dependency.
"""
from __future__ import annotations

import subprocess
from typing import Dict, Optional

import numpy as np


class AverageMeter:
    """Running average of a scalar (reference ``logger.py:6-22``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def _colorize_heatmap(data: np.ndarray) -> np.ndarray:
    """Normalize a [H, W] array into a uint8 RGB jet-style heatmap
    (reference renders loss masks/depths as TB images, ``logger.py:60-74``)."""
    data = np.asarray(data, dtype=np.float32)
    lo, hi = float(np.min(data)), float(np.max(data))
    norm = (data - lo) / (hi - lo + 1e-8)
    # simple 3-stop colormap (blue -> green -> red)
    r = np.clip(2.0 * norm - 1.0, 0, 1)
    g = 1.0 - np.abs(2.0 * norm - 1.0)
    b = np.clip(1.0 - 2.0 * norm, 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


class LossLogger:
    """Accumulate per-step scalar losses + image heatmaps and flush them to a
    SummaryWriter every ``disp_iter`` (reference ``logger.py:36-74``)."""

    def __init__(self, writer=None, split: str = "training"):
        self.writer = writer
        self.split = split
        self.loss_stats: Dict[str, AverageMeter] = {}
        self.hm: Dict[str, np.ndarray] = {}

    def reset(self):
        self.loss_stats = {}
        self.hm = {}

    def update(self, loss_dict: Dict[str, float], hm: Optional[Dict] = None):
        for key, value in loss_dict.items():
            if key not in self.loss_stats:
                self.loss_stats[key] = AverageMeter()
            self.loss_stats[key].update(np.asarray(value).mean())
        if hm:
            self.update_hm(hm)

    def update_hm(self, hm: Dict):
        for key, value in hm.items():
            if isinstance(value, dict):
                value = value.get("data")
            if value is None:
                continue
            self.hm[key] = np.asarray(value)

    def log(self, step: int):
        if self.writer is None:
            return
        for key, meter in self.loss_stats.items():
            self.writer.add_scalar(f"{self.split}/{key}", meter.avg, step)
        for key, image in self.hm.items():
            img = np.squeeze(image)
            if img.ndim == 2:
                img = _colorize_heatmap(img)
                self.writer.add_image(f"{self.split}/{key}", img, step,
                                      dataformats="HWC")
            elif img.ndim == 3:
                # [C,H,W] or [H,W,C] float image
                if img.shape[0] in (1, 3):
                    self.writer.add_image(f"{self.split}/{key}", img, step,
                                          dataformats="CHW")
                else:
                    self.writer.add_image(f"{self.split}/{key}", img, step,
                                          dataformats="HWC")
        self.reset()


def styling_git_info(repo_path: str = ".") -> str:
    """Format last commit + working diff as markdown for TB provenance
    (reference ``logger.py:90-93``, used ``scripts/train.py:59-62``).
    Uses subprocess git directly — no gitpython dependency."""
    try:
        log = subprocess.run(
            ["git", "-C", repo_path, "log", "-1", "--pretty=format:%H%n%an%n%ad%n%s"],
            capture_output=True, text=True, timeout=10).stdout
        diff = subprocess.run(
            ["git", "-C", repo_path, "diff"],
            capture_output=True, text=True, timeout=10).stdout
    except Exception:  # noqa: BLE001 - not a git repo / git missing
        return "git info unavailable"
    return f"### git log\n\n```\n{log}\n```\n\n### git diff\n\n```diff\n{diff}\n```"
