"""Supervised 9-metric depth evaluation CLI.

Reference: ``monodepth/evaluation/kitti_supervised_eval.py`` — numba-compiled
``compute_errors:6-81`` (replaced by the vectorized suite in
``ops/metrics.compute_supervised_errors``), ``evaluate_depth:122`` (PNG dirs)
and ``evaluate_depth_unsupervised_aligned:83`` (npz GT).

Usage:
    python -m fsnet_tpu.evaluation.kitti_supervised_eval LABEL RESULT
"""
from __future__ import annotations

import os
from typing import List

import cv2
import numpy as np

from ..ops.metrics import SUPERVISED_METRIC_NAMES, compute_supervised_errors

METRIC_DISPLAY_NAMES = [
    "mae", "rmse", "inverse mae", "inverse rmse", "log mae", "log rmse",
    "scale invariant log", "abs relative", "squared relative",
]
# display order mapping to ops.metrics names
_ORDER = ("MAE", "RMSE", "iMAE", "iRMSE", "logMAE", "logRMSE", "SILog",
          "absRel", "sqRel")


def _mean_errors(pairs) -> List[str]:
    error_vectors = []
    for gt, pred in pairs:
        errors = compute_supervised_errors(gt, pred)
        error_vectors.append([errors[k] for k in _ORDER])
    error_vectors = np.array(error_vectors)
    return [f"mean {name} : {np.mean(error_vectors[:, i])}\n"
            for i, name in enumerate(METRIC_DISPLAY_NAMES)]


def evaluate_depth(label_path: str, result_path: str, scale: float = 256.0):
    """Compare two directories of uint16 depth PNGs (reference ``:122-159``)."""
    gt_list = sorted(os.path.join(label_path, g)
                     for g in os.listdir(label_path) if g.endswith(".png"))
    result_list = sorted(os.path.join(result_path, r)
                         for r in os.listdir(result_path) if r.endswith(".png"))
    if len(gt_list) != len(result_list):
        print(f"Notice: gt count {len(gt_list)} != result count "
              f"{len(result_list)}")
    print(f"found {len(gt_list)} images in {label_path} and {result_path}")
    pairs = ((cv2.imread(g, -1) / scale, cv2.imread(r, -1) / scale)
             for g, r in zip(gt_list, result_list))
    return _mean_errors(pairs)


def evaluate_depth_unsupervised_aligned(label_path: str, result_path: str,
                                        scale: float = 256.0):
    """npz GT vs PNG predictions (reference ``:83-120``)."""
    gt_depths = np.load(label_path, fix_imports=True, encoding="latin1",
                        allow_pickle=True)["data"]
    result_list = sorted(os.path.join(result_path, r)
                         for r in os.listdir(result_path) if r.endswith(".png"))
    if len(gt_depths) != len(result_list):
        print(f"Notice: gt count {len(gt_depths)} != result count "
              f"{len(result_list)}")
    pairs = ((gt_depths[i], cv2.imread(result_list[i], -1) / scale)
             for i in range(min(len(gt_depths), len(result_list))))
    return _mean_errors(pairs)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("label_path")
    parser.add_argument("result_path")
    parser.add_argument("--png_dirs", action="store_true",
                        help="compare two PNG dirs instead of npz-vs-PNG")
    args = parser.parse_args()
    fn = evaluate_depth if args.png_dirs else evaluate_depth_unsupervised_aligned
    for text in fn(args.label_path, args.result_path):
        print(text, end="")
