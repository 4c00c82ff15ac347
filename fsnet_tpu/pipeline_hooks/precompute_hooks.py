"""Pre-training precompute hooks: epipolar-geometry motion masks.

Reference: ``monodepth/pipeline_hooks/precomputing_hooks/base_precompute_hooks.py``
— ``MotionMaskPrecomputeHook:27-89`` (Farneback optical flow vs
fundamental-matrix epipolar distance -> per-pixel moving-object mask saved as
PNG) and ``MotionMaskARFlowPrecomputeHook:91-148`` (precomputed ARFlow variant
normalizing distance by the flow norm); run once before training
(reference ``scripts/train.py:78-80``).

The epipolar-distance math is vectorized numpy — it runs once per dataset, so
host-side numpy is the right tool (no device round trip as in the reference's
``.cuda()`` per-image usage).
"""
from __future__ import annotations

import os
from typing import Dict

import cv2
import numpy as np

from ..utils.builder import build


def skew(T: np.ndarray) -> np.ndarray:
    """Cross-product matrix (reference ``base_precompute_hooks.py:9-14``)."""
    return np.array([
        [0, -T[2], T[1]],
        [T[2], 0, -T[0]],
        [-T[1], T[0], 0],
    ])


class BasePrecomputeHook:
    """No-op base (reference ``:16-25``)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        pass


def _epipolar_distance(flow: np.ndarray, P2: np.ndarray,
                       relative_pose: np.ndarray) -> np.ndarray:
    """Per-pixel distance of the flowed point to its epipolar line
    (reference ``:59-83``), vectorized."""
    H, W = flow.shape[:2]
    grid_x, grid_y = np.meshgrid(np.arange(W), np.arange(H))
    grid = np.stack([grid_x, grid_y], axis=-1).astype(np.float64)
    flowed_grid = grid + flow

    Rm = relative_pose[0:3, 0:3]
    T = relative_pose[0:3, 3]
    K1 = P2[0:3, 0:3]
    K_inv = np.linalg.inv(K1)
    fundamental = K_inv.T @ skew(T) @ Rm @ K_inv

    ones = np.ones((H, W, 1))
    homo_grid = np.concatenate([grid, ones], axis=-1)
    homo_flowed = np.concatenate([flowed_grid, ones], axis=-1)

    correlations = (fundamental @ homo_grid.reshape(-1, 3).T).T.reshape(H, W, 3)
    denominators = np.linalg.norm(correlations[..., 0:2], axis=-1)
    distances = np.sum(homo_flowed * (correlations / denominators[..., None]),
                       axis=-1)
    return distances


class MotionMaskPrecomputeHook(BasePrecomputeHook):
    """Farneback-flow epipolar motion masks (reference ``:27-89``)."""

    def __init__(self, train_dataset_cfg: Dict, flow_estimator_cfg: Dict,
                 distance_threshold: float = 5.0, output_dir: str = ""):
        self.dataset = build(**dict(train_dataset_cfg))
        self.flow_estimator_cfg = dict(flow_estimator_cfg)
        self.distance_threshold = distance_threshold
        self.output_dir = output_dir

    def __call__(self, *args, **kwargs):
        print("Start precomputing motion masks")
        os.makedirs(self.output_dir, exist_ok=True)
        for index in range(len(self.dataset)):
            target_path = os.path.join(self.output_dir, f"{index:08d}.png")
            if os.path.isfile(target_path):
                continue
            data = self.dataset[index]
            image0 = np.asarray(data[("image", 0)])
            image1 = np.asarray(data[("image", 1)])

            gray0 = cv2.cvtColor(image0.astype(np.uint8), cv2.COLOR_BGR2GRAY)
            gray1 = cv2.cvtColor(image1.astype(np.uint8), cv2.COLOR_BGR2GRAY)
            flow = cv2.calcOpticalFlowFarneback(gray0, gray1, None,
                                                **self.flow_estimator_cfg)

            distances = _epipolar_distance(
                flow, np.asarray(data["P2"]),
                np.asarray(data[("relative_pose", 1)]))
            motion_mask = np.abs(distances) > self.distance_threshold
            cv2.imwrite(target_path, motion_mask.astype(np.uint8))


class MotionMaskARFlowPrecomputeHook(BasePrecomputeHook):
    """ARFlow variant: distance normalized by flow magnitude (reference ``:91-148``)."""

    def __init__(self, train_dataset_cfg: Dict, flow_estimator_cfg: Dict,
                 distance_threshold: float = 5.0, output_dir: str = ""):
        self.dataset = build(**dict(train_dataset_cfg))
        self.flow_estimator_cfg = dict(flow_estimator_cfg)
        self.distance_threshold = distance_threshold
        self.output_dir = output_dir

    def __call__(self, *args, **kwargs):
        print("Start precomputing ARFlow motion masks")
        os.makedirs(self.output_dir, exist_ok=True)
        for index in range(len(self.dataset)):
            target_path = os.path.join(self.output_dir, f"{index:08d}.png")
            data = self.dataset[index]
            flow = np.asarray(data["flow"], dtype=np.float64)
            flow_norm = np.linalg.norm(flow, axis=-1)

            distances = _epipolar_distance(
                flow, np.asarray(data["original_P2"]),
                np.asarray(data[("relative_pose", 1)]))
            motion_mask = (np.abs(distances) / np.maximum(flow_norm, 1e-12)
                           ) > self.distance_threshold
            cv2.imwrite(target_path, motion_mask.astype(np.uint8))
