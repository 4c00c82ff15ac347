"""Depth error metrics — host (numpy) and in-graph (masked jnp) variants.

Reference: ``monodepth_utils.py:251-289`` (7-metric unsupervised suite, torch and
numpy), ``monodepth/evaluation/kitti_supervised_eval.py:6-81`` (numba 9-metric
supervised suite — here a vectorized numpy reduction, no JIT compiler needed).

The in-graph variant takes an explicit validity mask and computes mask-weighted
means, because boolean indexing creates dynamic shapes that XLA cannot compile;
this replaces the reference's ``gt[mask]`` pattern (``monodepth2_decoder.py:152-153``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

UNSUP_METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def compute_errors(gt: np.ndarray, pred: np.ndarray):
    """7-metric unsupervised suite on flattened valid pixels (numpy, host-side).
    Reference ``monodepth_utils.py:271-289``."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()

    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def compute_depth_errors_masked(gt: jnp.ndarray, pred: jnp.ndarray,
                                mask: jnp.ndarray):
    """Masked jnp version of the 7-metric suite for the jitted train monitor
    (reference ``compute_depth_errors``, ``monodepth_utils.py:251-269``).

    All inputs broadcastable; ``mask`` is {0,1}. Returns a dict of scalars.
    """
    mask = mask.astype(gt.dtype)
    n = jnp.sum(mask) + 1e-7

    def masked_mean(x):
        return jnp.sum(x * mask) / n

    safe_gt = jnp.where(mask > 0, gt, 1.0)
    safe_pred = jnp.where(mask > 0, pred, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = masked_mean((thresh < 1.25).astype(gt.dtype))
    a2 = masked_mean((thresh < 1.25 ** 2).astype(gt.dtype))
    a3 = masked_mean((thresh < 1.25 ** 3).astype(gt.dtype))

    rmse = jnp.sqrt(masked_mean((safe_gt - safe_pred) ** 2))
    rmse_log = jnp.sqrt(masked_mean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2))
    abs_rel = masked_mean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = masked_mean((safe_gt - safe_pred) ** 2 / safe_gt)

    return {
        "de/abs_rel": abs_rel, "de/sq_rel": sq_rel, "de/rms": rmse,
        "de/log_rms": rmse_log, "da/a1": a1, "da/a2": a2, "da/a3": a3,
    }


SUPERVISED_METRIC_NAMES = (
    "MAE", "RMSE", "iMAE", "iRMSE", "logMAE", "logRMSE", "SILog",
    "absRel", "sqRel",
)


def compute_supervised_errors(gt: np.ndarray, pred: np.ndarray,
                              min_depth: float = 1e-3,
                              max_depth: float = 80.0):
    """Vectorized 9-metric supervised suite over one image pair.

    Replaces the reference's per-pixel numba loop
    (``kitti_supervised_eval.py:6-81``) with numpy reductions over the valid mask
    (gt > 0 within [min_depth, max_depth]).
    Units follow the convention of the KITTI depth-prediction benchmark:
    depths in m, inverse depths in 1/km, log in log-space, SILog scaled by 100.
    """
    valid = (gt > min_depth) & (gt < max_depth)
    g = gt[valid]
    p = np.clip(pred[valid], min_depth, max_depth)
    if g.size == 0:
        return {name: 0.0 for name in SUPERVISED_METRIC_NAMES}

    diff = p - g
    inv_diff = 1000.0 / p - 1000.0 / g  # 1/km
    log_diff = np.log(p) - np.log(g)

    silog = np.sqrt(np.mean(log_diff ** 2) - np.mean(log_diff) ** 2) * 100.0

    return {
        "MAE": float(np.mean(np.abs(diff))),
        "RMSE": float(np.sqrt(np.mean(diff ** 2))),
        "iMAE": float(np.mean(np.abs(inv_diff))),
        "iRMSE": float(np.sqrt(np.mean(inv_diff ** 2))),
        "logMAE": float(np.mean(np.abs(log_diff))),
        "logRMSE": float(np.sqrt(np.mean(log_diff ** 2))),
        "SILog": float(silog),
        "absRel": float(np.mean(np.abs(diff) / g)),
        "sqRel": float(np.mean(diff ** 2 / g)),
    }
