"""Depth-bin codecs: log-spaced bins + softmax-expectation decode.

Reference: ``monodepth/networks/models/heads/depth_encoder.py`` —
``_build_depth_bins:68-74`` (log-spaced bins), ``_gather_activation:76-88``
(clamped softmax expectation over bins), and
``monodepth_utils.py:84-99 gather_activation`` (sigmoid-space variant).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .geometry import depth_to_disp, inverse_sigmoid


def build_depth_bins(min_depth: float, max_depth: float, num_bins: int) -> np.ndarray:
    """Log-spaced depth bins, replicating ``torch.arange(log(min), log(max), step)``
    then ``exp`` (reference ``depth_encoder.py:68-74``)."""
    lo, hi = np.log(min_depth), np.log(max_depth)
    step = (hi - lo) / num_bins
    # np.arange with float step mirrors torch.arange's half-open interval
    inv_bins = lo + step * np.arange(num_bins, dtype=np.float64)
    return np.exp(inv_bins).astype(np.float32)


def gather_activation(logits: jnp.ndarray, depth_bins: jnp.ndarray) -> jnp.ndarray:
    """Clamped-softmax expectation over depth bins.

    ``logits`` [B, H, W, num_bins] (NHWC; the reference is [B, bins, H, W]) ->
    decoded depth [B, H, W, 1]. Reference ``depth_encoder.py:76-88``.
    """
    x = jnp.clip(logits, -10.0, 10.0)
    activated = jnp.exp(x - jnp.max(x, axis=-1, keepdims=True))
    activated = activated / jnp.sum(activated, axis=-1, keepdims=True)
    bins = depth_bins.reshape((1,) * (logits.ndim - 1) + (-1,))
    return jnp.sum(activated * bins, axis=-1, keepdims=True)


def gather_activation_sigmoid_space(logits: jnp.ndarray, depth_bins: jnp.ndarray,
                                    min_depth: float = 0.1,
                                    max_depth: float = 100.0) -> jnp.ndarray:
    """Softmax expectation over inverse-sigmoid-disparity bin encodings
    (reference ``monodepth_utils.py:84-99``); returns an *encoded* depth feature."""
    activated = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    activated = activated / jnp.sum(activated, axis=-1, keepdims=True)
    activation_bins = inverse_sigmoid(depth_to_disp(depth_bins, min_depth, max_depth))
    bins = activation_bins.reshape((1,) * (logits.ndim - 1) + (-1,))
    return jnp.sum(activated * bins, axis=-1, keepdims=True)
