"""Depth-bin codecs: log-spaced bins + softmax-expectation decode.

Reference: ``monodepth/networks/models/heads/depth_encoder.py`` —
``_build_depth_bins:68-74`` (log-spaced bins), ``_gather_activation:76-88``
(clamped softmax expectation over bins), and
``monodepth_utils.py:84-99 gather_activation`` (sigmoid-space variant).
"""
from __future__ import annotations

import numpy as np
import jax
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


@jax.custom_vjp
def gather_activation(logits: jnp.ndarray, depth_bins: jnp.ndarray) -> jnp.ndarray:
    """Clamped-softmax expectation over depth bins.

    ``logits`` [B, H, W, num_bins] (NHWC; the reference is [B, bins, H, W]) ->
    decoded depth [B, H, W, 1]. Reference ``depth_encoder.py:76-88``.

    Custom VJP: the analytic gradient is
    ``d y / d x_k = a_k (b_k - y)`` (softmax-expectation identity) gated by
    the clip mask — XLA's autodiff of the clip/max/softmax chain re-derives
    it through several full-size intermediates (~26 ms of decoder backward
    at bs12@192x640 on v5e)."""
    y, _ = _gather_activation_fwd_core(logits, depth_bins)
    return y


def _gather_activation_fwd_core(logits, depth_bins):
    x = jnp.clip(logits, -10.0, 10.0)
    activated = jnp.exp(x - jnp.max(x, axis=-1, keepdims=True))
    activated = activated / jnp.sum(activated, axis=-1, keepdims=True)
    # bins stay f32: the decoded depth feeds camera geometry, where bf16's
    # ~2px ULP at image-width scale would quantize the warp grids
    bins = depth_bins.reshape((1,) * (logits.ndim - 1) + (-1,))
    y = jnp.sum(activated * bins, axis=-1, keepdims=True)
    return y, (activated, bins)


def _gather_activation_fwd(logits, depth_bins):
    y, (activated, bins) = _gather_activation_fwd_core(logits, depth_bins)
    mask = (logits > -10.0) & (logits < 10.0)
    return y, (activated, bins, mask, y, jnp.zeros_like(depth_bins))


def _gather_activation_bwd(res, g):
    activated, bins, mask, y, zero_bins = res
    # Compute in the LOGITS dtype, not the depth-cotangent dtype: depth is
    # deliberately f32 (camera-geometry precision), so g arrives f32 — but
    # computing (bins - y) * g at f32 materializes full-res f32
    # [B, H, W, bins] intermediates (r5 trace: ~0.8 ms/step of f32
    # broadcasts at the flagship shape). The logits gradient is consumed at
    # the compute dtype anyway; casting the [B, H, W, 1] factors first
    # keeps every bins-wide tensor at compute width. f32/f64 runs are
    # unchanged (the casts are no-ops there — parity oracles unaffected).
    ct = activated.dtype
    gl = activated * (bins.astype(ct) - y.astype(ct)) * g.astype(ct)
    glogits = jnp.where(mask, gl, 0)
    return glogits, zero_bins


gather_activation.defvjp(_gather_activation_fwd, _gather_activation_bwd)


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
