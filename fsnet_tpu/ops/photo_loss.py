"""Fused photometric reprojection loss: one Pallas pass per direction.

Wraps ``ops/pallas/photo_kernel.py`` with the NHWC surface of
``models.heads.monodepth2_decoder.reprojection_loss`` (reference
``compute_reprojection_loss``, ``monodepth2_decoder.py:118-128``): per-pixel
``ssim_weight * mean_c(ssim_dissim) + (1-ssim_weight) * mean_c(|x - y|)``
against a target broadcast over N // B leading repeats, with precomputed
target-side pooled stats. Only the prediction cotangent flows (targets are
dataset constants in every caller — the warped sources ARE differentiable
and arrive as ``pred``).
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp

from .pallas.photo_kernel import photo_loss_pallas, photo_loss_bwd_pallas

_LANE = 128

#: Fused photometric kernel dispatch. DEFAULT OFF (round-4 adjudication):
#: the isolated A/B at the flagship shape (scripts/tpu_photo_ab.py, real
#: v5e, chained-dispatch harness) measured the kernel at ~4.3 ms fwd /
#: ~10.9 ms fwd+bwd vs XLA's banded-matmul pooling route at ~2.3 / ~3.2 ms
#: — the VPU roll-stencil pools on [R, T, C=4, L] f32 operands waste half
#: of every vreg's sublanes and lose to the MXU pooling they replace, in
#: BOTH directions, at every row-group size (32/16/8 within 1%). Full-step
#: confirmation: 237 imgs/s fused vs 275 XLA (bench.py, same day).
#: Kept behind FSNET_PHOTO_KERNEL=1 for A/B and for shapes where it may
#: win (see BASELINE.md round-4 section).
PHOTO_KERNEL = _os.environ.get("FSNET_PHOTO_KERNEL", "0") == "1"


def photo_loss_supported(pred_shape) -> bool:
    """TPU backends, lane-tileable width, poolable height."""
    if not PHOTO_KERNEL or jax.default_backend() not in ("tpu", "axon"):
        return False
    N, H, W, C = pred_shape
    return ((W % _LANE == 0 or (W <= _LANE and W % 8 == 0))
            and H % 2 == 0 and H >= 4 and W >= 8)


def _tile(x: jnp.ndarray, L: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jnp.moveaxis(x.reshape(B, H, W // L, L, C), 4, 3)


def _pad_c(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the channel dim of a tiled [N, H, T, C, L] array to a
    multiple of 4: Mosaic tiles the (C, L) minor dims and the kernels' row
    DMAs require the sublane dim aligned to its tile. Padded channels are
    exactly neutral through SSIM (x = y = 0 -> r = 1, dissim 0, clip gate
    0 in the VJP) and L1 (sign(0) = 0); the kernels normalize by the true
    channel count ``cn``."""
    C = x.shape[3]
    if C % 4 == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, -C % 4), (0, 0)))


def _untile(x: jnp.ndarray) -> jnp.ndarray:
    N, H, T, C, L = x.shape
    return jnp.moveaxis(x, 3, 4).reshape(N, H, T * L, C)


def _prep(pred, target, target_stats):
    W = pred.shape[2]
    L = W if W <= _LANE else _LANE
    xpad = jnp.pad(_pad_c(_tile(pred, L)),
                   ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)), mode="reflect")
    ypad = jnp.pad(_pad_c(_tile(target, L)),
                   ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)), mode="reflect")
    muy, sy = target_stats
    return xpad, ypad, _pad_c(_tile(muy, L)), _pad_c(_tile(sy, L))


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def reprojection_loss_fused(pred, target, muy, sy, ssim_weight=0.85):
    """``pred`` [N, H, W, C], ``target`` [B, H, W, C] (N % B == 0; pred n
    compares against target n mod B), (muy, sy) the NHWC
    :func:`fsnet_tpu.ops.ssim.ssim_target_stats` of ``target`` ->
    per-pixel loss [N, H, W] in pred's dtype."""
    xpad, ypad, muy_t, sy_t = _prep(pred, target, (muy, sy))
    out = photo_loss_pallas(xpad, ypad, muy_t, sy_t, ssim_weight,
                            cn=target.shape[-1])
    N, H = out.shape[0], out.shape[1]
    return out.reshape(N, H, -1)


def _fwd(pred, target, muy, sy, ssim_weight):
    xpad, ypad, muy_t, sy_t = _prep(pred, target, (muy, sy))
    out = photo_loss_pallas(xpad, ypad, muy_t, sy_t, ssim_weight,
                            cn=target.shape[-1])
    N, H = out.shape[0], out.shape[1]
    return out.reshape(N, H, -1), (xpad, ypad, target, muy, sy)


def _bwd(ssim_weight, residuals, g):
    xpad, ypad, target, muy, sy = residuals
    pdt = xpad.dtype
    N, Hp, T, C, L = xpad.shape
    gpad = jnp.pad(g.reshape(N, Hp - 4, T, L),
                   ((0, 0), (1, 1), (0, 0), (0, 0)))
    dx = photo_loss_bwd_pallas(xpad, ypad, gpad, ssim_weight,
                               cn=target.shape[-1])
    dx = dx[:, :, :, :target.shape[-1]]
    return (_untile(dx).astype(pdt), jnp.zeros_like(target),
            jnp.zeros_like(muy), jnp.zeros_like(sy))


reprojection_loss_fused.defvjp(_fwd, _bwd)


def _prep_t(pred_t, target, target_stats):
    L = pred_t.shape[-1]
    xpad = jnp.pad(_pad_c(pred_t), ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)),
                   mode="reflect")
    ypad = jnp.pad(_pad_c(_tile(target, L)),
                   ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)), mode="reflect")
    muy, sy = target_stats
    return xpad, ypad, _pad_c(_tile(muy, L)), _pad_c(_tile(sy, L))


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def reprojection_loss_fused_t(pred_t, target, muy, sy, ssim_weight=0.85):
    """:func:`reprojection_loss_fused` on kernel-tiled predictions
    [N, H, T, C, L] (the fused warp's native output layout) — no NHWC
    relayout in either direction; the backward emits the tiled cotangent
    the warp kernels' VJP consumes directly."""
    xpad, ypad, muy_t, sy_t = _prep_t(pred_t, target, (muy, sy))
    out = photo_loss_pallas(xpad, ypad, muy_t, sy_t, ssim_weight,
                            cn=target.shape[-1])
    N, H = out.shape[0], out.shape[1]
    return out.reshape(N, H, -1)


def _fwd_t(pred_t, target, muy, sy, ssim_weight):
    xpad, ypad, muy_t, sy_t = _prep_t(pred_t, target, (muy, sy))
    out = photo_loss_pallas(xpad, ypad, muy_t, sy_t, ssim_weight,
                            cn=target.shape[-1])
    N, H = out.shape[0], out.shape[1]
    return out.reshape(N, H, -1), (xpad, ypad, target, muy, sy)


def _bwd_t(ssim_weight, residuals, g):
    xpad, ypad, target, muy, sy = residuals
    N, Hp, T, C, L = xpad.shape
    gpad = jnp.pad(g.reshape(N, Hp - 4, T, L),
                   ((0, 0), (1, 1), (0, 0), (0, 0)))
    dx = photo_loss_bwd_pallas(xpad, ypad, gpad, ssim_weight,
                               cn=target.shape[-1])
    dx = dx[:, :, :, :target.shape[-1]]
    return (dx.astype(xpad.dtype), jnp.zeros_like(target),
            jnp.zeros_like(muy), jnp.zeros_like(sy))


reprojection_loss_fused_t.defvjp(_fwd_t, _bwd_t)
