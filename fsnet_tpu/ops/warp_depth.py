"""Depth-direct photometric warp: depth + projection rows -> warped frames.

Fuses the whole grid chain of the photometric warp into Pallas
(``ops/pallas/prep_kernel.py``): instead of materializing the
[S, F, B, H, W, 2] reprojection grid (``ops/geometry.py:reproject``) and
running ``_indices_and_weights`` + ``_make_ipack_packed`` as XLA
elementwise, the prep kernel maps per-scale depth + per-warp affine rows
straight to the fused band-warp kernel's operands (index word, raw
fractions, band starts, window anchors) — and the analytic overlap mask
rides bit 28 of the index word for free. The backward collapses
``_chain_to_grid`` + the autodiff of ``reproject`` into one Pallas pass
(gfx/gfy -> d depth, frames summed in-kernel).

Contract: images AND poses/intrinsics are constants under autodiff (only
the depth cotangent is produced — ``darows`` is returned as zeros).
Callers must dispatch here only when that holds: GT-pose recipes
(``MonoDepthWPose`` without the residual-pose branch, ``DistillWPoseMeta``
— reference ``monodepth2_model.py:126-127,150-206`` reads poses straight
from the dataset) with border-padded bilinear photometric warps. The
learned-pose / residual-flow / mask-warp paths keep the grid route.
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp

from .warp_fast import FUSED_VJP, TILED_VJP, _tile_nhwc
from .pallas import warp_kernel as wk
from .pallas.prep_kernel import warp_prep_pallas, warp_prep_bwd_pallas

#: A/B toggle for the depth-direct path (the grid route stays available)
WARP_DEPTH = _os.environ.get("FSNET_WARP_DEPTH", "1") != "0"


def warp_depth_supported(image_shape, band: int) -> bool:
    """True when the depth-direct Pallas path applies: TPU backend, fused
    DMA kernels with the packed index word (the prep kernel emits exactly
    that operand format), lane-tileable width."""
    if not WARP_DEPTH or jax.default_backend() not in ("tpu", "axon"):
        return False
    return (wk.DMA_GATHER and wk.PACK_IDX and FUSED_VJP
            and not wk.FOLD_WIN
            and band <= image_shape[1]
            and wk.pallas_warp_supported(image_shape))


def make_affine_rows(K: jnp.ndarray, inv_K: jnp.ndarray, Ts: jnp.ndarray,
                     S: int) -> jnp.ndarray:
    """(K [B, 4, 4], inv_K [B, 4, 4], Ts [F, B, 4, 4]) -> arows [N, 16] f32
    with N = S*F*B in (s, f, b) order: cols 0-8 the row-major 3x3
    A = (K @ T)[:3, :3] @ inv_K3, cols 9-11 the constant term
    b = (K @ T)[:3, 3] — exactly ``reproject``'s composed chain (the rows
    are scale-independent; they are simply broadcast over S)."""
    f32 = jnp.float32
    KT = jnp.matmul(K.astype(f32)[None], Ts.astype(f32))     # [F, B, 4, 4]
    P = KT[:, :, :3, :]                                      # [F, B, 3, 4]
    A = jnp.matmul(P[..., :3], inv_K[None, :, :3, :3].astype(f32))
    F, B = A.shape[:2]
    rows = jnp.concatenate(
        [A.reshape(F, B, 9), P[..., 3], jnp.zeros((F, B, 4), f32)], axis=-1)
    return jnp.broadcast_to(rows[None], (S, F, B, 16)).reshape(-1, 16)


def _fwd_impl(image, depth, arows, S, F, band, tiled_out=False,
              cmajor=False):
    """-> (out [N, H, W, C] NHWC, [N, C, H, W] NCHW under ``cmajor``, or
    [N, H, T, C, L] kernel-tiled when ``tiled_out``; overlap bool
    [N, H, W]; va, vb tiled)."""
    C = image.shape[3]
    packed = wk._use_packed(image, band)
    iword, fpack, ymin_rows, ws = warp_prep_pallas(
        depth, arows, S, F, band, C, packed)
    if packed:
        img_tiled = wk._tile_img_rows(wk.pack_rows_bf16(image))
        rows = band // 2
    else:
        img_tiled = wk._tile_img_rows(image.astype(jnp.float32))
        rows = band
    out, va, vb = wk.warp_rows_pallas_dma_fused(
        img_tiled, ymin_rows, ws, iword, fpack, rows, C, group=8,
        packed=packed, tiled_vjp="all" if tiled_out else TILED_VJP,
        border=True, cmajor=cmajor)
    # iword arrives pre-tiled [N, H, T, L] (prep_kernel tiled_out); the
    # overlap view is a free reshape fused into its elementwise consumers
    N, Hh = iword.shape[:2]
    overlap = ((iword >> 28) & 1).astype(bool).reshape(N, Hh, -1)
    return out.astype(image.dtype), overlap, va.astype(image.dtype), \
        vb.astype(image.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def warp_depth_fused(image, depth, arows, S, F, band):
    """Border-padded bilinear warp of ``image`` [F*B, H, W, C] by the
    reprojection of ``depth`` [S*B, H, W] through ``arows`` [S*F*B, 16]
    (:func:`make_affine_rows`). Returns (preds [S*F*B, H, W, C],
    overlap [S*F*B, H, W] bool — the analytic in-bounds mask of the
    sampling grid). Under autodiff only the depth cotangent flows (images
    and projection rows are treated as constants — see module docstring)."""
    out, overlap, _, _ = _fwd_impl(image, depth, arows, S, F, band)
    return out, overlap


def _fwd(image, depth, arows, S, F, band):
    out, overlap, va, vb = _fwd_impl(image, depth, arows, S, F, band)
    return (out, overlap), (image, depth, arows, va, vb)


def _bwd(S, F, band, residuals, cot):
    image, depth, arows, va, vb = residuals
    g, _ = cot                      # overlap is boolean: zero-strength
    N, H = va.shape[0], va.shape[1]
    if va.ndim == 5:                # tiled residuals [N, H, T, C, L]
        g_t = _tile_nhwc(g, va.shape[-1])
        gfx = jnp.sum(g_t * va, axis=3).reshape(N, H, -1)
        gfy = jnp.sum(g_t * vb, axis=3).reshape(N, H, -1)
    else:
        gfx = jnp.sum(g * va, axis=-1)
        gfy = jnp.sum(g * vb, axis=-1)
    ddepth = warp_prep_bwd_pallas(depth, gfx, gfy, arows, S, F)
    return (jnp.zeros_like(image), ddepth.astype(depth.dtype),
            jnp.zeros_like(arows))


warp_depth_fused.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def warp_depth_fused_tiled(image, depth, arows, S, F, band):
    """:func:`warp_depth_fused` with the predictions left in the kernels'
    native tiled layout [N, H, T, C, L] — the fused photometric kernel
    (``ops/photo_loss.py``) consumes exactly this layout and its backward
    emits the cotangent in it, so the whole warp -> loss -> d depth chain
    runs with ZERO NHWC relayouts."""
    out, overlap, _, _ = _fwd_impl(image, depth, arows, S, F, band,
                                   tiled_out=True)
    return out, overlap


def _fwd_tiled(image, depth, arows, S, F, band):
    out, overlap, va, vb = _fwd_impl(image, depth, arows, S, F, band,
                                     tiled_out=True)
    return (out, overlap), (image, depth, arows, va, vb)


def _bwd_tiled(S, F, band, residuals, cot):
    image, depth, arows, va, vb = residuals
    g, _ = cot                      # tiled [N, H, T, C, L]
    N, H = va.shape[0], va.shape[1]
    gfx = jnp.sum(g * va, axis=3).reshape(N, H, -1)
    gfy = jnp.sum(g * vb, axis=3).reshape(N, H, -1)
    ddepth = warp_prep_bwd_pallas(depth, gfx, gfy, arows, S, F)
    return (jnp.zeros_like(image), ddepth.astype(depth.dtype),
            jnp.zeros_like(arows))


warp_depth_fused_tiled.defvjp(_fwd_tiled, _bwd_tiled)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def warp_depth_fused_cm(image, depth, arows, S, F, band):
    """:func:`warp_depth_fused` with CHANNEL-MAJOR predictions
    [S*F*B, C, H, W] (``wk.CMAJOR_OUT``): the NCHW tensor is a free
    reshape of the kernel's [N, C, Ho, T, L] output, the photometric
    consumers run in the plane-major layouts XLA prefers anyway (r5 trace:
    ~2 ms/step of NHWC<->plane-major relayout copies around the kernels),
    and the backward contraction reshapes gfx/gfy [N, Ho, T, L] ->
    [N, Ho, W] for free."""
    out, overlap, _, _ = _fwd_impl(image, depth, arows, S, F, band,
                                   cmajor=True)
    return out, overlap


def _fwd_cm(image, depth, arows, S, F, band):
    out, overlap, va, vb = _fwd_impl(image, depth, arows, S, F, band,
                                     cmajor=True)
    return (out, overlap), (image, depth, arows, va, vb)


def _bwd_cm(S, F, band, residuals, cot):
    image, depth, arows, va, vb = residuals
    g, _ = cot                      # NCHW [N, C, H, W]
    N, Cc, H, W = g.shape
    L = va.shape[-1]
    g_t = g.reshape(N, Cc, H, W // L, L)      # free: (T, L) split of W
    gfx = jnp.sum(g_t * va, axis=1).reshape(N, H, W)
    gfy = jnp.sum(g_t * vb, axis=1).reshape(N, H, W)
    ddepth = warp_prep_bwd_pallas(depth, gfx, gfy, arows, S, F)
    return (jnp.zeros_like(image), ddepth.astype(depth.dtype),
            jnp.zeros_like(arows))


warp_depth_fused_cm.defvjp(_fwd_cm, _bwd_cm)
