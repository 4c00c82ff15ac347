"""Norm-direct fisheye photometric warp: norm maps + Mei camera rows ->
warped frames + overlap masks, with the whole grid chain in Pallas.

The fisheye analogue of ``ops/warp_depth.py`` (round-2 VERDICT item 7): the
grid route materializes the rotated ray field [F, B, H, W, 3], the Mei
projection grid [S, F, B, H, W, 2], runs the XLA index/fraction prep, and
warps the validity mask in a second full pass. Here one Pallas prep pass
(``ops/pallas/mei_prep_kernel.py``) emits the fused band-warp kernel's
operands directly, and the overlap-mask warp REUSES those operands: the
reference's ``mode='nearest'`` mask sample (``monodepth2_decoder.py:
355-413``, zeros padding, == 1 test) equals a bilinear gather with the
fractions rounded to {0, 1} (nearest index = floor(x + 0.5) = x0 + (fx >=
0.5)) AND'd with the analytic in-bounds bit the prep kernel packs at
bit 28 — so the mask pass costs one 1-channel kernel sweep and zero grid
math.

Contract: images, masks, rays and camera/pose rows are constants under
autodiff (only the norm cotangent is produced). Callers must dispatch here
only when that holds: GT-pose recipes (``MonoDepthWPose`` /
``DistillWPoseMeta`` read poses straight from the dataset — reference
``monodepth2_model.py:126-127``) without residual flow.
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp

from .warp_fast import FUSED_VJP, TILED_VJP, _tile_nhwc
from .pallas import warp_kernel as wk
from .pallas.mei_prep_kernel import mei_prep_pallas, mei_prep_bwd_pallas

#: A/B toggle for the norm-direct fisheye path (grid route stays available)
WARP_MEI = _os.environ.get("FSNET_WARP_MEI", "1") != "0"

#: Per-(row, output lane tile) band anchors: the Mei reprojection bends
#: rows vertically (p95 row spread 10-18 image rows at KITTI-360 motion)
#: but each 128-lane tile's local spread is only 2-5 rows
#: (``scripts/fisheye_band_probe.py``), so anchoring each tile's DMA window
#: independently covers MORE samples with HALF the band — the head's
#: configured ``warp_band`` is halved on this path. **Measured negative
#: result, default OFF** (BASELINE.md round 4): 141.2 vs 152.8 imgs/s at
#: the fisheye recipe. The per-row band DMA already runs at the HBM peak
#: (654 of 657 GB/s, ``scripts/tpu_dma_rate_probe.py``); tile mode moves
#: ~1.5x the bytes through half-size transfers at ~25% less achieved
#: bandwidth, and the sweep it halves is a smaller share of the warp
#: block than the ablation attribution suggested.
#: ``FSNET_TILE_YMIN=1`` re-enables for A/B.
TILE_YMIN = _os.environ.get("FSNET_TILE_YMIN", "0") == "1"


def warp_mei_supported(image_shape, band: int) -> bool:
    """True when the norm-direct Pallas fisheye path applies (same kernel
    preconditions as ``warp_depth.warp_depth_supported``)."""
    if not WARP_MEI or jax.default_backend() not in ("tpu", "axon"):
        return False
    return (wk.DMA_GATHER and wk.PACK_IDX and FUSED_VJP
            and not wk.FOLD_WIN
            and band <= image_shape[1]
            and wk.pallas_warp_supported(image_shape))


def make_mei_rows(P: jnp.ndarray, params: jnp.ndarray, Ts: jnp.ndarray,
                  S: int) -> jnp.ndarray:
    """(P [B, 3+, 4], params [B, 3] = (xi, k1, k2), Ts [F, B, 4, 4]) ->
    mrows [N, 24] f32, N = S*F*B in (s, f, b) order: cols 0-8 row-major
    R = T[:3, :3], 9-11 t = T[:3, 3], 12-14 (xi, k1, k2), 15-18
    (gamma1, gamma2, u0, v0) — the layout ``mei_prep_kernel._scalars``
    reads. Rows are scale-independent and broadcast over S."""
    f32 = jnp.float32
    Ts = Ts.astype(f32)
    F, B = Ts.shape[:2]
    cam = jnp.stack([
        params[:, 0], params[:, 1], params[:, 2],
        P[:, 0, 0], P[:, 1, 1], P[:, 0, 2], P[:, 1, 2],
    ], axis=-1).astype(f32)                                  # [B, 7]
    rows = jnp.concatenate([
        Ts[:, :, :3, :3].reshape(F, B, 9),
        Ts[:, :, :3, 3],
        jnp.broadcast_to(cam[None], (F, B, 7)),
        jnp.zeros((F, B, 5), f32),
    ], axis=-1)                                              # [F, B, 24]
    return jnp.broadcast_to(rows[None], (S, F, B, 24)).reshape(-1, 24)


def _fwd_impl(image, mask, norm, rays_cf, mrows, S, F, band, with_mask,
              tiled_out=False):
    """-> (out [N, H, W, C] NHWC, or [N, H, T, C, L] kernel-tiled when
    ``tiled_out``; overlap bool [N, H, W] or None; va, vb)."""
    C = image.shape[3]
    # single-lane-tile widths (W <= 128): the per-tile anchor degenerates
    # to the per-row anchor, so halving the band would only lose coverage
    tile = TILE_YMIN and image.shape[2] > 128
    if tile:
        # per-tile anchors cover more than per-row anchors at twice the
        # band (see TILE_YMIN); round the halved band UP to even so bf16
        # row-pair packing stays eligible (an odd half, e.g. band 10 -> 5,
        # would silently fail _use_packed's band%2 check and drop to the
        # unpacked f32 route — a surprising perf cliff)
        half = band // 2
        band = max(half + (half & 1), 4)
    packed = wk._use_packed(image, band)
    iword, fpack, ymin, ws = mei_prep_pallas(norm, rays_cf, mrows, S, F,
                                             band, tile_ymin=tile)
    row_div = 2 if packed else 1
    ymin_img = (ymin // row_div) * C
    if packed:
        img_tiled = wk._tile_img_rows(wk.pack_rows_bf16(image))
        rows = band // 2
    else:
        img_tiled = wk._tile_img_rows(image.astype(jnp.float32))
        rows = band
    out, va, vb = wk.warp_rows_pallas_dma_fused(
        img_tiled, ymin_img, ws, iword, fpack, rows, C, group=8,
        packed=packed, tiled_vjp="all" if tiled_out else TILED_VJP,
        border=True)

    overlap = None
    if with_mask:
        # nearest == bilinear with binary fractions; mask values in {0, 1}
        # gathered with exact {0.0, 1.0} weights make the == 1.0 test exact
        fpack_r = (fpack >= 0.5).astype(jnp.float32)
        if packed:
            # {0, 1} is exact in bf16, so the mask rides the same row-pair
            # packing as the image: half the gather rows (the mask sweep is
            # VPU-issue-bound like the image sweep — round-4 fisheye
            # attribution measured it at 14.8 ms of the 109 ms step at
            # band=16 unpacked f32)
            mask_tiled = wk._tile_img_rows(
                wk.pack_rows_bf16(mask[..., None].astype(jnp.bfloat16)))
            mout, _, _ = wk.warp_rows_pallas_dma_fused(
                mask_tiled, ymin // 2, ws, iword, fpack_r, band // 2, 1,
                group=8, packed=True, tiled_vjp=False, border=True)
        else:
            mask_tiled = wk._tile_img_rows(
                mask[..., None].astype(jnp.float32))
            mout, _, _ = wk.warp_rows_pallas_dma_fused(
                mask_tiled, ymin, ws, iword, fpack_r, band, 1, group=8,
                packed=False, tiled_vjp=False, border=True)
        # iword arrives pre-tiled [N, H, T, L] (mei_prep tiled_out); the
        # in-bounds view is a free reshape fused into the AND
        Nw, Hw = iword.shape[:2]
        inb = ((iword >> 28) & 1).astype(bool).reshape(Nw, Hw, -1)
        overlap = (mout[..., 0] == 1.0) & inb
    return out.astype(image.dtype), overlap, va.astype(image.dtype), \
        vb.astype(image.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def warp_mei_fused(image, mask, norm, rays_cf, mrows, S, F, band,
                   with_mask):
    """Border-padded bilinear warp of ``image`` [F*B, H, W, C] by the Mei
    reprojection of ``norm`` [S*B, H, W] lifted through ``rays_cf``
    [B, 3, H, W] and projected by ``mrows`` [S*F*B, 24]
    (:func:`make_mei_rows`). ``mask`` [B, H, W]: source validity
    (patched x fisheye-valid); when ``with_mask`` it is nearest-warped and
    AND'd with the analytic in-bounds test (reference zeros-pad semantics).
    Returns (preds [S*F*B, H, W, C], overlap bool [S*F*B, H, W] or None).
    Under autodiff only the norm cotangent flows."""
    out, overlap, _, _ = _fwd_impl(image, mask, norm, rays_cf, mrows, S, F,
                                   band, with_mask)
    return out, overlap


def _fwd(image, mask, norm, rays_cf, mrows, S, F, band, with_mask):
    out, overlap, va, vb = _fwd_impl(image, mask, norm, rays_cf, mrows, S,
                                     F, band, with_mask)
    return (out, overlap), (image, mask, norm, rays_cf, mrows, va, vb)


def _bwd(S, F, band, with_mask, residuals, cot):
    image, mask, norm, rays_cf, mrows, va, vb = residuals
    g = cot[0]                      # overlap is boolean: zero-strength
    N, H = va.shape[0], va.shape[1]
    if va.ndim == 5:                # tiled residuals [N, H, T, C, L]
        g_t = _tile_nhwc(g, va.shape[-1])
        gfx = jnp.sum(g_t * va, axis=3).reshape(N, H, -1)
        gfy = jnp.sum(g_t * vb, axis=3).reshape(N, H, -1)
    else:
        gfx = jnp.sum(g * va, axis=-1)
        gfy = jnp.sum(g * vb, axis=-1)
    dnorm = mei_prep_bwd_pallas(norm, rays_cf, gfx, gfy, mrows, S, F)
    return (jnp.zeros_like(image), jnp.zeros_like(mask),
            dnorm.astype(norm.dtype), jnp.zeros_like(rays_cf),
            jnp.zeros_like(mrows))


warp_mei_fused.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def warp_mei_fused_tiled(image, mask, norm, rays_cf, mrows, S, F, band,
                         with_mask):
    """:func:`warp_mei_fused` with predictions left in the kernels' native
    tiled [N, H, T, C, L] layout for the fused photometric kernel
    (``ops/photo_loss.py``) — zero NHWC relayouts either direction."""
    out, overlap, _, _ = _fwd_impl(image, mask, norm, rays_cf, mrows, S, F,
                                   band, with_mask, tiled_out=True)
    return out, overlap


def _fwd_tiled(image, mask, norm, rays_cf, mrows, S, F, band, with_mask):
    out, overlap, va, vb = _fwd_impl(image, mask, norm, rays_cf, mrows, S,
                                     F, band, with_mask, tiled_out=True)
    return (out, overlap), (image, mask, norm, rays_cf, mrows, va, vb)


def _bwd_tiled(S, F, band, with_mask, residuals, cot):
    image, mask, norm, rays_cf, mrows, va, vb = residuals
    g = cot[0]                      # tiled [N, H, T, C, L]
    N, H = va.shape[0], va.shape[1]
    gfx = jnp.sum(g * va, axis=3).reshape(N, H, -1)
    gfy = jnp.sum(g * vb, axis=3).reshape(N, H, -1)
    dnorm = mei_prep_bwd_pallas(norm, rays_cf, gfx, gfy, mrows, S, F)
    return (jnp.zeros_like(image), jnp.zeros_like(mask),
            dnorm.astype(norm.dtype), jnp.zeros_like(rays_cf),
            jnp.zeros_like(mrows))


warp_mei_fused_tiled.defvjp(_fwd_tiled, _bwd_tiled)
