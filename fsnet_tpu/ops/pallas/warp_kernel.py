"""Pallas band-warp kernel: per-output-row bilinear resampling on the VPU's
hardware ``dynamic_gather`` (lane-axis gather).

Pipeline (NHWC batch in, NHWC out):

1. (XLA) transpose the image to channel-major pixels, row-gather each output
   row's vertical band, and pre-tile the W axis into 128-lane tiles ->
   ``band_tiled [B, Ho, T, band*C, 128]`` plus pre-tiled index/weight packs.
2. (Pallas, grid (B, Ho/G)) per output row: for every output lane tile, one
   single-tile ``dynamic_gather`` per (corner, source tile) combined by
   tile-select masks; bilinear x/y weights applied on the VPU; the band axis
   folds with a sublane-split sum.

Mosaic constraints probed on this toolchain
(``scripts/tpu_pallas_bisect*.py``): ``tpu.dynamic_gather`` only addresses a
single 128-lane tile; kernels mixing lane-sliced gather operands at multiple
offsets crash the compiler, but leading-dim pre-tiled operands compile and run
— hence the [T, KL, 128] layouts.

Requires Wo == W and W <= 128 or W % 128 == 0 (see
:func:`pallas_warp_supported`). For W > 384 each output tile consults a
3-tile source window anchored DYNAMICALLY per (row, tile) from the data
(:func:`_make_ipack`): exact whenever the tile's samples span <= 3 aligned
source tiles — any displacement magnitude (unlike the round-1 static
[u-1, u+2) window, which clamped displacements beyond ~+-128 px), clamped
otherwise — symmetric to the vertical ``band`` restriction. A 2-tile window
was tried and rejected: forward-motion reprojection EXPANDS (span ~1.25x128
px), which straddles two aligned boundaries at ~20% of tile phases and
clamped ~2-4%% of pixels on the expanding frame.

Accuracy: this path is *more* accurate than the einsum band warp on TPU —
interpret-mode agreement with the einsum formulation is ~1e-7, while on
hardware the einsum's f32 matmuls run bf16 multiply passes at default
precision (~2e-3 difference). The gathers here are exact f32 VPU ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _unpack_pair(p):
    """f32 word -> (hi, lo): the two bf16 values packed in its halves, as
    exact f32 (bf16 is the top 16 bits of f32, so mask/shift is exact)."""
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return hi, lo


def pack_rows_bf16(image: jnp.ndarray) -> jnp.ndarray:
    """bf16 [B, H, W, C] -> f32-packed [B, H/2, W, C]: word r holds image row
    2r in its top half and row 2r+1 in its bottom half. Halves the gather
    rows in the Pallas kernels with zero extra precision loss (the image is
    already bf16)."""
    B, H, W, C = image.shape
    u = jax.lax.bitcast_convert_type(image.astype(jnp.bfloat16), jnp.uint16)
    u = u.astype(jnp.uint32).reshape(B, H // 2, 2, W, C)
    return jax.lax.bitcast_convert_type((u[:, :, 0] << 16) | u[:, :, 1],
                                        jnp.float32)


_WINDOW = 3  # source tiles consulted per output tile (see _make_ipack)

import os as _os_dynws

#: A/B toggle: dynamic data-dependent window anchor (1) vs round-1 static
#: [u-1, u+2) anchor (0). Same op count; dynamic follows large displacements.
DYN_WS = _os_dynws.environ.get("FSNET_DYN_WS", "1") != "0"

#: Fold the window-tile one-hot masks (and zeros-padding corner validity)
#: into prefetched f32 weight rows computed on the XLA side, instead of
#: re-deriving them in-kernel with [KL, L] integer compares: the per-tile
#: compare+convert field disappears and invalid-y corners are routed to an
#: out-of-range band index (sentinel) so the my* mask multiplies vanish too.
#: DEFAULT OFF: benched exact but 2.6% SLOWER on the full train step (76.1 ->
#: 78.1 ms, scripts/tpu_ab_bench.py best-of-4) — Mosaic lowers the in-kernel
#: compares essentially for free, while the 6 extra broadcast fpack-row reads
#: per tile cost real issue slots (BASELINE.md negative results).
FOLD_WIN = _os_dynws.environ.get("FSNET_FOLD_WIN", "0") != "0"

#: A/B toggle: under border padding ship a 4-row fpack (no mask rows) to the
#: fused kernels and skip the mask reads+multiplies in-kernel. Exact: the
#: general path multiplies by all-ones there. ``FSNET_BORDER_FAST=0``
#: restores the 8-row fpack.
BORDER_FAST = _os_dynws.environ.get("FSNET_BORDER_FAST", "1") != "0"

#: A/B toggle: when the warp consumer runs bf16 (mixed precision), emit the
#: kernel outputs (out, and va/vb on the fused path) as bf16 directly from
#: the store instead of f32-store + XLA cast pass: at the KITTI recipe the
#: fused pass writes 3 x 442 MB f32 that immediately get cast/transposed to
#: bf16 — storing bf16 halves those writes and the downstream transpose
#: reads (~1.3 GB/step less HBM traffic). Exact to within the cast (the
#: consumers were bf16 anyway). ``FSNET_BF16_OUT=0`` restores f32 stores.
BF16_OUT = _os_dynws.environ.get("FSNET_BF16_OUT", "1") != "0"

#: Pack the fused kernels' per-pixel index fields (x0r, x0t, d0, x1r, x1t,
#: d1 + the four zeros-padding corner-validity bits) into ONE s32 word and
#: ship only the two RAW bilinear fractions (fx, fy) as f32 rows; the
#: kernels unpack with [1, L] shift/and ops and reconstruct the corner
#: weights as (1-f)*m / f*m. Cuts the XLA-side prep from a 6-row s32 stack
#: + 4-8-row f32 stack (the profiler showed the s32 concatenate alone at
#: ~1.5 ms/step in T(1,128)-padded layouts) to one fused s32 output + 2 f32
#: rows. Fused-kernel path only; the two-pass backward and forward-only
#: kernels keep the row layout. ``FSNET_PACK_IDX=0`` restores the rows.
PACK_IDX = _os_dynws.environ.get("FSNET_PACK_IDX", "1") != "0"

#: A/B toggle (DMA kernels): gather each corner from the whole 3-tile window
#: in ONE multi-granule dynamic_gather over the contiguous scratch slice
#: ``scr[.., ws:ws+3]`` (one compare + one multiply + a 2-add fold select the
#: right tile), instead of one gather+compare+multiply+add per window tile.
#: Same gather volume, ~1/3 the VPU issue slots in the corner region. Needs
#: the scratch band padded to a whole number of 8-sublane granules (KL 12 ->
#: 16 for the packed RGB band: +33% band DMA traffic) so the window slice
#: reshapes to [kw*KLF, L] as a pure view; the pad rows carry y-indices the
#: weight field never selects, so they are numerically inert.
STACK_WIN = _os_dynws.environ.get("FSNET_STACK_WIN", "0") != "0"

#: Emit the fused kernels' outputs CHANNEL-MAJOR ([B, C, Ho, T, L] instead
#: of [B, Ho, T, C, L]): a [B, C, Ho, W] NCHW tensor is then a FREE reshape
#: of the kernel output. The r5 trace showed XLA running the photometric
#: fusions in plane-major layouts ({2,1,3,0}/{1,2,3,0} on NHWC = C-major
#: planes) and paying ~1.5-2 ms/step of relayout copies converting the
#: kernels' NHWC-tiled outputs + the backward cotangent chain; channel-major
#: emission kills the NHWC hop on both sides (the backward contraction
#: sum_c g*va reshapes gfx/gfy [N, Ho, T, L] -> [N, Ho, W] for free).
#: In-kernel cost: the [C, L] tile store becomes C-strided (Mosaic may
#: split it into C sublane stores). **Measured negative result, default
#: OFF** (BASELINE.md round 5): same-day bench A/B 292.43 vs 294.21
#: imgs/s — the trace confirms ~1.2 ms/step of relayout copies disappear,
#: but the strided stores slow the fused warp pass 8.51 -> 8.92 ms and
#: XLA grows new transposed fusions around the NCHW loss chain; net
#: slightly negative. ``FSNET_CMAJOR_OUT=1`` re-enables for A/B.
CMAJOR_OUT = _os_dynws.environ.get("FSNET_CMAJOR_OUT", "0") == "1"


def _read_idx(ipack_ref, g, u, packed_idx: bool, with_masks: bool):
    """Per-tile index rows, each [1, L]: (x0r, x0t, x1r, x1t, d0, d1, masks).

    ``packed_idx``: the six fields (+ the four corner-validity bits when
    ``with_masks``) arrive packed in ONE s32 word per pixel —
    x0r|x0t<<7|d0<<9|x1r<<14|x1t<<21|d1<<23|mx0<<28|mx1<<29|my0<<30|my1<<31
    — in a rank-4 [1, G, T, L] block that is a PURE RESHAPE of the natural
    [B, Ho, W] layout (no relayout copy), and are unpacked here with [1, L]
    shift/and ops (arithmetic shift + mask reads any field exactly
    regardless of the sign bit). Otherwise the legacy rank-5 6-row layout
    is read directly (masks ride fpack there)."""
    if not packed_idx:
        rows = tuple(ipack_ref[0, g, u, i:i + 1, :] for i in range(6))
        return rows + (None,)
    w = ipack_ref[0, g, u:u + 1, :]
    x0r = w & 127
    x0t = (w >> 7) & 3
    d0 = (w >> 9) & 31
    x1r = (w >> 14) & 127
    x1t = (w >> 21) & 3
    d1 = (w >> 23) & 31
    masks = None
    if with_masks:
        masks = tuple((w >> b) & 1 for b in (28, 29, 30, 31))
    return x0r, x0t, x1r, x1t, d0, d1, masks


def _gather_corners(idx_rows, src_of, T, KL, L):
    """Shared corner gathers: one single-tile dynamic_gather per
    (corner, window tile), combined by window-relative select masks.
    ``idx_rows`` = (x0r, x0t, x1r, x1t) [1, L] rows; ``src_of(t)`` yields
    the [KL, L] channel-major source tile at window offset ``t`` (the
    caller resolves the data-dependent window start from the prefetched
    ``ws`` array — a VMEM block read or a DMA scratch read)."""
    x0r = jnp.broadcast_to(idx_rows[0], (KL, L))
    x0t = jnp.broadcast_to(idx_rows[1], (KL, L))
    x1r = jnp.broadcast_to(idx_rows[2], (KL, L))
    x1t = jnp.broadcast_to(idx_rows[3], (KL, L))

    kw = min(_WINDOW, T)
    g0 = g1 = None
    for t in range(kw):
        src = src_of(t)
        gth0 = jnp.take_along_axis(src, x0r, axis=1) * (x0t == t).astype(
            src.dtype)
        gth1 = jnp.take_along_axis(src, x1r, axis=1) * (x1t == t).astype(
            src.dtype)
        g0 = gth0 if g0 is None else g0 + gth0
        g1 = gth1 if g1 is None else g1 + gth1
    return g0, g1


def _gather_corners_win(idx_rows, win, kw, KLF, KL, L):
    """STACK_WIN corner gathers: ``win`` is the whole kw-tile window
    [kw*KLF, L] (contiguous scratch slice); one multi-granule gather per
    corner, tile selection via a single block-id compare, window fold as a
    kw-way sublane-block sum. Returns (g0, g1) [KL, L] (pad rows dropped)."""
    R = kw * KLF
    x0r = jnp.broadcast_to(idx_rows[0], (R, L))
    x0t = jnp.broadcast_to(idx_rows[1], (R, L))
    x1r = jnp.broadcast_to(idx_rows[2], (R, L))
    x1t = jnp.broadcast_to(idx_rows[3], (R, L))
    blk = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) // KLF
    s0 = jnp.take_along_axis(win, x0r, axis=1) * (blk == x0t).astype(
        win.dtype)
    s1 = jnp.take_along_axis(win, x1r, axis=1) * (blk == x1t).astype(
        win.dtype)
    g0 = jnp.sum(s0.reshape(kw, KLF, L), axis=0)
    g1 = jnp.sum(s1.reshape(kw, KLF, L), axis=0)
    return g0[0:KL], g1[0:KL]


def _gather_corners_fold(ipack_ref, fpack_ref, src_of, g, u, T, KL, L,
                         frow0: int):
    """FOLD_WIN corner gathers: the per-(corner, window tile) one-hot masks
    arrive as prefetched f32 rows ``fpack[frow0 + 3*corner + t]`` (with
    zeros-padding x-validity folded in), so the in-kernel [KL, L] integer
    compares of :func:`_gather_corners` disappear."""
    x0r = jnp.broadcast_to(ipack_ref[0, g, u, 0:1, :], (KL, L))
    x1r = jnp.broadcast_to(ipack_ref[0, g, u, 2:3, :], (KL, L))
    kw = min(_WINDOW, T)
    g0 = g1 = None
    for t in range(kw):
        src = src_of(t)
        gth0 = (jnp.take_along_axis(src, x0r, axis=1)
                * fpack_ref[0, g, u, frow0 + t:frow0 + t + 1, :])
        gth1 = (jnp.take_along_axis(src, x1r, axis=1)
                * fpack_ref[0, g, u, frow0 + 3 + t:frow0 + 4 + t, :])
        g0 = gth0 if g0 is None else g0 + gth0
        g1 = gth1 if g1 is None else g1 + gth1
    return g0, g1


def _make_ipack(iw: dict, W: int, L: int):
    """Pack gather indices as (lane0, rel0, lane1, rel1, d0, d1) [B, Ho, 6, W]
    plus the per-(row, output tile) dynamic window start ``ws`` [B, Ho, T].

    ``rel`` is the source tile relative to the output tile's dynamically
    anchored 3-tile window [ws, ws+3) — ``ws`` is chosen per (row, tile)
    from the data so the window covers [min x0, max x1] whenever the tile's
    samples span <= 3 aligned source tiles (driving-scene reprojections span
    <= 2: expansion ~1.25 x 128 px + depth-edge spread). Unlike the round-1
    static [u-1, u+2) anchor this follows arbitrarily large displacements
    (e.g. strong yaw). Columns are clamped into the window, the same
    degradation mode as the vertical ``band``."""
    T = W // L
    x0, x1 = iw["x0c"], iw["x1c"]
    B, Ho, Wo = x0.shape
    kw = min(_WINDOW, T)
    assert Wo == W, (Wo, W)  # pallas path requires Wo == W (_use_pallas)
    if DYN_WS:
        # anchor the window at the highest tile any corner touches; when the
        # span fits (hi - lo <= kw-1) this covers exactly, else low clamps
        hi = jnp.max(x1.reshape(B, Ho, T, L), axis=3) // L   # [B, Ho, T]
        ws = jnp.clip(hi - (kw - 1), 0, T - kw).astype(jnp.int32)
    else:
        # round-1 static anchor [u-1, u+2): exact only within ~+-L px
        ws = jnp.broadcast_to(
            jnp.clip(jnp.arange(T, dtype=jnp.int32) - 1, 0, T - kw),
            (B, Ho, T))
    wsx = jnp.broadcast_to(ws[..., None], (B, Ho, T, L)).reshape(B, Ho, W)
    lo = wsx * L
    hi_clip = (wsx + kw) * L - 1
    x0w = jnp.clip(x0, lo, hi_clip)
    x1w = jnp.clip(x1, lo, hi_clip)
    ipack = jnp.stack([x0w % L, x0w // L - wsx, x1w % L, x1w // L - wsx,
                       iw["d0"], iw["d1"]], axis=2)
    return ipack, ws


def _make_ipack_packed(iw: dict, W: int, L: int, with_masks: bool):
    """:func:`_make_ipack` with the six index fields (and, when
    ``with_masks``, the four zeros-padding corner-validity bits) packed into
    ONE s32 word per pixel -> [B, Ho, W] + ``ws``. Field layout matches
    :func:`_read_idx`; the stack/concatenate of six T(1,128)-padded s32 rows
    (~1.5 ms/step on the profiler) collapses to one fused bit-or output in
    the natural [B, Ho, W] layout, which the wrappers reshape (purely) to
    the kernels' [B, Ho, T, L] block shape."""
    T = W // L
    x0, x1 = iw["x0c"], iw["x1c"]
    B, Ho, Wo = x0.shape
    kw = min(_WINDOW, T)
    assert Wo == W, (Wo, W)
    if DYN_WS:
        hi = jnp.max(x1.reshape(B, Ho, T, L), axis=3) // L   # [B, Ho, T]
        ws = jnp.clip(hi - (kw - 1), 0, T - kw).astype(jnp.int32)
    else:
        ws = jnp.broadcast_to(
            jnp.clip(jnp.arange(T, dtype=jnp.int32) - 1, 0, T - kw),
            (B, Ho, T))
    wsx = jnp.broadcast_to(ws[..., None], (B, Ho, T, L)).reshape(B, Ho, W)
    lo = wsx * L
    hi_clip = (wsx + kw) * L - 1
    x0w = jnp.clip(x0, lo, hi_clip)
    x1w = jnp.clip(x1, lo, hi_clip)
    word = (
        (x0w % L)
        | ((x0w // L - wsx) << 7)
        | (iw["d0"].astype(jnp.int32) << 9)
        | ((x1w % L) << 14)
        | ((x1w // L - wsx) << 21)
        | (iw["d1"].astype(jnp.int32) << 23)
    )
    if with_masks:
        for bit, key in ((28, "vx0"), (29, "vx1"), (30, "vy0"), (31, "vy1")):
            word = word | (iw[key].astype(jnp.int32) << bit)
    return word, ws


def _fwd_tile(ipack_ref, fpack_ref, src_of, g, u, *, T, band, C, L, packed,
              fold=False, win=None, KLF=None):
    """One output lane tile of the forward warp -> [C, L]."""
    KL = band * C
    x0r, x0t, x1r, x1t, d0, d1, _ = _read_idx(ipack_ref, g, u, False, False)
    if win is not None:
        g0, g1 = _gather_corners_win((x0r, x0t, x1r, x1t), win,
                                     min(_WINDOW, T), KLF, KL, L)
    elif fold:
        g0, g1 = _gather_corners_fold(ipack_ref, fpack_ref, src_of, g, u, T,
                                      KL, L, frow0=4)
    else:
        g0, g1 = _gather_corners((x0r, x0t, x1r, x1t), src_of, T, KL, L)

    fx0 = fpack_ref[0, g, u, 0:1, :]
    fx1 = fpack_ref[0, g, u, 1:2, :]
    fy0 = fpack_ref[0, g, u, 2:3, :]
    fy1 = fpack_ref[0, g, u, 3:4, :]
    dp = jax.lax.broadcasted_iota(jnp.int32, (KL, L), 0) // C
    if packed:
        g0h, g0l = _unpack_pair(g0)
        g1h, g1l = _unpack_pair(g1)
        dh = dp * 2
        wv_h = (dh == d0) * fy0 + (dh == d1) * fy1
        wv_l = (dh + 1 == d0) * fy0 + (dh + 1 == d1) * fy1
        weighted = ((g0h * fx0 + g1h * fx1) * wv_h
                    + (g0l * fx0 + g1l * fx1) * wv_l)
    else:
        wv = (dp == d0) * fy0 + (dp == d1) * fy1
        weighted = (g0 * fx0 + g1 * fx1) * wv
    return jnp.sum(weighted.reshape(band, C, L), axis=0)


def _fused_tile(ipack_ref, fpack_ref, src_of, g, u, *, T, band, C, L,
                packed, fold=False, border=False, win=None, KLF=None,
                packed_idx=False):
    """Forward AND both difference passes for one output lane tile ->
    (out, va, vb) each [C, L], sharing one set of corner gathers.

    ``fpack`` rows: (wx0, wx1, wy0, wy1, mx0, mx1, my0, my1) where m* are
    the zeros-padding corner validity masks (all-ones under border padding).
    ``va = d out/d fx`` reuses the forward's vertical weights with the
    difference x-weights (g1*mx1 - g0*mx0); ``vb = d out/d fy`` reuses the
    forward's horizontal interp with difference y-weights. Emitting these
    from the forward removes the whole backward gather pass (DMAs included)
    at ~45% extra VPU work here; the backward becomes an XLA contraction
    ``gfx = sum_c gcot*va``.

    Under ``packed_idx`` (:data:`PACK_IDX`) fpack is just the two RAW
    bilinear fractions (fx, fy); the corner weights are reconstructed as
    wx0 = (1-fx)*mx0, wx1 = fx*mx1 (identical to the XLA-side pre-folded
    weights) with the masks unpacked from the index word — or skipped under
    ``border`` where every mask is one.

    Under ``fold`` (:data:`FOLD_WIN`) the fpack rows are instead
    (wx0, wx1, wy0, wy1, q00, q01, q02, q10, q11, q12): the window one-hots
    carry the x-validity masks (so ``b = g1 - g0`` directly) and invalid-y
    corners arrive with an out-of-range ``d`` sentinel (so ``wq`` needs no
    my* multiplies).

    Under ``border`` the fpack rows are just (wx0, wx1, wy0, wy1): border
    padding clamps indices instead of masking, so every m* is one — the
    mask rows and their multiplies drop out (``b = g1 - g0``,
    ``wq = is1 - is0``), exactly the general path evaluated at m*=1."""
    KL = band * C
    x0r, x0t, x1r, x1t, d0, d1, bitmasks = _read_idx(
        ipack_ref, g, u, packed_idx, packed_idx and not border)
    if win is not None and not fold:
        # (fold carries x-validity in its fpack one-hots, which the stacked
        # gather's pure ipack compares would drop — mutually exclusive)
        g0, g1 = _gather_corners_win((x0r, x0t, x1r, x1t), win,
                                     min(_WINDOW, T), KLF, KL, L)
    elif fold:
        g0, g1 = _gather_corners_fold(ipack_ref, fpack_ref, src_of, g, u, T,
                                      KL, L, frow0=4)
    else:
        g0, g1 = _gather_corners((x0r, x0t, x1r, x1t), src_of, T, KL, L)

    if packed_idx:
        fdt = fpack_ref.dtype
        fx = fpack_ref[0, 0, g, u:u + 1, :]
        fy = fpack_ref[0, 1, g, u:u + 1, :]
        wx0, wx1 = 1.0 - fx, fx
        wy0, wy1 = 1.0 - fy, fy
        if not border:
            mx0 = bitmasks[0].astype(fdt)
            mx1 = bitmasks[1].astype(fdt)
            my0 = bitmasks[2].astype(fdt)
            my1 = bitmasks[3].astype(fdt)
            wx0, wx1 = wx0 * mx0, wx1 * mx1
            wy0, wy1 = wy0 * my0, wy1 * my1
    else:
        wx0 = fpack_ref[0, g, u, 0:1, :]
        wx1 = fpack_ref[0, g, u, 1:2, :]
        wy0 = fpack_ref[0, g, u, 2:3, :]
        wy1 = fpack_ref[0, g, u, 3:4, :]
    unmasked = fold or border
    if not unmasked and not packed_idx:
        mx0 = fpack_ref[0, g, u, 4:5, :]
        mx1 = fpack_ref[0, g, u, 5:6, :]
        my0 = fpack_ref[0, g, u, 6:7, :]
        my1 = fpack_ref[0, g, u, 7:8, :]
    dp = jax.lax.broadcasted_iota(jnp.int32, (KL, L), 0) // C
    if packed:
        g0h, g0l = _unpack_pair(g0)
        g1h, g1l = _unpack_pair(g1)
        dh = dp * 2
        ish0, ish1 = dh == d0, dh == d1
        isl0, isl1 = dh + 1 == d0, dh + 1 == d1
        wv_h = ish0 * wy0 + ish1 * wy1
        wv_l = isl0 * wy0 + isl1 * wy1
        if unmasked:
            wq_h = ish1.astype(wy0.dtype) - ish0.astype(wy0.dtype)
            wq_l = isl1.astype(wy0.dtype) - isl0.astype(wy0.dtype)
            b_h = g1h - g0h
            b_l = g1l - g0l
        else:
            wq_h = ish1 * my1 - ish0 * my0
            wq_l = isl1 * my1 - isl0 * my0
            b_h = g1h * mx1 - g0h * mx0
            b_l = g1l * mx1 - g0l * mx0
        a_h = g0h * wx0 + g1h * wx1
        a_l = g0l * wx0 + g1l * wx1
        out = a_h * wv_h + a_l * wv_l
        va = b_h * wv_h + b_l * wv_l
        vb = a_h * wq_h + a_l * wq_l
    else:
        is0, is1 = dp == d0, dp == d1
        wv = is0 * wy0 + is1 * wy1
        if unmasked:
            wq = is1.astype(wy0.dtype) - is0.astype(wy0.dtype)
            va = (g1 - g0) * wv
        else:
            wq = is1 * my1 - is0 * my0
            va = (g1 * mx1 - g0 * mx0) * wv
        a = g0 * wx0 + g1 * wx1
        out = a * wv
        vb = a * wq

    def fold_band(x):
        return jnp.sum(x.reshape(band, C, L), axis=0)

    return fold_band(out), fold_band(va), fold_band(vb)


def _kernel_fused(ws_ref, ipack_ref, fpack_ref, band_ref, out_ref, va_ref,
                  vb_ref, *, G, T, band, C, L, packed, Ho, fold=False,
                  border=False, packed_idx=False):
    """Fused fwd+vjp kernel; three whole-block outputs (out, va, vb) —
    partial sublane-slice stores at non-vreg-aligned offsets wedge the
    Mosaic compile, so each result gets its own ref."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    for g in range(G):
        for u in range(T):
            ws = ws_ref[(n * Ho + h * G + g) * T + u]
            o, va, vb = _fused_tile(
                ipack_ref, fpack_ref, lambda t: band_ref[0, g, ws + t], g, u,
                T=T, band=band, C=C, L=L, packed=packed, fold=fold,
                border=border, packed_idx=packed_idx)
            out_ref[0, g, u] = o.astype(out_ref.dtype)
            va_ref[0, g, u] = va.astype(va_ref.dtype)
            vb_ref[0, g, u] = vb.astype(vb_ref.dtype)


def _kernel_dma_fused(ymin_ref, ws_ref, ipack_ref, fpack_ref, img_ref,
                      out_ref, va_ref, vb_ref, scr, sems, *, G, T, band, C,
                      L, packed, NI, Ho, fold=False, border=False,
                      stack=False, packed_idx=False, tile_ymin=False,
                      cmajor=False):
    """Fused fwd+vjp kernel with the band row-gather as double-buffered DMA
    (see :func:`_kernel_dma`). Under ``tile_ymin`` the scratch is
    [2, G, T, kw, KL, L] and each output tile's kw-tile window is DMA'd at
    its own vertical anchor (``_band_dma_tile``); the window-relative
    x0t/x1t fields index the per-tile scratch directly."""
    KLF = scr.shape[-2]
    kw = min(_WINDOW, T)
    if tile_ymin:
        def start_row(slot_, n_, h_, g_):
            for u_ in range(T):
                _band_dma_tile(ymin_ref, img_ref, scr, sems, slot_,
                               n_, h_, g_, u_, G=G, NI=NI, T=T,
                               kw=kw).start()
        slot, n, h = _dma_prologue(ymin_ref, img_ref, scr, sems, G=G, NI=NI,
                                   start_row=start_row)
        for g in range(G):
            for u in range(T):
                _band_dma_tile(ymin_ref, img_ref, scr, sems, slot,
                               n, h, g, u, G=G, NI=NI, T=T,
                               kw=kw).wait()
                win = (scr[slot, g, u].reshape(kw * KLF, L)
                       if stack else None)
                o, va, vb = _fused_tile(
                    ipack_ref, fpack_ref,
                    lambda t, u=u: scr[slot, g, u, t], g, u,
                    T=T, band=band, C=C, L=L, packed=packed, fold=fold,
                    border=border, win=win, KLF=KLF, packed_idx=packed_idx)
                if cmajor:
                    out_ref[0, :, g, u] = o.astype(out_ref.dtype)
                    va_ref[0, :, g, u] = va.astype(va_ref.dtype)
                    vb_ref[0, :, g, u] = vb.astype(vb_ref.dtype)
                else:
                    out_ref[0, g, u] = o.astype(out_ref.dtype)
                    va_ref[0, g, u] = va.astype(va_ref.dtype)
                    vb_ref[0, g, u] = vb.astype(vb_ref.dtype)
        return
    slot, n, h = _dma_prologue(ymin_ref, img_ref, scr, sems, G=G, NI=NI)
    for g in range(G):
        _band_dma(ymin_ref, img_ref, scr, sems, slot, n, h, g, G, NI).wait()
        for u in range(T):
            ws = ws_ref[(n * Ho + h * G + g) * T + u]
            win = (scr[slot, g, pl.ds(ws, kw)].reshape(kw * KLF, L)
                   if stack else None)
            o, va, vb = _fused_tile(
                ipack_ref, fpack_ref, lambda t: scr[slot, g, ws + t], g, u,
                T=T, band=band, C=C, L=L, packed=packed, fold=fold,
                border=border, win=win, KLF=KLF, packed_idx=packed_idx)
            if cmajor:
                out_ref[0, :, g, u] = o.astype(out_ref.dtype)
                va_ref[0, :, g, u] = va.astype(va_ref.dtype)
                vb_ref[0, :, g, u] = vb.astype(vb_ref.dtype)
            else:
                out_ref[0, g, u] = o.astype(out_ref.dtype)
                va_ref[0, g, u] = va.astype(va_ref.dtype)
                vb_ref[0, g, u] = vb.astype(vb_ref.dtype)


def _kernel_dma_fused_tile(yw_ref, ipack_ref, fpack_ref, img_ref, out_ref,
                           va_ref, vb_ref, scr, sems, **kwargs):
    """Tile-ymin signature of :func:`_kernel_dma_fused`: ONE packed
    scalar-prefetch operand (``ymin | (ws << 16)``, see
    :func:`_band_dma_tile`) instead of (ymin, ws)."""
    _kernel_dma_fused(yw_ref, None, ipack_ref, fpack_ref, img_ref, out_ref,
                      va_ref, vb_ref, scr, sems, tile_ymin=True, **kwargs)


def _kernel(ws_ref, ipack_ref, fpack_ref, band_ref, out_ref, *, G, T, band,
            C, L, packed, Ho, fold=False):
    """Blocks: ws (scalar prefetch) [B*Ho*T] int32 window starts (flat:
    SMEM pads the trailing dim to 128, so 1D keeps it small),
    ipack [1, G, T, 6, L] int32 (x0r, x0t, x1r, x1t, d0, d1),
    fpack [1, G, T, 4, L] (wx0, wx1, wy0, wy1),
    band [1, G, T, KL, L], out [1, G, T, C, L]. ``band`` counts the rows
    actually stored per channel (already halved when ``packed``); d0/d1 are
    in full-band units either way."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    for g in range(G):
        for u in range(T):
            ws = ws_ref[(n * Ho + h * G + g) * T + u]
            out_ref[0, g, u] = _fwd_tile(
                ipack_ref, fpack_ref, lambda t: band_ref[0, g, ws + t], g, u,
                T=T, band=band, C=C, L=L, packed=packed,
                fold=fold).astype(out_ref.dtype)


def _kernel_bwd(ws_ref, ipack_ref, fpack_ref, band_ref, gcot_ref, out_ref, *,
                G, T, band, C, L, packed, Ho):
    """Fused grid-cotangent kernel: both difference passes (d out/d fx and
    d out/d fy) share the corner gathers, and the channel reduction against
    the output cotangent folds in, so the whole backward costs ~one forward.

    Blocks: ws (scalar prefetch) [B*Ho*T] int32 window starts (flat),
    ipack [1, G, T, 6, L] int32 (x0r, x0t, x1r, x1t, d0, d1),
    fpack [1, G, T, 8, L] (wxa0, wxa1, wya0, wya1, wxb0, wxb1, wyb0, wyb1)
    where pass a computes d/d fx (difference x-weights) and pass b d/d fy,
    gcot [1, G, T, C, L] channel-major output cotangent,
    out [1, G, T, 2, L] = (gfx, gfy) rows. ``band``/``packed`` as in
    :func:`_kernel`."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    for g in range(G):
        for u in range(T):
            ws = ws_ref[(n * Ho + h * G + g) * T + u]
            va, vb = _bwd_tile(ipack_ref, fpack_ref,
                               lambda t: band_ref[0, g, ws + t], g, u,
                               T=T, band=band, C=C, L=L, packed=packed)
            gc = gcot_ref[0, g, u]                      # [C, L]
            out_ref[0, g, u, 0:1, :] = jnp.sum(va * gc, axis=0, keepdims=True)
            out_ref[0, g, u, 1:2, :] = jnp.sum(vb * gc, axis=0, keepdims=True)


def _bwd_tile(ipack_ref, fpack_ref, src_of, g, u, *, T, band, C, L, packed):
    """Both difference passes for one output lane tile -> (va, vb) [C, L]."""
    KL = band * C
    x0r, x0t, x1r, x1t, d0, d1, _ = _read_idx(ipack_ref, g, u, False, False)
    g0, g1 = _gather_corners((x0r, x0t, x1r, x1t), src_of, T, KL, L)

    fxa0 = fpack_ref[0, g, u, 0:1, :]
    fxa1 = fpack_ref[0, g, u, 1:2, :]
    fya0 = fpack_ref[0, g, u, 2:3, :]
    fya1 = fpack_ref[0, g, u, 3:4, :]
    fxb0 = fpack_ref[0, g, u, 4:5, :]
    fxb1 = fpack_ref[0, g, u, 5:6, :]
    fyb0 = fpack_ref[0, g, u, 6:7, :]
    fyb1 = fpack_ref[0, g, u, 7:8, :]
    dp = jax.lax.broadcasted_iota(jnp.int32, (KL, L), 0) // C
    if packed:
        g0h, g0l = _unpack_pair(g0)
        g1h, g1l = _unpack_pair(g1)
        dh = dp * 2
        ish0, ish1 = dh == d0, dh == d1
        isl0, isl1 = dh + 1 == d0, dh + 1 == d1
        wa = ((g0h * fxa0 + g1h * fxa1) * (ish0 * fya0 + ish1 * fya1)
              + (g0l * fxa0 + g1l * fxa1) * (isl0 * fya0 + isl1 * fya1))
        wb = ((g0h * fxb0 + g1h * fxb1) * (ish0 * fyb0 + ish1 * fyb1)
              + (g0l * fxb0 + g1l * fxb1) * (isl0 * fyb0 + isl1 * fyb1))
    else:
        is0, is1 = dp == d0, dp == d1
        wa = (g0 * fxa0 + g1 * fxa1) * (is0 * fya0 + is1 * fya1)
        wb = (g0 * fxb0 + g1 * fxb1) * (is0 * fyb0 + is1 * fyb1)

    return wa.reshape(band, C, L).sum(0), wb.reshape(band, C, L).sum(0)


def _band_dma(ymin_ref, img_ref, scr, sems, slot, n, h, g, G, NI):
    """The band-row DMA for output row ``g`` of block (n, h): copies the
    [T, KL, L] channel-major row band starting at scalar-prefetched sublane
    row ``ymin_rows[n, h*G+g]`` from the HBM-resident tiled image
    [NI, T, H'*C, L] into scratch slot ``(slot, g)``. The grid batch may be
    a multiple of the image batch (scale-batched warps share sources):
    image row = n mod NI."""
    KL = scr.shape[3]
    y = ymin_ref[n, h * G + g]
    return pltpu.make_async_copy(
        img_ref.at[jax.lax.rem(n, NI), :, pl.ds(y, KL), :],
        scr.at[slot, g],
        sems.at[slot, g],
    )


def _band_dma_tile(yw_ref, img_ref, scr, sems, slot, n, h, g, u,
                   *, G, NI, T, kw):
    """Per-(row, OUTPUT tile) band DMA (tile-ymin mode): copies the
    [kw, KL, L] window of source tiles [ws_u, ws_u + kw) anchored at the
    per-tile sublane row ``ymin[n, row, u]`` into scratch slot
    ``(slot, g, u)``. Each output lane tile gets its own vertical anchor,
    so strongly row-bending reprojections (Mei fisheye) run half the band
    of the per-row anchor at better coverage
    (``scripts/fisheye_band_probe.py``).

    ``yw_ref`` [B, Ho*T] is the PACKED scalar-prefetch word
    ``ymin | (ws << 16)`` — two separate [B, Ho, T] s32 prefetch operands
    (576 KB each at the fisheye recipe) overflow the core's SMEM budget
    (observed as a scoped-SMEM alloc failure); the tile-mode compute never
    needs ``ws`` (scratch windows are window-relative), so one packed
    operand replaces both."""
    KL = scr.shape[4]
    yw = yw_ref[n, (h * G + g) * T + u]
    return pltpu.make_async_copy(
        img_ref.at[jax.lax.rem(n, NI), pl.ds(yw >> 16, kw),
                   pl.ds(yw & 0xFFFF, KL), :],
        scr.at[slot, g, u],
        sems.at[slot, g, u],
    )


def _dma_prologue(ymin_ref, img_ref, scr, sems, *, G, NI, start_row=None):
    """Double-buffered band fetch shared by the fwd/bwd DMA kernels: warm up
    block 0, start block blk+1 into the other slot, return this block's slot
    (whose per-row DMAs the caller waits just before using each row).
    ``start_row(slot_, n_, h_, g)`` overrides the per-row DMA start (the
    tile-ymin kernels start T windowed copies per row)."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    blk = n * nh + h
    nblk = pl.num_programs(0) * nh
    slot = jax.lax.rem(blk, 2)

    def start_block(slot_, n_, h_):
        for g in range(G):
            if start_row is not None:
                start_row(slot_, n_, h_, g)
            else:
                _band_dma(ymin_ref, img_ref, scr, sems, slot_, n_, h_, g,
                          G, NI).start()

    @pl.when(blk == 0)
    def _():
        start_block(slot, n, h)

    @pl.when(blk + 1 < nblk)
    def _():
        nxt = blk + 1
        start_block(1 - slot, nxt // nh, jax.lax.rem(nxt, nh))

    return slot, n, h


def _kernel_dma(ymin_ref, ws_ref, ipack_ref, fpack_ref, img_ref, out_ref,
                scr, sems, *, G, T, band, C, L, packed, NI, Ho, fold=False,
                stack=False):
    """Forward kernel with the band row-gather fused in as double-buffered
    DMA from the HBM image (no [B, Ho, band*C, W] materialization in HBM).
    Blocks as :func:`_kernel` except the band comes from ``scr``."""
    KLF = scr.shape[3]
    kw = min(_WINDOW, T)
    slot, n, h = _dma_prologue(ymin_ref, img_ref, scr, sems, G=G, NI=NI)
    for g in range(G):
        _band_dma(ymin_ref, img_ref, scr, sems, slot, n, h, g, G, NI).wait()
        for u in range(T):
            ws = ws_ref[(n * Ho + h * G + g) * T + u]
            win = (scr[slot, g, pl.ds(ws, kw)].reshape(kw * KLF, L)
                   if stack else None)
            out_ref[0, g, u] = _fwd_tile(
                ipack_ref, fpack_ref, lambda t: scr[slot, g, ws + t], g, u,
                T=T, band=band, C=C, L=L, packed=packed, fold=fold,
                win=win, KLF=KLF).astype(out_ref.dtype)


def _kernel_dma_bwd(ymin_ref, ws_ref, ipack_ref, fpack_ref, gcot_ref,
                    img_ref, out_ref, scr, sems, *, G, T, band, C, L,
                    packed, NI, Ho):
    """Backward kernel with the fused band DMA (see :func:`_kernel_bwd`)."""
    slot, n, h = _dma_prologue(ymin_ref, img_ref, scr, sems, G=G, NI=NI)
    for g in range(G):
        _band_dma(ymin_ref, img_ref, scr, sems, slot, n, h, g, G, NI).wait()
        for u in range(T):
            ws = ws_ref[(n * Ho + h * G + g) * T + u]
            va, vb = _bwd_tile(ipack_ref, fpack_ref,
                               lambda t: scr[slot, g, ws + t], g, u,
                               T=T, band=band, C=C, L=L, packed=packed)
            gc = gcot_ref[0, g, u]                      # [C, L]
            out_ref[0, g, u, 0:1, :] = jnp.sum(va * gc, axis=0, keepdims=True)
            out_ref[0, g, u, 1:2, :] = jnp.sum(vb * gc, axis=0, keepdims=True)


def _tile_img_rows(image: jnp.ndarray) -> jnp.ndarray:
    """[B, H', W, C] -> [B, T, H'*C, L]: per lane tile, channel-major sublane
    rows ordered (h, c) so a band of rows [y*C, y*C + band*C) is exactly the
    [KL, L] gather operand the kernels consume."""
    B, Hs, W, C = image.shape
    L = W if W <= _LANE else _LANE
    T = W // L
    x = image.reshape(B, Hs, T, L, C)
    x = jnp.transpose(x, (0, 2, 1, 4, 3))     # [B, T, H', C, L]
    return x.reshape(B, T, Hs * C, L)


def warp_rows_pallas_dma(img_tiled: jnp.ndarray, ymin_rows: jnp.ndarray,
                         ws: jnp.ndarray, ipack: jnp.ndarray,
                         fpack: jnp.ndarray, band: int,
                         C: int, group: int = 8,
                         packed: bool = False,
                         tiled_out: bool = False) -> jnp.ndarray:
    """Forward band warp with the row gather fused into the kernel.

    ``img_tiled`` [B, T, H'*C, L] (:func:`_tile_img_rows`), ``ymin_rows``
    [B, Ho] int32 band-start in *sublane-row* units (stored row * C), ``ws``
    [B, Ho, T] int32 window starts, ipack/fpack as :func:`warp_rows_pallas`.
    Saves the [B, Ho, band*C, W] HBM materialize + re-read of the XLA-side
    gather (~280 MB of traffic per pass at the KITTI recipe)."""
    NI, T, HC, L = img_tiled.shape
    B, Ho = ymin_rows.shape
    assert B % NI == 0, (B, NI)
    KL = band * C
    img_tiled, KLF, stack = _stack_pad(img_tiled, KL)
    G = _dma_group(group, Ho, T, KLF, L, img_tiled.dtype.itemsize)

    ipack_tiled = _tile_w(ipack.astype(jnp.int32), T, L)
    fpack_tiled = _tile_w(fpack.astype(img_tiled.dtype), T, L)
    F = fpack_tiled.shape[3]

    kernel = functools.partial(_kernel_dma, G=G, T=T, band=band, C=C, L=L,
                               packed=packed, NI=NI, Ho=Ho, fold=F > 4,
                               stack=stack)
    odt = jnp.bfloat16 if (packed and BF16_OUT) else img_tiled.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, T, 6, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, F, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, T, C, L),
                               lambda n, h, *_: (n, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, T, KLF, L), img_tiled.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, T, C, L), odt),
        grid_spec=grid_spec,
        # The 2-slot double-buffering in _dma_prologue is only safe under a
        # sequentially-executed grid: block N+2 reuses block N's scratch slot.
        # Pin 'arbitrary' semantics so a future 'parallel'/megacore change
        # can't silently race the prefetch DMAs against compute.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(ymin_rows.astype(jnp.int32), ws.astype(jnp.int32).reshape(-1),
      ipack_tiled, fpack_tiled, img_tiled)
    if tiled_out:
        return out
    return jnp.moveaxis(out, 3, 4).reshape(B, Ho, T * L, C)


def warp_rows_pallas_dma_bwd(img_tiled: jnp.ndarray, ymin_rows: jnp.ndarray,
                             ws: jnp.ndarray, ipack: jnp.ndarray,
                             fpack8: jnp.ndarray,
                             gcot_cw: jnp.ndarray, band: int, C: int,
                             group: int = 8, packed: bool = False):
    """Fused-DMA variant of :func:`warp_rows_pallas_bwd`."""
    NI, T, HC, L = img_tiled.shape
    B, Ho = ymin_rows.shape
    assert B % NI == 0, (B, NI)
    KL = band * C
    G = _dma_group(group, Ho, T, KL, L, img_tiled.dtype.itemsize)

    ipack_tiled = _tile_w(ipack.astype(jnp.int32), T, L)
    fpack_tiled = _tile_w(fpack8.astype(img_tiled.dtype), T, L)
    gcot_tiled = _tile_w(gcot_cw.astype(img_tiled.dtype), T, L)

    kernel = functools.partial(_kernel_dma_bwd, G=G, T=T, band=band, C=C,
                               L=L, packed=packed, NI=NI, Ho=Ho)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, T, 6, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, 8, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, C, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, T, 2, L),
                               lambda n, h, *_: (n, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, T, KL, L), img_tiled.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, T, 2, L), img_tiled.dtype),
        grid_spec=grid_spec,
        # Sequential grid required by the double-buffered scratch (see fwd).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(ymin_rows.astype(jnp.int32), ws.astype(jnp.int32).reshape(-1),
      ipack_tiled, fpack_tiled, gcot_tiled, img_tiled)
    out = jnp.moveaxis(out, 2, 3).reshape(B, Ho, 2, T * L)
    return out[:, :, 0], out[:, :, 1]


def _tile_w(x: jnp.ndarray, T: int, L: int) -> jnp.ndarray:
    """[B, Ho, K, W] -> [B, Ho, T, K, L] (W split into lane tiles)."""
    B, Ho, K, W = x.shape
    return jnp.moveaxis(x.reshape(B, Ho, K, T, L), 3, 2)


def _pack_specs(ipack, fpack, fdt, B, Ho, T, L, G):
    """(ipack_tiled, fpack_tiled, ipack BlockSpec, fpack BlockSpec) for the
    fused kernels' two index/weight operands.

    PACK_IDX layout (ipack is the rank-3 [B, Ho, W] index word; fpack is
    the rank-4 [B, 2, Ho, W] fraction pair): both operands become PURE
    RESHAPES of their natural W-minor layouts — iword [B, Ho, T, L] and
    fpack [B, 2, Ho, T, L] — so no relayout copy is materialized (the
    legacy rank-4 row layouts forced per-field T(1,128) copies worth
    ~2 ms/step at the KITTI recipe). The fractions lead with their own
    axis (not [B, Ho, 2, W]) so the Pallas prep kernel
    (``prep_kernel.warp_prep_pallas``) can emit them as two clean full
    [G, W] block stores. Legacy layout: the usual :func:`_tile_w`
    transposes."""
    if ipack.ndim == 3 or (ipack.ndim == 4 and ipack.shape[-1] == L
                           and fpack.ndim == 5):
        if ipack.ndim == 3:
            ipack_tiled = ipack.astype(jnp.int32).reshape(B, Ho, T, L)
            fpack_tiled = fpack.astype(fdt).reshape(B, 2, Ho, T, L)
        else:
            # pre-tiled by the prep kernel (prep_kernel tiled_out): the
            # operands pass through VERBATIM — no XLA reshape between the
            # two custom calls (which materialized ~0.8 ms/step of copies)
            ipack_tiled = ipack
            fpack_tiled = fpack.astype(fdt)
        ispec = pl.BlockSpec((1, G, T, L), lambda n, h, *_: (n, h, 0, 0),
                             memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((1, 2, G, T, L),
                             lambda n, h, *_: (n, 0, h, 0, 0),
                             memory_space=pltpu.VMEM)
        return ipack_tiled, fpack_tiled, ispec, fspec
    ipack_tiled = _tile_w(ipack.astype(jnp.int32), T, L)
    fpack_tiled = _tile_w(fpack.astype(fdt), T, L)
    ispec = pl.BlockSpec((1, G, T, ipack_tiled.shape[3], L),
                         lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, G, T, fpack_tiled.shape[3], L),
                         lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    return ipack_tiled, fpack_tiled, ispec, fspec


def _stack_pad(img_tiled: jnp.ndarray, KL: int):
    """(img_tiled', KLF, stack): under :data:`STACK_WIN`, round the scratch
    band up to whole 8-sublane granules (so the kw-tile window slice reshapes
    to [kw*KLF, L] as a pure view) and zero-pad the tiled image's sublane
    axis by the difference so every band DMA stays in range. The pad rows
    carry y-indices the weight field never selects (d0/d1 < band) — inert."""
    if not STACK_WIN:
        return img_tiled, KL, False
    KLF = -(-KL // 8) * 8
    if KLF > KL:
        img_tiled = jnp.pad(
            img_tiled, ((0, 0), (0, 0), (0, KLF - KL), (0, 0)))
    return img_tiled, KLF, True


def _dma_group(group: int, Ho: int, T: int, KL: int, L: int,
               itemsize: int) -> int:
    """Rows per grid block for the DMA kernels: must divide Ho AND keep the
    double-buffered scratch ``[2, G, T, KL, L]`` within a VMEM budget (the
    f32 unpacked band at band=16 overflows 16 MB VMEM at G=8 — observed as a
    wedged Mosaic compile, not an error)."""
    budget = 8 * 1024 * 1024
    while group > 1 and (Ho % group != 0
                         or 2 * group * T * KL * L * itemsize > budget):
        group //= 2
    return max(group, 1)


def _split_fused_out(outs, C: int, tiled_vjp: bool = False,
                     cmajor: bool = False):
    """Three [B, Ho, T, C, L] kernel outputs -> (out NHWC, va, vb).

    ``tiled_vjp``: leave va/vb in the kernel's native tiled [B, Ho, T, C, L]
    layout — they are only ever consumed by the backward contraction
    ``gfx = sum_c g * va``, which can transpose the single cotangent ``g``
    instead of both difference tensors (one relayout pass instead of two).

    ``cmajor``: outputs are [B, C, Ho, T, L]; ``out`` is returned as the
    FREE [B, C, Ho, W] NCHW reshape and va/vb stay channel-major tiled
    (the backward contraction reduces their C axis in place).
    """
    if cmajor:
        B, Cc, Ho, T, L = outs[0].shape
        if tiled_vjp == "all":
            return tuple(outs)
        out = outs[0].reshape(B, Cc, Ho, T * L)
        if tiled_vjp:
            return out, outs[1], outs[2]
        return (out,) + tuple(o.reshape(B, Cc, Ho, T * L)
                              for o in outs[1:])
    B, Ho, T, _, L = outs[0].shape
    if tiled_vjp == "all":
        return tuple(outs)
    out = jnp.moveaxis(outs[0], 3, 4).reshape(B, Ho, T * L, C)
    if tiled_vjp:
        return out, outs[1], outs[2]
    return (out,) + tuple(jnp.moveaxis(o, 3, 4).reshape(B, Ho, T * L, C)
                          for o in outs[1:])


def warp_rows_pallas_fused(bands_cw: jnp.ndarray, ws: jnp.ndarray,
                           ipack: jnp.ndarray, fpack8: jnp.ndarray,
                           band: int, C: int, group: int = 16,
                           packed: bool = False, tiled_vjp: bool = False,
                           border: bool = False):
    """Fused fwd+vjp on a materialized band tensor (non-DMA fallback);
    returns (out, va, vb) each [B, Ho, W, C]."""
    B, Ho, KL, W = bands_cw.shape
    assert KL == band * C
    L = W if W <= _LANE else _LANE
    T = W // L
    while Ho % group != 0:
        group //= 2
    G = max(group, 1)

    band_tiled = _tile_w(bands_cw, T, L)
    ipack_tiled, fpack_tiled, ispec, fspec = _pack_specs(
        ipack, fpack8, bands_cw.dtype, B, Ho, T, L, G)
    packed_idx = ipack_tiled.ndim == 4
    F = 2 if packed_idx else fpack_tiled.shape[3]

    kernel = functools.partial(_kernel_fused, G=G, T=T, band=band, C=C, L=L,
                               packed=packed, Ho=Ho,
                               fold=not packed_idx and F > 8,
                               border=border or (not packed_idx and F == 4),
                               packed_idx=packed_idx)
    odt = jnp.bfloat16 if (packed and BF16_OUT) else bands_cw.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Ho // G),
        in_specs=[
            ispec,
            fspec,
            pl.BlockSpec((1, G, T, KL, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, G, T, C, L),
                                lambda n, h, *_: (n, h, 0, 0, 0),
                                memory_space=pltpu.VMEM)] * 3,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, Ho, T, C, L), odt)] * 3,
        grid_spec=grid_spec,
    )(ws.astype(jnp.int32).reshape(-1), ipack_tiled, fpack_tiled, band_tiled)
    return _split_fused_out(outs, C, tiled_vjp=tiled_vjp)


def warp_rows_pallas_dma_fused(img_tiled: jnp.ndarray,
                               ymin_rows: jnp.ndarray, ws: jnp.ndarray,
                               ipack: jnp.ndarray, fpack8: jnp.ndarray,
                               band: int, C: int, group: int = 8,
                               packed: bool = False, tiled_vjp: bool = False,
                               border: bool = False, cmajor: bool = False):
    """Fused fwd+vjp with the band row-gather as double-buffered DMA;
    returns (out, va, vb) each [B, Ho, W, C] — or, under ``cmajor``
    (:data:`CMAJOR_OUT`), out [B, C, Ho, W] NCHW with va/vb left in the
    channel-major tiled layout [B, C, Ho, T, L].

    ``ymin_rows`` [B, Ho] selects the per-row band anchor; [B, Ho, T]
    (tile-ymin mode, from a ``tile_ymin`` prep kernel) anchors each output
    lane tile's kw-tile DMA window independently — kw x the scratch and
    DMA traffic per band row, but typically used with HALF the band
    (strongly row-bending Mei reprojections: net ~1.5x bytes for ~0.5x
    the VPU-issue-bound gather sweep, which dominates)."""
    NI, T, HC, L = img_tiled.shape
    tile_ymin = ymin_rows.ndim == 3
    B, Ho = ymin_rows.shape[:2]
    assert B % NI == 0, (B, NI)
    KL = band * C
    img_tiled, KLF, stack = _stack_pad(img_tiled, KL)
    kw = min(_WINDOW, T)
    G = _dma_group(group, Ho, T, KLF * (kw if tile_ymin else 1), L,
                   img_tiled.dtype.itemsize)

    ipack_tiled, fpack_tiled, ispec, fspec = _pack_specs(
        ipack, fpack8, img_tiled.dtype, B, Ho, T, L, G)
    packed_idx = ipack_tiled.ndim == 4
    F = 2 if packed_idx else fpack_tiled.shape[3]

    cm = cmajor
    kernel = functools.partial(
        _kernel_dma_fused_tile if tile_ymin else _kernel_dma_fused,
        G=G, T=T, band=band, C=C,
        L=L, packed=packed, NI=NI, Ho=Ho,
        fold=not packed_idx and F > 8,
        border=border or (not packed_idx and F == 4),
        stack=stack, packed_idx=packed_idx, cmajor=cm)
    odt = jnp.bfloat16 if (packed and BF16_OUT) else img_tiled.dtype
    if cm:
        ospec = pl.BlockSpec((1, C, G, T, L),
                             lambda n, h, *_: (n, 0, h, 0, 0),
                             memory_space=pltpu.VMEM)
        oshape = (B, C, Ho, T, L)
    else:
        ospec = pl.BlockSpec((1, G, T, C, L),
                             lambda n, h, *_: (n, h, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        oshape = (B, Ho, T, C, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if tile_ymin else 2,
        grid=(B, Ho // G),
        in_specs=[
            ispec,
            fspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[ospec] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, G, T, kw, KLF, L) if tile_ymin
                       else (2, G, T, KLF, L), img_tiled.dtype),
            pltpu.SemaphoreType.DMA((2, G, T) if tile_ymin else (2, G)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(oshape, odt)] * 3,
        grid_spec=grid_spec,
        # Sequential grid required by the double-buffered scratch (see fwd).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    if tile_ymin:
        # ymin and ws share one s32 prefetch word (2x 576 KB SMEM scoped
        # allocs overflow at the fisheye recipe); the low half holds the
        # band anchor in IMAGE-TILED rows, bounded by HC — guard the pack
        # statically so a future tall shape cannot silently corrupt the
        # DMA anchors (wrong rows gathered, no error raised).
        assert HC < (1 << 16), (
            f"tile-ymin ymin|ws<<16 packing needs image-tiled rows "
            f"H'*C={HC} < 65536")
        yw = (ymin_rows.astype(jnp.int32)
              | (ws.astype(jnp.int32) << 16)).reshape(B, -1)
        outs = outs(yw, ipack_tiled, fpack_tiled, img_tiled)
    else:
        outs = outs(ymin_rows.astype(jnp.int32),
                    ws.astype(jnp.int32).reshape(-1),
                    ipack_tiled, fpack_tiled, img_tiled)
    return _split_fused_out(outs, C, tiled_vjp=tiled_vjp, cmajor=cm)


def warp_rows_pallas(bands_cw: jnp.ndarray, ws: jnp.ndarray,
                     ipack: jnp.ndarray,
                     fpack: jnp.ndarray, band: int, C: int,
                     group: int = 16, packed: bool = False,
                     tiled_out: bool = False) -> jnp.ndarray:
    """``bands_cw`` [B, Ho, band*C, W], ``ws`` [B, Ho, T] int32 window
    starts, ``ipack`` [B, Ho, 6, W] int32 (x0r, x0t, x1r, x1t, d0, d1),
    ``fpack`` [B, Ho, 4, W] (wx0, wx1, wy0, wy1) -> out [B, Ho, W, C]
    (NHWC rows). ``band`` counts the stored rows (halved vs the logical
    band when ``packed``)."""
    B, Ho, KL, W = bands_cw.shape
    assert KL == band * C
    L = W if W <= _LANE else _LANE
    T = W // L
    assert W == T * L, W
    while Ho % group != 0:
        group //= 2
    G = max(group, 1)

    band_tiled = _tile_w(bands_cw, T, L)
    ipack_tiled = _tile_w(ipack.astype(jnp.int32), T, L)
    fpack_tiled = _tile_w(fpack.astype(bands_cw.dtype), T, L)
    F = fpack_tiled.shape[3]

    kernel = functools.partial(_kernel, G=G, T=T, band=band, C=C, L=L,
                               packed=packed, Ho=Ho, fold=F > 4)
    odt = jnp.bfloat16 if (packed and BF16_OUT) else bands_cw.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, T, 6, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, F, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, KL, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, T, C, L),
                               lambda n, h, *_: (n, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, T, C, L), odt),
        grid_spec=grid_spec,
    )(ws.astype(jnp.int32).reshape(-1), ipack_tiled, fpack_tiled,
      band_tiled)
    if tiled_out:
        return out
    # [B, Ho, T, C, 128] -> [B, Ho, W, C]
    return jnp.moveaxis(out, 3, 4).reshape(B, Ho, W, C)


def warp_rows_pallas_bwd(bands_cw: jnp.ndarray, ws: jnp.ndarray,
                         ipack: jnp.ndarray,
                         fpack8: jnp.ndarray, gcot_cw: jnp.ndarray,
                         band: int, C: int, group: int = 16,
                         packed: bool = False):
    """``bands_cw`` [B, Ho, band*C, W], ``ws`` [B, Ho, T] int32,
    ``ipack`` [B, Ho, 6, W] int32, ``fpack8`` [B, Ho, 8, W],
    ``gcot_cw`` [B, Ho, C, W] -> (gfx, gfy) each [B, Ho, W]."""
    B, Ho, KL, W = bands_cw.shape
    assert KL == band * C
    L = W if W <= _LANE else _LANE
    T = W // L
    assert W == T * L, W
    while Ho % group != 0:
        group //= 2
    G = max(group, 1)

    band_tiled = _tile_w(bands_cw, T, L)
    ipack_tiled = _tile_w(ipack.astype(jnp.int32), T, L)
    fpack_tiled = _tile_w(fpack8.astype(bands_cw.dtype), T, L)
    gcot_tiled = _tile_w(gcot_cw.astype(bands_cw.dtype), T, L)

    kernel = functools.partial(_kernel_bwd, G=G, T=T, band=band, C=C,
                               L=L, packed=packed, Ho=Ho)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, T, 6, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, 8, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, KL, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, C, L), lambda n, h, *_: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, T, 2, L),
                               lambda n, h, *_: (n, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, T, 2, L), bands_cw.dtype),
        grid_spec=grid_spec,
    )(ws.astype(jnp.int32).reshape(-1), ipack_tiled, fpack_tiled,
      band_tiled, gcot_tiled)
    # [B, Ho, T, 2, L] -> [B, Ho, 2, W]
    out = jnp.moveaxis(out, 2, 3).reshape(B, Ho, 2, W)
    return out[:, :, 0], out[:, :, 1]


# Fuse the band row-gather into the kernels as double-buffered DMA (default);
# False restores the XLA-gather + materialized-band path for A/B comparison.
import os as _os

DMA_GATHER = _os.environ.get("FSNET_DMA_GATHER", "1") != "0"


def grid_sample_band_pallas_bwd(image: jnp.ndarray, iw: dict, band: int,
                                wxa0, wxa1, wya0, wya1,
                                wxb0, wxb1, wyb0, wyb1,
                                gcot: jnp.ndarray, group: int = 16,
                                dma: bool | None = None):
    """Fused backward band warp: pass a = d out/d fx, pass b = d out/d fy,
    reduced against ``gcot`` [B, Ho, W, C]. Returns (gfx, gfy) [B, Ho, W]."""
    B, H, W, C = image.shape
    f32 = jnp.float32
    L = W if W <= _LANE else _LANE
    ipack, ws = _make_ipack(iw, W, L)
    fpack8 = jnp.stack([wxa0, wxa1, wya0, wya1,
                        wxb0, wxb1, wyb0, wyb1], axis=2).astype(f32)
    gcot_cw = jnp.transpose(gcot, (0, 1, 3, 2)).astype(f32)  # [B, Ho, C, W]
    if DMA_GATHER if dma is None else dma:
        img_tiled, ymin_rows, rows, packed = _prep_img_dma(image, iw, band)
        return warp_rows_pallas_dma_bwd(img_tiled, ymin_rows, ws, ipack,
                                        fpack8, gcot_cw, rows, C,
                                        group=min(group, 8), packed=packed)
    bands_cw, rows, packed = _prep_bands(image, iw, band)
    return warp_rows_pallas_bwd(bands_cw, ws, ipack, fpack8, gcot_cw, rows,
                                C, group=group, packed=packed)


def gather_bands_cw(image: jnp.ndarray, ymin: jnp.ndarray,
                    band: int) -> jnp.ndarray:
    """[B, H, W, C] + per-output-row band start [B, Ho] ->
    ``bands_cw`` [B, Ho, band*C, W] via ONE image transpose and contiguous
    full-row gathers (no padded-layout transposes of the band tensor)."""
    B, H, W, C = image.shape
    Ho = ymin.shape[1]
    img_cw = jnp.transpose(image, (0, 1, 3, 2)).reshape(B, H, C * W)
    band_idx = ymin[:, :, None] + jnp.arange(band)[None, None, :]
    rows = jnp.take_along_axis(
        img_cw, band_idx.reshape(B, Ho * band, 1), axis=1,
    ).reshape(B, Ho, band, C * W)
    # (band, C, W) -> (band*C, W) is a pure reshape in this pixel order
    return rows.reshape(B, Ho, band * C, W)


def _use_packed(image, band: int) -> bool:
    """bf16 images pack two adjacent band rows into one f32 word (exact, the
    data is already bf16), halving the dominant gather work. Needs even H and
    band, and even ``ymin`` (guaranteed by ``_indices_and_weights``)."""
    return (image.dtype == jnp.bfloat16 and image.shape[1] % 2 == 0
            and band % 2 == 0)


def _prep_bands(image, iw, band):
    """-> (bands_cw, stored_rows, packed) honoring the bf16 packing path."""
    Bg = iw["ymin"].shape[0]
    if image.shape[0] != Bg:       # scale-batched grids: tile sources
        image = jnp.tile(image, (Bg // image.shape[0], 1, 1, 1))
    if _use_packed(image, band):
        pimg = pack_rows_bf16(image)
        return (gather_bands_cw(pimg, iw["ymin"] // 2, band // 2),
                band // 2, True)
    return (gather_bands_cw(image.astype(jnp.float32), iw["ymin"], band),
            band, False)


def _prep_img_dma(image, iw, band):
    """-> (img_tiled, ymin_rows, stored_rows, packed) for the fused-DMA
    kernels, honoring the bf16 packing path. ``ymin_rows`` is in sublane-row
    units of the [B, T, H'*C, L] tiled image."""
    C = image.shape[3]
    if _use_packed(image, band):
        pimg = pack_rows_bf16(image)
        return _tile_img_rows(pimg), (iw["ymin"] // 2) * C, band // 2, True
    pimg = image.astype(jnp.float32)
    return _tile_img_rows(pimg), iw["ymin"] * C, band, False


def grid_sample_band_pallas(image: jnp.ndarray, iw: dict, band: int,
                            wx0, wx1, wy0, wy1, group: int = 16,
                            dma: bool | None = None,
                            tiled_out: bool = False) -> jnp.ndarray:
    """Forward band warp with explicit corner weights (shared by the fwd pass
    and the custom-VJP difference passes). Returns NHWC f32."""
    B, H, W, C = image.shape
    L = W if W <= _LANE else _LANE
    ipack, ws = _make_ipack(iw, W, L)
    rows = [wx0, wx1, wy0, wy1]
    if FOLD_WIN:
        # window one-hots as prefetched f32 rows (pure one-hots here: any
        # padding handling is already folded into the caller's weights)
        f32 = jnp.float32
        rows += [(ipack[:, :, 1] == t).astype(f32) for t in range(_WINDOW)]
        rows += [(ipack[:, :, 3] == t).astype(f32) for t in range(_WINDOW)]
    fpack = jnp.stack(rows, axis=2).astype(jnp.float32)
    if DMA_GATHER if dma is None else dma:
        img_tiled, ymin_rows, rows, packed = _prep_img_dma(image, iw, band)
        return warp_rows_pallas_dma(img_tiled, ymin_rows, ws, ipack, fpack,
                                    rows, C, group=min(group, 8),
                                    packed=packed, tiled_out=tiled_out)
    bands_cw, rows, packed = _prep_bands(image, iw, band)
    return warp_rows_pallas(bands_cw, ws, ipack, fpack, rows, C, group=group,
                            packed=packed, tiled_out=tiled_out)


def grid_sample_band_pallas_fused(image: jnp.ndarray, iw: dict, band: int,
                                  wx0, wx1, wy0, wy1, mx0, mx1, my0, my1,
                                  group: int = 16, dma: bool | None = None,
                                  border: bool = False,
                                  tiled_vjp: bool = False):
    """Fused forward + VJP band warp: ONE kernel pass returning
    (out, va, vb) NHWC where va = d out/d fx and vb = d out/d fy (the two
    difference passes the backward kernel would otherwise re-derive with its
    own gathers and DMAs). ``m*`` are zeros-padding corner validity masks
    (pass ones for border padding). When the caller knows the masks are all
    ones it should pass ``border=True``: the 4 mask rows drop from fpack
    (halving its HBM traffic) and the kernels skip their reads+multiplies —
    identical math, evaluated at m*=1."""
    B, H, W, C = image.shape
    f32 = jnp.float32
    L = W if W <= _LANE else _LANE
    if PACK_IDX and not FOLD_WIN and "fx" in iw:
        # one s32 index word (+ validity bits) and just the raw fractions
        # ([B, 2, Ho, W] — fraction axis leading, see _pack_specs); the
        # kernels reconstruct the corner weights (see _fused_tile)
        ipack, ws = _make_ipack_packed(iw, W, L, with_masks=not border)
        fpack8 = jnp.stack([iw["fx"], iw["fy"]], axis=1).astype(f32)
        if DMA_GATHER if dma is None else dma:
            img_tiled, ymin_rows, rows, packed = _prep_img_dma(image, iw,
                                                               band)
            return warp_rows_pallas_dma_fused(
                img_tiled, ymin_rows, ws, ipack, fpack8, rows, C,
                group=min(group, 8), packed=packed, tiled_vjp=tiled_vjp,
                border=border)
        bands_cw, rows, packed = _prep_bands(image, iw, band)
        return warp_rows_pallas_fused(
            bands_cw, ws, ipack, fpack8, rows, C, group=group, packed=packed,
            tiled_vjp=tiled_vjp, border=border)
    ipack, ws = _make_ipack(iw, W, L)
    if border and BORDER_FAST and not FOLD_WIN:
        fpack8 = jnp.stack([wx0, wx1, wy0, wy1], axis=2).astype(f32)
    elif FOLD_WIN:
        # Window one-hots carry the x-validity masks; invalid-y corners are
        # routed to the out-of-range band sentinel so my* never enters the
        # kernel. See _fused_tile(fold=True).
        q0 = [(ipack[:, :, 1] == t) * mx0 for t in range(_WINDOW)]
        q1 = [(ipack[:, :, 3] == t) * mx1 for t in range(_WINDOW)]
        ipack = ipack.at[:, :, 4].set(
            jnp.where(my0 > 0, ipack[:, :, 4], band))
        ipack = ipack.at[:, :, 5].set(
            jnp.where(my1 > 0, ipack[:, :, 5], band))
        fpack8 = jnp.stack([wx0, wx1, wy0, wy1] + q0 + q1,
                           axis=2).astype(f32)
    else:
        fpack8 = jnp.stack([wx0, wx1, wy0, wy1, mx0, mx1, my0, my1],
                           axis=2).astype(f32)
    if DMA_GATHER if dma is None else dma:
        img_tiled, ymin_rows, rows, packed = _prep_img_dma(image, iw, band)
        return warp_rows_pallas_dma_fused(img_tiled, ymin_rows, ws, ipack,
                                          fpack8, rows, C,
                                          group=min(group, 8), packed=packed,
                                          tiled_vjp=tiled_vjp)
    bands_cw, rows, packed = _prep_bands(image, iw, band)
    return warp_rows_pallas_fused(bands_cw, ws, ipack, fpack8, rows, C,
                                  group=group, packed=packed,
                                  tiled_vjp=tiled_vjp)


def pallas_warp_supported(image_shape) -> bool:
    """The kernel requires Wo == W and W either <= 128 or a multiple of 128
    (lane-tile decomposition); other shapes use the einsum band warp."""
    W = image_shape[2]
    return W <= _LANE or W % _LANE == 0
