"""Pallas warp-prep kernels: depth + projection rows -> band-warp operands.

Round-2 VERDICT item 1: at the 47 ms step, ~6 ms of XLA elementwise sits
*around* the Pallas warp kernels — the reprojection grid chain
(``ops/geometry.py:reproject``: one 3x3 matvec + divide per pixel, with a
[S, F, B, H, W, 2] f32 grid materialized in HBM), the index/fraction prep
(``ops/warp_fast.py:_indices_and_weights`` +
``warp_kernel._make_ipack_packed``), the analytic overlap-mask test, and on
the backward side ``_chain_to_grid`` + the autodiff of ``reproject``. These
kernels fuse the whole chain:

    forward:  depth [S*B, H, W] + per-warp affine rows A/b ->
              iword [N, H, W] s32   (PACK_IDX layout of warp_kernel._read_idx
                                     + the analytic overlap bit at bit 28)
              fpack [N, 2, H, W] f32 (raw bilinear fractions fx, fy)
              ymin_rows [N, H] s32   (band DMA start, sublane-row units)
              ws [N, H, T] s32       (dynamic 3-tile window anchors)
    backward: (gfx, gfy) pixel-space fraction cotangents + depth ->
              d loss/d depth, summed over the F frames in-kernel.

The projection math matches ``reproject`` exactly: with P = (K @ T)[:3],
A = P[:, :3] @ inv_K3 and b = P[:, 3], a pixel (col j, row i) at depth d
maps to x = (d*cx + bx) / (d*cz + bz + 1e-7) where c = A @ [j, i, 1] — all
f32 (grid-math precision mandate, BASELINE.md). The normalize/unnormalize
pair of the grid route cancels under align_corners=True and is skipped
(numerically identical up to ~1 ulp of the normalized coordinate).

Border padding only (the photometric warp); the zeros-padding mask warp
keeps the XLA prep. Gradient scope: d depth only — A/b (pose/intrinsics)
cotangents are NOT produced, so the wrapper (``ops/warp_depth.py``) must
dispatch here only when poses are constants (GT-pose ``MonoDepthWPose``;
reference ``monodepth/networks/models/meta_archs/monodepth2_model.py``
reads them straight from the dataset). Learned-pose paths keep the grid
route, through which pose gradients flow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_WINDOW = 3
_EPS = 1e-7


def _affine(a_ref):
    """[1, 1, 16] SMEM block -> the 9 + 3 scalars (A row-major, then b).

    The singleton middle dim satisfies Mosaic's block-shape rule (the last
    two block dims must divide (8, 128) or equal the array dims)."""
    vals = [a_ref[0, 0, k] for k in range(12)]
    return vals[:9], vals[9:12]


def _pix_coords(a_ref, d, jj, ii):
    """Projected pixel coords for a [G, W] block.

    ``d`` [G, W] f32 depth, ``jj``/``ii`` [G, W] f32 column/row coords.
    Returns (x, y, cx, cy, cz, inv) — exactly ``reproject``'s pixel-space
    output (the normalize/unnormalize pair cancels, align_corners=True)."""
    A, b = _affine(a_ref)
    cx = A[0] * jj + A[1] * ii + A[2]
    cy = A[3] * jj + A[4] * ii + A[5]
    cz = A[6] * jj + A[7] * ii + A[8]
    inv = 1.0 / (d * cz + b[2] + _EPS)
    x = (d * cx + b[0]) * inv
    y = (d * cy + b[1]) * inv
    return x, y, cx, cy, cz, inv


def _iotas(h, G, W):
    """(ii rows, jj cols) [G, W] f32 for the block starting at row h*G.
    Mosaic iota is integer-only; cast after."""
    ii = (jax.lax.broadcasted_iota(jnp.int32, (G, W), 0)
          + h * G).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1).astype(jnp.float32)
    return ii, jj


def _pack_xy(x, y, iword_ref, fpack_ref, ymin_ref, ws_ref,
             *, T, L, H, W, band, row_div, row_mul, tile_ymin=False,
             tiled_out=False):
    """Pack projected pixel coords [G, W] into the band-warp operands
    (shared by the pinhole and Mei prep kernels).

    ``row_div``/``row_mul``: ymin -> DMA sublane rows
    ((ymin // row_div) * row_mul; row_div=2 on the bf16 row-packed image
    path, row_mul=C; 1/1 emits raw even-rounded image rows).

    ``tile_ymin``: emit a band start per (row, OUTPUT TILE) [G, T] instead
    of per row [G, 1] — the Mei reprojection bends rows vertically (p95
    row spread 10-18 image rows at KITTI-360 motion) but each 128-lane
    tile's local spread is only 2-5 rows (``scripts/fisheye_band_probe.py``),
    so a per-tile anchor covers MORE samples with HALF the band. Consumed
    by the windowed per-tile DMA kernels (``warp_kernel`` ``tile_ymin``)."""
    G = x.shape[0]
    ov = ((x >= -0.5) & (x < W - 0.5) & (y >= -0.5) & (y < H - 0.5))
    xb = jnp.clip(x, 0.0, float(W - 1))
    yb = jnp.clip(y, 0.0, float(H - 1))
    x0f = jnp.floor(xb)
    y0f = jnp.floor(yb)
    fx = xb - x0f
    fy = yb - y0f
    if tiled_out:
        # rank-5 fpack [1, 2, G, T, L]: aligned lane-tile slice stores, so
        # the fused warp kernel's operand is the prep kernel's output
        # VERBATIM — the XLA-side [.., W] -> [.., T, L] reshape between two
        # layout-pinned custom calls materialized ~0.8 ms/step of copies
        # through an H-minor intermediate (r5 trace, copy.12980/12986)
        for u in range(T):
            fpack_ref[0, 0, :, u] = fx[:, u * L:(u + 1) * L]
            fpack_ref[0, 1, :, u] = fy[:, u * L:(u + 1) * L]
    else:
        fpack_ref[0, 0] = fx
        fpack_ref[0, 1] = fy
    x0c = x0f.astype(jnp.int32)
    y0c = y0f.astype(jnp.int32)
    x1c = jnp.minimum(x0c + 1, W - 1)
    y1c = jnp.minimum(y0c + 1, H - 1)

    if tile_ymin:
        # per-(row, tile) band start: min over each 128-lane tile
        cols = []
        for u in range(T):
            lo = jnp.min(y0f[:, u * L:(u + 1) * L], axis=1,
                         keepdims=True).astype(jnp.int32)
            cols.append(lo)                                    # [G, 1]
        ymin = cols[0] if T == 1 else jnp.concatenate(cols, axis=1)
        ymin = jnp.clip(ymin, 0, max(H - band, 0))
        ymin = ymin - (ymin & 1)                               # [G, T]
        ymin_ref[0] = (ymin // row_div) * row_mul
        yminx = (ymin[:, :, None] if T > 1 else ymin[:, None, :])
        yminx = jnp.broadcast_to(yminx, (G, T, L)).reshape(G, W)
        d0 = jnp.clip(y0c - yminx, 0, band - 1)
        d1 = jnp.clip(y1c - yminx, 0, band - 1)
    else:
        # per-row band start: min over the whole row, clipped, rounded even
        # (bf16 row-pair packing), exactly _indices_and_weights' ymin
        ymin = jnp.min(y0f, axis=1, keepdims=True).astype(jnp.int32)
        ymin = jnp.clip(ymin, 0, max(H - band, 0))
        ymin = ymin - (ymin & 1)                               # [G, 1]
        ymin_ref[0] = (ymin // row_div) * row_mul
        d0 = jnp.clip(y0c - ymin, 0, band - 1)
        d1 = jnp.clip(y1c - ymin, 0, band - 1)

    # dynamic window anchor per (row, output tile): _make_ipack_packed
    kw = min(_WINDOW, T)
    cols = []
    for u in range(T):
        hi = jnp.max(x1c[:, u * L:(u + 1) * L].astype(jnp.float32), axis=1,
                     keepdims=True).astype(jnp.int32) // L
        cols.append(jnp.clip(hi - (kw - 1), 0, T - kw))       # [G, 1]
    ws = cols[0] if T == 1 else jnp.concatenate(cols, axis=1)  # [G, T]
    ws_ref[0] = ws
    wsx = (ws[:, :, None] if T > 1 else ws[:, None, :])        # [G, T, 1]
    wsx = jnp.broadcast_to(wsx, (G, T, L)).reshape(G, W)
    lo = wsx * L
    hic = (wsx + kw) * L - 1
    x0w = jnp.clip(x0c, lo, hic)
    x1w = jnp.clip(x1c, lo, hic)
    word = ((x0w % L)
            | ((x0w // L - wsx) << 7)
            | (d0 << 9)
            | ((x1w % L) << 14)
            | ((x1w // L - wsx) << 21)
            | (d1 << 23)
            | (ov.astype(jnp.int32) << 28))
    if tiled_out:
        for u in range(T):
            iword_ref[0, :, u] = word[:, u * L:(u + 1) * L]
    else:
        iword_ref[0] = word


def _prep_kernel(depth_ref, a_ref, iword_ref, fpack_ref, ymin_ref, ws_ref,
                 *, G, T, L, H, W, band, row_div, row_mul, tiled_out=False):
    """Grid (N, H // G); every op is a full [G, W] (or [G, L]) block."""
    ii, jj = _iotas(pl.program_id(1), G, W)
    d = depth_ref[0].astype(jnp.float32)
    x, y, _, _, _, _ = _pix_coords(a_ref, d, jj, ii)
    _pack_xy(x, y, iword_ref, fpack_ref, ymin_ref, ws_ref, T=T, L=L, H=H,
             W=W, band=band, row_div=row_div, row_mul=row_mul,
             tiled_out=tiled_out)


def warp_prep_pallas(depth: jnp.ndarray, arows: jnp.ndarray, S: int, F: int,
                     band: int, C: int, packed: bool, group: int = 8):
    """``depth`` [S*B, H, W] (any float dtype), ``arows`` [N, 16] f32 with
    N = S*F*B in (s, f, b) order (cols 0-8 = A row-major, 9-11 = b, rest
    pad) -> (iword [N, H, W] s32, fpack [N, 2, H, W] f32,
    ymin_rows [N, H] s32, ws [N, H, T] s32) in exactly the formats
    :func:`warp_kernel.warp_rows_pallas_dma_fused` consumes on its
    PACK_IDX/border path; bit 28 of iword is the analytic overlap mask."""
    SB, H, W = depth.shape
    N = arows.shape[0]
    B = N // (S * F)
    assert SB == S * B, (depth.shape, S, F, N)
    L = W if W <= _LANE else _LANE
    T = W // L
    G = group
    while H % G != 0:
        G //= 2
    kernel = functools.partial(
        _prep_kernel, G=G, T=T, L=L, H=H, W=W, band=band,
        row_div=2 if packed else 1, row_mul=C, tiled_out=True)

    def di(n, h):
        # n = (s * F + f) * B + b -> depth row s * B + b
        return n // (F * B) * B + jax.lax.rem(n, B), h, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N, H // G),
        in_specs=[
            pl.BlockSpec((1, G, W), di, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda n, h: (n, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, T, L), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, G, T, L), lambda n, h: (n, 0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1), lambda n, h: (n, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T), lambda n, h: (n, h, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    iword, fpack, ymin, ws = pl.pallas_call(
        kernel,
        out_shape=[
            # pre-tiled [.., T, L] shapes: byte-identical to the W-minor
            # rank-3/4 forms, but the fused warp kernel consumes them with
            # NO intervening XLA reshape (see _pack_xy tiled_out)
            jax.ShapeDtypeStruct((N, H, T, L), jnp.int32),
            jax.ShapeDtypeStruct((N, 2, H, T, L), jnp.float32),
            jax.ShapeDtypeStruct((N, H, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, H, T), jnp.int32),
        ],
        grid_spec=grid_spec,
    )(depth, arows.reshape(N, 1, 16))
    return iword, fpack, ymin.reshape(N, H), ws


def _prep_bwd_kernel(depth_ref, *rest, G, H, W, F):
    """Grid (S*B, H // G). Operands after depth: gfx_f x F, gfy_f x F
    ([1, G, W] blocks), arows_f x F ([1, 16] SMEM), then the ddepth
    [1, G, W] f32 output."""
    gfx_refs = rest[0:F]
    gfy_refs = rest[F:2 * F]
    a_refs = rest[2 * F:3 * F]
    out_ref = rest[3 * F]
    ii, jj = _iotas(pl.program_id(1), G, W)
    d = depth_ref[0].astype(jnp.float32)
    acc = None
    for f in range(F):
        x, y, cx, cy, cz, inv = _pix_coords(a_refs[f], d, jj, ii)
        _, b = _affine(a_refs[f])
        # d x/d depth = (cx*(bz+eps) - bx*cz) / pz^2   (same for y); the
        # border-clamp zeroing (strict in-range test) matches _chain_to_grid
        dxdd = (cx * (b[2] + _EPS) - b[0] * cz) * (inv * inv)
        dydd = (cy * (b[2] + _EPS) - b[1] * cz) * (inv * inv)
        mx = ((x > 0.0) & (x < W - 1)).astype(jnp.float32)
        my = ((y > 0.0) & (y < H - 1)).astype(jnp.float32)
        gx = gfx_refs[f][0].astype(jnp.float32)
        gy = gfy_refs[f][0].astype(jnp.float32)
        term = gx * mx * dxdd + gy * my * dydd
        acc = term if acc is None else acc + term
    out_ref[0] = acc


def warp_prep_bwd_pallas(depth: jnp.ndarray, gfx: jnp.ndarray,
                         gfy: jnp.ndarray, arows: jnp.ndarray, S: int,
                         F: int, group: int = 8):
    """(gfx, gfy) [N, H, W] pixel-space fraction cotangents -> d depth
    [S*B, H, W] f32, summing the F frames in-kernel. Replaces
    ``warp_fast._chain_to_grid`` + the XLA autodiff of ``reproject``."""
    SB, H, W = depth.shape
    B = SB // S
    G = group
    while H % G != 0:
        G //= 2
    kernel = functools.partial(_prep_bwd_kernel, G=G, H=H, W=W, F=F)

    def nmap(f):
        # output block m = s * B + b -> warp n = (s * F + f) * B + b
        def im(m, h):
            return (m // B * F + f) * B + jax.lax.rem(m, B), h, 0
        return im

    in_specs = [pl.BlockSpec((1, G, W), lambda m, h: (m, h, 0),
                             memory_space=pltpu.VMEM)]
    for f in range(F):
        in_specs.append(pl.BlockSpec((1, G, W), nmap(f),
                                     memory_space=pltpu.VMEM))
    for f in range(F):
        in_specs.append(pl.BlockSpec((1, G, W), nmap(f),
                                     memory_space=pltpu.VMEM))
    for f in range(F):
        fm = nmap(f)
        in_specs.append(pl.BlockSpec(
            (1, 1, 16), lambda m, h, fm=fm: (fm(m, h)[0], 0, 0),
            memory_space=pltpu.SMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(SB, H // G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, W), lambda m, h: (m, h, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SB, H, W), jnp.float32),
        grid_spec=grid_spec,
    )(depth, *([gfx] * F), *([gfy] * F),
      *([arows.reshape(-1, 1, 16)] * F))
