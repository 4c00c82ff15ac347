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
:func:`pallas_warp_supported`).

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


def _kernel(ipack_ref, fpack_ref, band_ref, out_ref, *, G, T, band, C, L):
    """Blocks: ipack [1, G, T, 6, L] int32 (x0r, x0t, x1r, x1t, d0, d1),
    fpack [1, G, T, 4, L] (wx0, wx1, wy0, wy1),
    band [1, G, T, KL, L], out [1, G, T, C, L]."""
    KL = band * C
    _LANE = L
    for g in range(G):
        for u in range(T):
            x0r = jnp.broadcast_to(ipack_ref[0, g, u, 0:1, :], (KL, _LANE))
            x0t = jnp.broadcast_to(ipack_ref[0, g, u, 1:2, :], (KL, _LANE))
            x1r = jnp.broadcast_to(ipack_ref[0, g, u, 2:3, :], (KL, _LANE))
            x1t = jnp.broadcast_to(ipack_ref[0, g, u, 3:4, :], (KL, _LANE))

            g0 = jnp.zeros((KL, _LANE), band_ref.dtype)
            g1 = jnp.zeros((KL, _LANE), band_ref.dtype)
            for t in range(T):
                src = band_ref[0, g, t]
                gth0 = jnp.take_along_axis(src, x0r, axis=1)
                gth1 = jnp.take_along_axis(src, x1r, axis=1)
                g0 = g0 + gth0 * (x0t == t).astype(src.dtype)
                g1 = g1 + gth1 * (x1t == t).astype(src.dtype)

            hz = (g0 * fpack_ref[0, g, u, 0:1, :]
                  + g1 * fpack_ref[0, g, u, 1:2, :])       # [KL, 128]

            d_of_row = jax.lax.broadcasted_iota(jnp.int32, (KL, _LANE), 0) // C
            wv = ((d_of_row == ipack_ref[0, g, u, 4:5, :])
                  * fpack_ref[0, g, u, 2:3, :]
                  + (d_of_row == ipack_ref[0, g, u, 5:6, :])
                  * fpack_ref[0, g, u, 3:4, :])
            weighted = (hz * wv).reshape(band, C, _LANE)
            out_ref[0, g, u] = jnp.sum(weighted, axis=0)   # [C, 128]


def _kernel_bwd(ipack_ref, fpack_ref, band_ref, gcot_ref, out_ref, *,
                G, T, band, C, L):
    """Fused grid-cotangent kernel: both difference passes (d out/d fx and
    d out/d fy) share the corner gathers, and the channel reduction against
    the output cotangent folds in, so the whole backward costs ~one forward.

    Blocks: ipack [1, G, T, 6, L] int32 (x0r, x0t, x1r, x1t, d0, d1),
    fpack [1, G, T, 8, L] (wxa0, wxa1, wya0, wya1, wxb0, wxb1, wyb0, wyb1)
    where pass a computes d/d fx (difference x-weights) and pass b d/d fy,
    gcot [1, G, T, C, L] channel-major output cotangent,
    out [1, G, T, 2, L] = (gfx, gfy) rows."""
    KL = band * C
    for g in range(G):
        for u in range(T):
            x0r = jnp.broadcast_to(ipack_ref[0, g, u, 0:1, :], (KL, L))
            x0t = jnp.broadcast_to(ipack_ref[0, g, u, 1:2, :], (KL, L))
            x1r = jnp.broadcast_to(ipack_ref[0, g, u, 2:3, :], (KL, L))
            x1t = jnp.broadcast_to(ipack_ref[0, g, u, 3:4, :], (KL, L))

            g0 = jnp.zeros((KL, L), band_ref.dtype)
            g1 = jnp.zeros((KL, L), band_ref.dtype)
            for t in range(T):
                src = band_ref[0, g, t]
                gth0 = jnp.take_along_axis(src, x0r, axis=1)
                gth1 = jnp.take_along_axis(src, x1r, axis=1)
                g0 = g0 + gth0 * (x0t == t).astype(src.dtype)
                g1 = g1 + gth1 * (x1t == t).astype(src.dtype)

            d_of_row = jax.lax.broadcasted_iota(jnp.int32, (KL, L), 0) // C
            is0 = d_of_row == ipack_ref[0, g, u, 4:5, :]
            is1 = d_of_row == ipack_ref[0, g, u, 5:6, :]

            hz_a = (g0 * fpack_ref[0, g, u, 0:1, :]
                    + g1 * fpack_ref[0, g, u, 1:2, :])
            wv_a = (is0 * fpack_ref[0, g, u, 2:3, :]
                    + is1 * fpack_ref[0, g, u, 3:4, :])
            hz_b = (g0 * fpack_ref[0, g, u, 4:5, :]
                    + g1 * fpack_ref[0, g, u, 5:6, :])
            wv_b = (is0 * fpack_ref[0, g, u, 6:7, :]
                    + is1 * fpack_ref[0, g, u, 7:8, :])

            gc = gcot_ref[0, g, u]                         # [C, L]
            va = (hz_a * wv_a).reshape(band, C, L).sum(0)  # [C, L]
            vb = (hz_b * wv_b).reshape(band, C, L).sum(0)
            out_ref[0, g, u, 0:1, :] = jnp.sum(va * gc, axis=0, keepdims=True)
            out_ref[0, g, u, 1:2, :] = jnp.sum(vb * gc, axis=0, keepdims=True)


def _tile_w(x: jnp.ndarray, T: int, L: int) -> jnp.ndarray:
    """[B, Ho, K, W] -> [B, Ho, T, K, L] (W split into lane tiles)."""
    B, Ho, K, W = x.shape
    return jnp.moveaxis(x.reshape(B, Ho, K, T, L), 3, 2)


def warp_rows_pallas(bands_cw: jnp.ndarray, ipack: jnp.ndarray,
                     fpack: jnp.ndarray, band: int, C: int,
                     group: int = 16) -> jnp.ndarray:
    """``bands_cw`` [B, Ho, band*C, W], ``ipack`` [B, Ho, 6, W] int32
    (x0r, x0t, x1r, x1t, d0, d1), ``fpack`` [B, Ho, 4, W]
    (wx0, wx1, wy0, wy1) -> out [B, Ho, W, C] (NHWC rows)."""
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

    kernel = functools.partial(_kernel, G=G, T=T, band=band, C=C, L=L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, T, C, L), bands_cw.dtype),
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, T, 6, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, 4, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, KL, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, T, C, L),
                               lambda n, h: (n, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(ipack_tiled, fpack_tiled, band_tiled)
    # [B, Ho, T, C, 128] -> [B, Ho, W, C]
    return jnp.moveaxis(out, 3, 4).reshape(B, Ho, W, C)


def warp_rows_pallas_bwd(bands_cw: jnp.ndarray, ipack: jnp.ndarray,
                         fpack8: jnp.ndarray, gcot_cw: jnp.ndarray,
                         band: int, C: int, group: int = 16):
    """``bands_cw`` [B, Ho, band*C, W], ``ipack`` [B, Ho, 6, W] int32,
    ``fpack8`` [B, Ho, 8, W], ``gcot_cw`` [B, Ho, C, W] ->
    (gfx, gfy) each [B, Ho, W]."""
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

    kernel = functools.partial(_kernel_bwd, G=G, T=T, band=band, C=C, L=L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, T, 2, L), bands_cw.dtype),
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, T, 6, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, 8, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, KL, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, C, L), lambda n, h: (n, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, T, 2, L),
                               lambda n, h: (n, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(ipack_tiled, fpack_tiled, band_tiled, gcot_tiled)
    # [B, Ho, T, 2, L] -> [B, Ho, 2, W]
    out = jnp.moveaxis(out, 2, 3).reshape(B, Ho, 2, W)
    return out[:, :, 0], out[:, :, 1]


def grid_sample_band_pallas_bwd(image: jnp.ndarray, iw: dict, band: int,
                                wxa0, wxa1, wya0, wya1,
                                wxb0, wxb1, wyb0, wyb1,
                                gcot: jnp.ndarray, group: int = 16):
    """Fused backward band warp: pass a = d out/d fx, pass b = d out/d fy,
    reduced against ``gcot`` [B, Ho, W, C]. Returns (gfx, gfy) [B, Ho, W]."""
    B, H, W, C = image.shape
    f32 = jnp.float32
    bands_cw = gather_bands_cw(image.astype(f32), iw["ymin"], band)
    L = W if W <= _LANE else _LANE
    x0 = iw["x0c"]
    x1 = iw["x1c"]
    ipack = jnp.stack([x0 % L, x0 // L, x1 % L, x1 // L,
                       iw["d0"], iw["d1"]], axis=2)
    fpack8 = jnp.stack([wxa0, wxa1, wya0, wya1,
                        wxb0, wxb1, wyb0, wyb1], axis=2).astype(f32)
    gcot_cw = jnp.transpose(gcot, (0, 1, 3, 2)).astype(f32)  # [B, Ho, C, W]
    return warp_rows_pallas_bwd(bands_cw, ipack, fpack8, gcot_cw, band, C,
                                group=group)


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


def grid_sample_band_pallas(image: jnp.ndarray, iw: dict, band: int,
                            wx0, wx1, wy0, wy1, group: int = 16) -> jnp.ndarray:
    """Forward band warp with explicit corner weights (shared by the fwd pass
    and the custom-VJP difference passes). Returns NHWC."""
    B, H, W, C = image.shape
    bands_cw = gather_bands_cw(image, iw["ymin"], band)
    L = W if W <= _LANE else _LANE
    x0 = iw["x0c"]
    x1 = iw["x1c"]
    ipack = jnp.stack([x0 % L, x0 // L, x1 % L, x1 // L,
                       iw["d0"], iw["d1"]], axis=2)
    fpack = jnp.stack([wx0, wx1, wy0, wy1], axis=2)
    return warp_rows_pallas(bands_cw, ipack, fpack, band, C, group=group)


def pallas_warp_supported(image_shape) -> bool:
    """The kernel requires Wo == W and W either <= 128 or a multiple of 128
    (lane-tile decomposition); other shapes use the einsum band warp."""
    W = image_shape[2]
    return W <= _LANE or W % _LANE == 0
