"""Pallas band-warp kernel: per-output-row bilinear resampling on the VPU's
hardware ``dynamic_gather`` (lane-axis gather).

Pipeline (NHWC batch in, NHWC out):

1. (XLA) transpose the image to channel-major pixels ``[B, H, C*W]`` and
   row-gather each output row's vertical band -> ``bands_cw
   [B, Ho, band*C, W]`` — contiguous full-row copies, the gather class XLA
   executes at HBM speed.
2. (Pallas, grid (B, Ho/G)) for each output row: two lane-axis
   ``tpu.dynamic_gather``s pick the x0/x1 columns for every output pixel,
   bilinear x/y two-hot weights combine them on the VPU, and a sublane-split
   reduction folds the band axis.

Only the lane-axis gather is used: the Mosaic axis-0 (sublane) gather path
crashes this toolchain's compiler (probed in ``scripts/tpu_pallas_probe2.py``).

Constraint: operand/index shapes of ``tpu.dynamic_gather`` must match, so the
kernel requires ``Wo == W`` (true for every warp in the framework: losses
resample at the render resolution).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANE = 128


def _tile_gather(bandm, xidx, KL, W):
    """Exact lane gather of ``bandm[r, xidx[c]]`` for arbitrary xidx in
    [0, W): ``tpu.dynamic_gather`` only addresses within one 128-lane tile
    (wider operands crash the Mosaic backend — probed), so decompose into
    (out-tile x src-tile) single-tile gathers combined by tile-select masks.
    ``xidx`` is [1, W] int32."""
    if W <= _LANE:  # single lane tile: direct gather
        idx = jnp.broadcast_to(xidx, (KL, W))
        return jnp.take_along_axis(bandm, idx, axis=1)
    T = W // _LANE
    tsel = xidx // _LANE                                  # [1, W]
    rem = xidx % _LANE
    out_tiles = []
    for u in range(T):
        sl = slice(u * _LANE, (u + 1) * _LANE)
        idx_u = jnp.broadcast_to(rem[:, sl], (KL, _LANE))
        tsel_u = tsel[:, sl]                              # [1, 128]
        acc = jnp.zeros((KL, _LANE), bandm.dtype)
        for t in range(T):
            src = bandm[:, t * _LANE:(t + 1) * _LANE]     # [KL, 128]
            gth = jnp.take_along_axis(src, idx_u, axis=1)
            acc = acc + jnp.where(tsel_u == t, gth, 0.0)
        out_tiles.append(acc)
    return jnp.concatenate(out_tiles, axis=1)             # [KL, W]


def _kernel(ipack_ref, fpack_ref, band_ref, out_ref, *, G, band, C, W):
    KL = band * C
    for g in range(G):
        bandm = band_ref[0, g]                            # [KL, W]
        g0 = _tile_gather(bandm, ipack_ref[0, g, 0:1, :], KL, W)
        g1 = _tile_gather(bandm, ipack_ref[0, g, 1:2, :], KL, W)
        hz = (g0 * fpack_ref[0, g, 0:1, :]
              + g1 * fpack_ref[0, g, 1:2, :])             # [KL, W]

        d_of_row = jax.lax.broadcasted_iota(jnp.int32, (KL, W), 0) // C
        wv = ((d_of_row == ipack_ref[0, g, 2:3, :]) * fpack_ref[0, g, 2:3, :]
              + (d_of_row == ipack_ref[0, g, 3:4, :]) * fpack_ref[0, g, 3:4, :])
        weighted = (hz * wv).reshape(band, C, W)
        out_ref[0, g] = jnp.sum(weighted, axis=0)         # [C, W]


def warp_rows_pallas(bands_cw: jnp.ndarray, ipack: jnp.ndarray,
                     fpack: jnp.ndarray, band: int, C: int,
                     group: int = 8) -> jnp.ndarray:
    """``bands_cw`` [B, Ho, band*C, W], ``ipack`` [B, Ho, 4, W] int32
    (x0c, x1c, d0, d1), ``fpack`` [B, Ho, 4, W] f32 (wx0, wx1, wy0, wy1)
    -> out [B, Ho, C, W]."""
    B, Ho, KL, W = bands_cw.shape
    assert KL == band * C
    while Ho % group != 0:
        group //= 2
    G = max(group, 1)

    kernel = functools.partial(_kernel, G=G, band=band, C=C, W=W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, C, W), bands_cw.dtype),
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, G, 4, W), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 4, W), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, KL, W), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, C, W), lambda n, h: (n, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )(ipack.astype(jnp.int32), fpack.astype(bands_cw.dtype), bands_cw)


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
                            wx0, wx1, wy0, wy1, group: int = 8) -> jnp.ndarray:
    """Forward band warp with explicit corner weights (shared by the fwd pass
    and the custom-VJP difference passes). Returns NHWC."""
    B, H, W, C = image.shape
    bands_cw = gather_bands_cw(image, iw["ymin"], band)
    ipack = jnp.stack([iw["x0c"], iw["x1c"], iw["d0"], iw["d1"]], axis=2)
    fpack = jnp.stack([wx0, wx1, wy0, wy1], axis=2)
    out = warp_rows_pallas(bands_cw, ipack, fpack, band, C, group=group)
    return jnp.transpose(out, (0, 1, 3, 2))  # [B, Ho, W, C]


def pallas_warp_supported(image_shape) -> bool:
    """The kernel requires Wo == W and W either <= 128 or a multiple of 128
    (lane-tile decomposition); other shapes use the einsum band warp."""
    W = image_shape[2]
    return W <= _LANE or W % _LANE == 0
