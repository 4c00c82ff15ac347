"""Differentiable image warping: ``grid_sample`` parity for TPU (NHWC, pure jnp).

The reference's entire self-supervision path rides on ``F.grid_sample`` with
``padding_mode='border', align_corners=True`` (``monodepth2_decoder.py:98-101``)
plus a nearest-mode variant for mask warping (``:110-116``). This module is the
gather-based XLA implementation; the Pallas fused kernel
(``fsnet_tpu.ops.pallas``) reuses the same coordinate math.

Layout: images are NHWC ``[B, H, W, C]``; grids are ``[B, Ho, Wo, 2]`` with
normalized (x, y) in [-1, 1], identical to the torch convention.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """[-1, 1] -> pixel coordinate."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Sample ``image`` [B, H, W, C] at ``grid`` [B, Ho, Wo, 2] normalized coords.

    Matches ``torch.nn.functional.grid_sample`` semantics for
    mode in {'bilinear', 'nearest'} and padding_mode in {'border', 'zeros'}.
    """
    assert mode in ("bilinear", "nearest"), mode
    assert padding_mode in ("border", "zeros"), padding_mode
    B, H, W, C = image.shape

    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if mode == "nearest":
        # torch rounds half away from zero only after unnormalize; jnp.round is
        # banker's rounding — use floor(x + 0.5) to match torch's round-to-nearest.
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        out = _gather_2d(image, iy, ix)
        if padding_mode == "zeros":
            out = out * valid[..., None].astype(out.dtype)
        return out

    # bilinear
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        vx0 = (x0 >= 0) & (x0 <= W - 1)
        vx1 = (x1 >= 0) & (x1 <= W - 1)
        vy0 = (y0 >= 0) & (y0 <= H - 1)
        vy1 = (y1 >= 0) & (y1 <= H - 1)

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    v00 = _gather_2d(image, y0c, x0c)
    v01 = _gather_2d(image, y0c, x1c)
    v10 = _gather_2d(image, y1c, x0c)
    v11 = _gather_2d(image, y1c, x1c)

    if padding_mode == "zeros":
        v00 = v00 * (vy0 & vx0)[..., None].astype(v00.dtype)
        v01 = v01 * (vy0 & vx1)[..., None].astype(v01.dtype)
        v10 = v10 * (vy1 & vx0)[..., None].astype(v10.dtype)
        v11 = v11 * (vy1 & vx1)[..., None].astype(v11.dtype)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _gather_2d(image: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather image [B, H, W, C] at integer coords iy/ix [B, Ho, Wo] -> [B, Ho, Wo, C].

    Flattens H*W and uses a single ``take_along_axis`` per corner — XLA lowers
    this to one dynamic-gather HLO that the TPU backend vectorises along C.
    """
    B, H, W, C = image.shape
    Bo, Ho, Wo = iy.shape
    flat_idx = (iy * W + ix).reshape(B, Ho * Wo, 1)  # [B, P, 1]
    flat_img = image.reshape(B, H * W, C)
    out = jnp.take_along_axis(flat_img, flat_idx, axis=1)  # [B, P, C]
    return out.reshape(B, Ho, Wo, C)
