"""TPU-fast grid_sample: band row-gather + two-hot MXU matmul.

Why: XLA lowers per-pixel gathers (the naive ``grid_sample`` formulation,
``ops/warp.py``) to ~626 ms for the training step's 96 warps on v5e, while
full-row gathers run at ~5 ms and one-hot contractions hit the MXU at near
peak (measured in ``scripts/tpu_gather_bench.py``). This module reformulates
bilinear warping exactly (up to a per-row vertical band bound) as:

1. **Band gather**: for each output row, gather a contiguous band of source
   rows ``[ymin, ymin+BAND)`` covering that row's vertical sample range —
   a fast full-row gather.
2. **Horizontal two-hot matmul**: contract the band against a two-hot
   (bilinear x-weight) matrix over source columns. XLA fuses the iota-compare
   weight generation into the matmul operand, so the [W, Wo] weights are
   never materialized.
3. **Vertical two-hot select**: a cheap reduction over the band axis with
   bilinear y-weights.

A ``jax.custom_vjp`` computes the grid gradient with two more
difference-weight matmuls (d out/d fx = V(x0+1) - V(x0), d out/d fy =
H(y0+1) - H(y0)); the naive autodiff would materialize the ~30 GB one-hot
cotangent and OOM. The sampled image is treated as a constant (its cotangent
is zero) — correct for the photometric loss where images are inputs; pass
``impl='gather'`` if image gradients are needed.

Exactness: identical to ``grid_sample`` (border/zeros padding,
align_corners=True) whenever each output row's vertical sample spread fits in
``band`` rows; rows exceeding the band clamp to its edge. Depth-reprojection
warps of driving scenes are near-epipolar, so spreads are small.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

import os as _os

from .warp import _unnormalize, grid_sample as grid_sample_exact

#: Fused fwd+vjp Pallas path (1 = on): the VJP forward rule emits the two
#: difference-pass values (va, vb) from the SAME kernel pass as the output,
#: so the backward is one XLA contraction instead of a second gather kernel
#: (with its own DMAs and index prep). Eval/no-grad calls still run the lean
#: forward-only kernel (the primal function, not the fwd rule).
FUSED_VJP = _os.environ.get("FSNET_FUSED_VJP", "1") != "0"

#: Keep the fused kernel's (va, vb) difference tensors in their native
#: tiled [B, Ho, T, C, L] layout instead of relayouting both to NHWC: the
#: backward contraction transposes the single cotangent ``g`` instead —
#: one relayout pass instead of two (~440 MB bf16 less traffic per step at
#: the KITTI recipe). Numerically identical. ``FSNET_TILED_VJP=0`` restores
#: NHWC residuals.
TILED_VJP = _os.environ.get("FSNET_TILED_VJP", "1") != "0"


def _tile_nhwc(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """[B, Ho, W, C] -> the kernels' tiled [B, Ho, T, C, L] layout."""
    B, Ho, W, C = x.shape
    return jnp.moveaxis(x.reshape(B, Ho, W // L, L, C), 4, 3)


def _indices_and_weights(image_shape, grid, mode, padding_mode, align_corners,
                         band):
    """Shared coordinate math: integer corner indices + bilinear weights +
    band layout. Returns a dict of [B, Ho, Wo] tensors plus ymin [B, Ho]."""
    B, H, W, C = image_shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    if mode == "nearest":
        x0f = jnp.floor(x + 0.5)
        y0f = jnp.floor(y + 0.5)
        fx = jnp.zeros_like(x)
        fy = jnp.zeros_like(y)
        wx0 = jnp.ones_like(x)
        wx1 = jnp.zeros_like(x)
        wy0 = jnp.ones_like(y)
        wy1 = jnp.zeros_like(y)
    else:
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = x - x0f
        fy = y - y0f
        wx0, wx1 = 1.0 - fx, fx
        wy0, wy1 = 1.0 - fy, fy

    vx0 = (x0f >= 0) & (x0f <= W - 1)
    vx1 = (x0f + 1 >= 0) & (x0f + 1 <= W - 1)
    vy0 = (y0f >= 0) & (y0f <= H - 1)
    vy1 = (y0f + 1 >= 0) & (y0f + 1 <= H - 1)
    if padding_mode == "zeros":
        # zero each corner's weight independently (torch zeros semantics)
        wx0 = jnp.where(vx0, wx0, 0.0)
        wx1 = jnp.where(vx1, wx1, 0.0)
        wy0 = jnp.where(vy0, wy0, 0.0)
        wy1 = jnp.where(vy1, wy1, 0.0)

    x0c = jnp.clip(x0f, 0, W - 1).astype(jnp.int32)
    x1c = jnp.clip(x0f + 1, 0, W - 1).astype(jnp.int32)
    y0c = jnp.clip(y0f, 0, H - 1).astype(jnp.int32)
    y1c = jnp.clip(y0f + 1, 0, H - 1).astype(jnp.int32)

    ymin = jnp.clip(jnp.min(y0c, axis=2), 0, max(H - band, 0))  # [B, Ho]
    # round the band start down to even so pairs of adjacent rows can pack
    # into one f32 word on the bf16 Pallas path; costs <=1 row of coverage
    ymin = ymin - (ymin % 2)
    d0 = jnp.clip(y0c - ymin[:, :, None], 0, band - 1)
    d1 = jnp.clip(y1c - ymin[:, :, None], 0, band - 1)

    # fx/fy: RAW bilinear fractions (no zeros-padding fold) — the packed-
    # index Pallas path ships only these and reconstructs w*/m* in-kernel
    return dict(x0c=x0c, x1c=x1c, d0=d0, d1=d1, wx0=wx0, wx1=wx1, wy0=wy0,
                wy1=wy1, vx0=vx0, vx1=vx1, vy0=vy0, vy1=vy1, ymin=ymin,
                fx=fx, fy=fy)


def _gather_bands(image, ymin, band):
    """[B, H, W, C] + per-output-row band start -> [B, Ho, band, W, C]."""
    B, H, W, C = image.shape
    Ho = ymin.shape[1]
    band_idx = ymin[:, :, None] + jnp.arange(band)[None, None, :]
    flat_rows = image.reshape(B, H, W * C)
    return jnp.take_along_axis(
        flat_rows, band_idx.reshape(B, Ho * band, 1), axis=1,
    ).reshape(B, Ho, band, W, C)


def _warp_core(bands_w, iw, wx0, wx1, wy0, wy1, band, C, Wo):
    """bands_w [B, Ho, W, band*C] -> out [B, Ho, Wo, C] with the given
    horizontal/vertical corner weights.

    Structured so each contraction has a PURE ``jax.nn.one_hot`` operand with
    classes on its last axis — the layout XLA recognizes and lowers at
    gather-class speed (measured ~10x faster than composite two-hot operands,
    ``scripts/tpu_gather_bench.py`` v6). The bilinear fractions factor out of
    the contraction because each one-hot selects a single column.
    """
    dtype = bands_w.dtype
    B, Ho, W, _ = bands_w.shape

    oh0 = jax.nn.one_hot(iw["x0c"], W, dtype=dtype)   # [B, Ho, Wo, W]
    oh1 = jax.nn.one_hot(iw["x1c"], W, dtype=dtype)
    g0 = jnp.einsum("bhok,bhkm->bhom", oh0, bands_w,
                    preferred_element_type=dtype)     # [B, Ho, Wo, band*C]
    g1 = jnp.einsum("bhok,bhkm->bhom", oh1, bands_w,
                    preferred_element_type=dtype)
    hz = (g0 * wx0[..., None].astype(dtype)
          + g1 * wx1[..., None].astype(dtype))
    hz = hz.reshape(B, Ho, Wo, band, C)

    s0 = jax.nn.one_hot(iw["d0"], band, dtype=dtype)  # [B, Ho, Wo, band]
    s1 = jax.nn.one_hot(iw["d1"], band, dtype=dtype)
    wv = (s0 * wy0[..., None].astype(dtype)
          + s1 * wy1[..., None].astype(dtype))
    return jnp.einsum("bhod,bhodc->bhoc", wv, hz,
                      preferred_element_type=dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _grid_sample_band(image, grid, mode, padding_mode, align_corners, band,
                      image_grad):
    # Primal (eval / no-grad) path: the lean forward-only kernel. Under
    # differentiation JAX runs the _fwd rule instead, which may take the
    # fused fwd+vjp kernel.
    iw = _indices_and_weights(image.shape, grid, mode, padding_mode,
                              align_corners, band)
    return _warp_dispatch(image, iw, band, iw["wx0"], iw["wx1"], iw["wy0"],
                          iw["wy1"], grid.shape, image.shape[3],
                          grid.shape[2])


def _bands_w_of(image, iw, band):
    """[B, Ho, W, band*C] band tensor in the one-hot-contraction layout."""
    B, H, W, C = image.shape
    bands = _gather_bands(image, iw["ymin"], band)   # [B, Ho, band, W, C]
    Ho = bands.shape[1]
    return bands.transpose(0, 1, 3, 2, 4).reshape(B, Ho, W, band * C)


def _use_pallas(image_shape, grid_shape) -> bool:
    """Route through the Pallas dynamic-gather kernel on TPU backends when the
    shape constraints hold (Wo == W, lane-tileable W); einsum elsewhere."""
    from .pallas.warp_kernel import pallas_warp_supported

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return (grid_shape[2] == image_shape[2]
            and grid_shape[0] % image_shape[0] == 0
            and pallas_warp_supported(image_shape))


def scale_batched_warp_is_fused(image_shape, grid_shape,
                                impl: str = "band") -> bool:
    """True when warping a grid batch that is a multiple of the image batch
    (e.g. S scales x F frames against F*B images) stays O(image batch) in
    memory: only the Pallas fused-DMA path indexes sources modulo the image
    batch without tiling them or materializing per-grid band tensors. The
    einsum/gather fallbacks (CPU, FSNET_DMA_GATHER=0, impl='gather', or
    unsupported shapes) tile the sources to the grid batch — callers should
    chunk over the extra factor there (see MonoDepth2Decoder._warp_all)."""
    from .pallas.warp_kernel import DMA_GATHER

    return (impl == "band" and DMA_GATHER
            and _use_pallas(image_shape, grid_shape))


def _match_batch(image: jnp.ndarray, n: int) -> jnp.ndarray:
    """Tile the image batch up to the grid batch (einsum/gather fallbacks;
    the Pallas kernels index sources modulo the image batch instead)."""
    if image.shape[0] == n:
        return image
    assert n % image.shape[0] == 0, (image.shape, n)
    return jnp.tile(image, (n // image.shape[0], 1, 1, 1))


def _warp_dispatch(image, iw, band, wx0, wx1, wy0, wy1, grid_shape, C, Wo):
    """One warp pass with explicit corner weights, via Pallas or einsum."""
    if _use_pallas(image.shape, grid_shape):
        from .pallas.warp_kernel import grid_sample_band_pallas

        # the Mosaic gather only supports f32 words: bf16 images pack two
        # band rows per word, other dtypes are cast (inside the wrapper)
        out = grid_sample_band_pallas(image, iw, band, wx0, wx1, wy0, wy1)
        return out.astype(image.dtype)
    image = _match_batch(image, grid_shape[0])
    bands_w = _bands_w_of(image, iw, band)
    return _warp_core(bands_w, iw, wx0, wx1, wy0, wy1, band, C, Wo)


def _padding_masks(iw, padding_mode, dtype):
    """Corner validity masks (zeros padding) or all-ones (border)."""
    one = jnp.ones_like(iw["wx0"], dtype=dtype)
    if padding_mode == "zeros":
        return (iw["vx0"].astype(dtype), iw["vx1"].astype(dtype),
                iw["vy0"].astype(dtype), iw["vy1"].astype(dtype))
    return one, one, one, one


def _fwd(image, grid, mode, padding_mode, align_corners, band,
         image_grad=False):
    B, H, W, C = image.shape
    Wo = grid.shape[2]
    iw = _indices_and_weights(image.shape, grid, mode, padding_mode,
                              align_corners, band)
    if (FUSED_VJP and mode == "bilinear" and not image_grad
            and _use_pallas(image.shape, grid.shape)):
        from .pallas.warp_kernel import grid_sample_band_pallas_fused

        mx0, mx1, my0, my1 = _padding_masks(iw, padding_mode, jnp.float32)
        out, va, vb = grid_sample_band_pallas_fused(
            image, iw, band, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"],
            mx0, mx1, my0, my1, border=padding_mode == "border",
            tiled_vjp=TILED_VJP)
        return out.astype(image.dtype), (image, grid,
                                         va.astype(image.dtype),
                                         vb.astype(image.dtype))
    out = _warp_dispatch(image, iw, band, iw["wx0"], iw["wx1"], iw["wy0"],
                         iw["wy1"], grid.shape, C, Wo)
    return out, (image, grid, None, None)


def _bwd(mode, padding_mode, align_corners, band, image_grad, residuals, g):
    """Grid cotangent via difference-weight contractions. The image cotangent
    is computed (transposed one-hot contractions + band row-scatter) only when
    ``image_grad`` is set; the photometric loss treats images as constants."""
    image, grid, va, vb = residuals
    B, H, W, C = image.shape
    Ho, Wo = grid.shape[1:3]

    if va is not None:
        # fused path: the forward kernel already emitted both difference
        # passes; the backward is one elementwise contraction.
        if va.ndim == 5:
            # tiled residuals [B, Ho, T, C, L] (TILED_VJP): transpose the
            # single cotangent instead of both difference tensors; the
            # channel-reduced result reshapes back to [B, Ho, W] for free
            g_t = _tile_nhwc(g, va.shape[-1])
            gfx = jnp.sum(g_t * va, axis=3).reshape(g.shape[:3])
            gfy = jnp.sum(g_t * vb, axis=3).reshape(g.shape[:3])
        else:
            gfx = jnp.sum(g * va, axis=-1)
            gfy = jnp.sum(g * vb, axis=-1)
        return (jnp.zeros_like(image),
                _chain_to_grid(grid, gfx, gfy, H, W, padding_mode,
                               align_corners, g.dtype))

    iw = _indices_and_weights(image.shape, grid, mode, padding_mode,
                              align_corners, band)
    dtype = g.dtype

    def image_cotangent():
        s0 = jax.nn.one_hot(iw["d0"], band, dtype=dtype)
        s1 = jax.nn.one_hot(iw["d1"], band, dtype=dtype)
        wv = (s0 * iw["wy0"][..., None].astype(dtype)
              + s1 * iw["wy1"][..., None].astype(dtype))  # [B, Ho, Wo, band]
        dhz = (wv[..., :, None] * g[..., None, :]).reshape(
            B, Ho, Wo, band * C)                          # [B, Ho, Wo, band*C]
        oh0 = jax.nn.one_hot(iw["x0c"], W, dtype=dtype)
        oh1 = jax.nn.one_hot(iw["x1c"], W, dtype=dtype)
        dbands_w = (
            jnp.einsum("bhok,bhom->bhkm", oh0,
                       dhz * iw["wx0"][..., None].astype(dtype))
            + jnp.einsum("bhok,bhom->bhkm", oh1,
                         dhz * iw["wx1"][..., None].astype(dtype)))
        dbands = dbands_w.reshape(B, Ho, W, band, C).transpose(0, 1, 3, 2, 4)
        band_idx = (iw["ymin"][:, :, None]
                    + jnp.arange(band)[None, None, :]).reshape(B, Ho * band)
        flat = jnp.zeros((B, H, W * C), dtype)
        flat = flat.at[
            jnp.arange(B)[:, None], band_idx].add(
                dbands.reshape(B, Ho * band, W * C))
        return flat.reshape(B, H, W, C)

    if image_grad:
        assert grid.shape[0] == image.shape[0], (
            "image_grad unsupported with scale-batched grids")
        dimage = image_cotangent()
    else:
        dimage = jnp.zeros_like(image)

    if mode == "nearest":
        return dimage.astype(image.dtype), jnp.zeros_like(grid)

    one = jnp.ones_like(iw["wx0"])
    if padding_mode == "zeros":
        mx0 = iw["vx0"].astype(dtype)
        mx1 = iw["vx1"].astype(dtype)
        my0 = iw["vy0"].astype(dtype)
        my1 = iw["vy1"].astype(dtype)
    else:
        mx0 = mx1 = my0 = my1 = one

    if _use_pallas(image.shape, grid.shape):
        from .pallas.warp_kernel import grid_sample_band_pallas_bwd

        # fused kernel: both difference passes share the corner gathers and
        # the channel reduction against g folds in (one pass, two outputs)
        gfx, gfy = grid_sample_band_pallas_bwd(
            image, iw, band,
            -mx0, mx1, iw["wy0"], iw["wy1"],       # pass a: d out / d fx
            iw["wx0"], iw["wx1"], -my0, my1,       # pass b: d out / d fy
            g)
        gfx = gfx.astype(dtype)
        gfy = gfy.astype(dtype)
    else:
        # d out / d fx = V(x1) - V(x0) (per-corner-validity aware)
        dVdfx = _warp_dispatch(image, iw, band, -mx0, mx1, iw["wy0"],
                               iw["wy1"], grid.shape, C, Wo)
        # d out / d fy = H(y1) - H(y0)
        dVdfy = _warp_dispatch(image, iw, band, iw["wx0"], iw["wx1"], -my0,
                               my1, grid.shape, C, Wo)
        gfx = jnp.sum(g * dVdfx, axis=-1)
        gfy = jnp.sum(g * dVdfy, axis=-1)


    return (dimage.astype(image.dtype),
            _chain_to_grid(grid, gfx, gfy, H, W, padding_mode, align_corners,
                           dtype))


def _chain_to_grid(grid, gfx, gfy, H, W, padding_mode, align_corners, dtype):
    """Chain pixel-space (gfx, gfy) to normalized grid coords, applying the
    border-clamp zeroing. Cotangents match the primal grid dtype
    (mixed-precision: out may be bf16 while grid/image are f32)."""
    if align_corners:
        sx = (W - 1) / 2.0
        sy = (H - 1) / 2.0
    else:
        sx = W / 2.0
        sy = H / 2.0
    if padding_mode == "border":
        x = _unnormalize(grid[..., 0], W, align_corners)
        y = _unnormalize(grid[..., 1], H, align_corners)
        gfx = jnp.where((x > 0) & (x < W - 1), gfx, 0.0)
        gfy = jnp.where((y > 0) & (y < H - 1), gfy, 0.0)
    return jnp.stack([gfx * sx, gfy * sy], axis=-1).astype(grid.dtype)


_grid_sample_band.defvjp(_fwd, _bwd)


def grid_sample_band(image, grid, mode="bilinear", padding_mode="border",
                     align_corners=True, band=16, image_grad=False):
    """Drop-in for :func:`fsnet_tpu.ops.warp.grid_sample` (NHWC).

    ``band`` bounds the per-output-row vertical sample spread (source rows).
    """
    assert mode in ("bilinear", "nearest"), mode
    assert padding_mode in ("border", "zeros"), padding_mode
    H = image.shape[1]
    return _grid_sample_band(image, grid, mode, padding_mode, align_corners,
                             min(band, H), image_grad)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_band_tiled(image, grid, padding_mode, band):
    iw = _indices_and_weights(image.shape, grid, "bilinear", padding_mode,
                              True, band)
    from .pallas.warp_kernel import grid_sample_band_pallas

    return grid_sample_band_pallas(image, iw, band, iw["wx0"], iw["wx1"],
                                   iw["wy0"], iw["wy1"],
                                   tiled_out=True).astype(image.dtype)


def _fwd_tiled(image, grid, padding_mode, band):
    from .pallas.warp_kernel import grid_sample_band_pallas_fused

    iw = _indices_and_weights(image.shape, grid, "bilinear", padding_mode,
                              True, band)
    mx0, mx1, my0, my1 = _padding_masks(iw, padding_mode, jnp.float32)
    out, va, vb = grid_sample_band_pallas_fused(
        image, iw, band, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"],
        mx0, mx1, my0, my1, border=padding_mode == "border",
        tiled_vjp="all")
    return out.astype(image.dtype), (image, grid, va.astype(image.dtype),
                                     vb.astype(image.dtype))


def _bwd_tiled(padding_mode, band, residuals, g):
    image, grid, va, vb = residuals
    H, W = image.shape[1], image.shape[2]
    B, Ho = grid.shape[0], grid.shape[1]
    gfx = jnp.sum(g * va, axis=3).reshape(B, Ho, W)
    gfy = jnp.sum(g * vb, axis=3).reshape(B, Ho, W)
    return (jnp.zeros_like(image),
            _chain_to_grid(grid, gfx, gfy, H, W, padding_mode, True,
                           g.dtype))


_grid_sample_band_tiled.defvjp(_fwd_tiled, _bwd_tiled)


def grid_sample_band_tiled(image, grid, padding_mode="border", band=8):
    """Photometric warp that returns the Pallas kernels' native tiled layout
    ``[B, Ho, W//L, C, L]`` (bilinear, align_corners=True, image treated as
    constant), skipping the NHWC relayout of (out, va, vb) entirely. Callers
    consume the tiled layout directly (``ops.ssim.ssim_tiled``); the
    channel-reduced loss reshapes back to [B, Ho, W] for free. Only valid
    when :func:`scale_batched_warp_is_fused` holds."""
    assert _use_pallas(image.shape, grid.shape), "tiled warp needs Pallas"
    return _grid_sample_band_tiled(image, grid, padding_mode,
                                   min(band, image.shape[1]))


def grid_sample(image, grid, mode="bilinear", padding_mode="border",
                align_corners=True, impl="band", band=16, image_grad=False):
    """Dispatcher: ``impl='band'`` (TPU-fast, default; image treated as
    constant under autodiff) or ``impl='gather'`` (exact reference
    formulation, any warp, full gradients)."""
    if impl == "gather":
        return grid_sample_exact(_match_batch(image, grid.shape[0]), grid,
                                 mode=mode, padding_mode=padding_mode,
                                 align_corners=align_corners)
    return grid_sample_band(image, grid, mode=mode, padding_mode=padding_mode,
                            align_corners=align_corners, band=band,
                            image_grad=image_grad)
