"""Pallas Mei (fisheye) warp-prep kernels: norm + rays + camera scalars ->
band-warp operands.

The fisheye analogue of ``prep_kernel.py`` (round-2 VERDICT items 1/7): the
grid route materializes per-frame rotated ray fields, the [S, F, B, H, W, 2]
Mei projection grid, and the XLA index/fraction prep — all elementwise HBM
traffic around the warp kernels. These kernels map the per-scale *norm* map
(the fisheye head's depth analogue — reference ``FishEyeDecoder``,
``monodepth/networks/models/heads/monodepth2_decoder.py:355-413``) plus the
static per-camera ray field straight to the fused band-warp kernel's
operands.

Projection math matches ``models/heads/fisheye_decoder.py`` exactly: with
g = R @ ray (rays are the host-backtracked unit-less lift directions,
``ops/fisheye.backtrack_ray_map``), p = norm * g + t,

    nn = |p|;  (xh, yh, zh) = p / (nn + eps)
    a = xh / (zh + xi + eps);  b = yh / (zh + xi + eps)
    rho2 = a^2 + b^2;  fac = 1 + k1 rho2 + k2 rho2^2
    x = gamma1 a fac + u0;  y = gamma2 b fac + v0      (eps = 1e-6)

all f32 (grid-math precision mandate, BASELINE.md). The normalize /
unnormalize pair of the grid route cancels under align_corners=True and is
skipped. The backward maps pixel-space fraction cotangents to d loss/d norm
in closed form, summing the F frames in-kernel.

Scalar row layout (``warp_mei.make_mei_rows``): [N, 24] f32 with cols 0-8
the row-major rotation R = T[:3, :3], 9-11 the translation t = T[:3, 3],
12-14 (xi, k1, k2), 15-18 (gamma1, gamma2, u0, v0), rest pad.

Gradient scope: d norm only — pose/intrinsics/ray cotangents are NOT
produced; the wrapper (``ops/warp_mei.py``) dispatches here only when poses
are dataset constants (GT-pose metas).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prep_kernel import _pack_xy

_LANE = 128
_EPS = 1e-6  # fisheye_decoder._mei_project's eps


def _scalars(m_ref):
    """[1, 1, 24] SMEM block -> (R 9-list, t 3-list, cam 7-list)."""
    vals = [m_ref[0, 0, k] for k in range(19)]
    return vals[:9], vals[9:12], vals[12:19]


def _mei_pix(m_ref, n, rx, ry, rz):
    """Projected pixel coords for a [G, W] block of norms + rays.

    Returns (x, y, aux) with aux the intermediates the backward reuses."""
    R, t, (xi, k1, k2, g1, g2, u0, v0) = _scalars(m_ref)
    gx = R[0] * rx + R[1] * ry + R[2] * rz
    gy = R[3] * rx + R[4] * ry + R[5] * rz
    gz = R[6] * rx + R[7] * ry + R[8] * rz
    px = n * gx + t[0]
    py = n * gy + t[1]
    pz = n * gz + t[2]
    nn = jnp.sqrt(px * px + py * py + pz * pz)
    inv_e = 1.0 / (nn + _EPS)
    xh = px * inv_e
    yh = py * inv_e
    zh = pz * inv_e
    inv_d = 1.0 / (zh + xi + _EPS)
    a = xh * inv_d
    b = yh * inv_d
    rho2 = a * a + b * b
    fac = 1.0 + k1 * rho2 + k2 * rho2 * rho2
    x = g1 * a * fac + u0
    y = g2 * b * fac + v0
    aux = (gx, gy, gz, px, py, pz, nn, inv_e, xh, yh, zh, inv_d, a, b,
           rho2, fac, k2, g1, g2, k1)
    return x, y, aux


def _mei_prep_kernel(norm_ref, rays_ref, m_ref, iword_ref, fpack_ref,
                     ymin_ref, ws_ref, *, G, T, L, H, W, band, tile_ymin):
    """Grid (N, H // G); emits raw (even-rounded, image-row-unit) ymin —
    the wrapper scales per consumer pass (packed image vs f32 mask)."""
    del G
    n = norm_ref[0].astype(jnp.float32)
    rx = rays_ref[0, 0].astype(jnp.float32)
    ry = rays_ref[0, 1].astype(jnp.float32)
    rz = rays_ref[0, 2].astype(jnp.float32)
    x, y, _ = _mei_pix(m_ref, n, rx, ry, rz)
    _pack_xy(x, y, iword_ref, fpack_ref, ymin_ref, ws_ref, T=T, L=L, H=H,
             W=W, band=band, row_div=1, row_mul=1, tile_ymin=tile_ymin,
             tiled_out=True)


def mei_prep_pallas(norm: jnp.ndarray, rays_cf: jnp.ndarray,
                    mrows: jnp.ndarray, S: int, F: int, band: int,
                    group: int = 8, tile_ymin: bool = False):
    """``norm`` [S*B, H, W] (any float dtype), ``rays_cf`` [B, 3, H, W] f32
    (channel-leading ray field), ``mrows`` [N, 24] f32 with N = S*F*B in
    (s, f, b) order -> (iword [N, H, W] s32, fpack [N, 2, H, W] f32,
    ymin [N, H] s32 raw image rows, ws [N, H, T] s32); formats as
    :func:`prep_kernel.warp_prep_pallas`, bit 28 of iword the analytic
    in-bounds mask. Under ``tile_ymin`` the band anchor is per (row,
    output lane tile) — ymin [N, H, T] — for the per-tile windowed DMA
    consumer (``warp_kernel`` tile mode): Mei reprojections bend rows
    vertically, but the 128-lane tile-local spread is 2-5 rows
    (``scripts/fisheye_band_probe.py``), so half the band covers more."""
    SB, H, W = norm.shape
    N = mrows.shape[0]
    B = N // (S * F)
    assert SB == S * B, (norm.shape, S, F, N)
    L = W if W <= _LANE else _LANE
    T = W // L
    G = group
    while H % G != 0:
        G //= 2
    kernel = functools.partial(_mei_prep_kernel, G=G, T=T, L=L, H=H, W=W,
                               band=band, tile_ymin=tile_ymin)
    YT = T if tile_ymin else 1

    def ni(n_, h):
        # n = (s * F + f) * B + b -> norm row s * B + b
        return n_ // (F * B) * B + jax.lax.rem(n_, B), h, 0

    def ri(n_, h):
        return jax.lax.rem(n_, B), 0, h, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N, H // G),
        in_specs=[
            pl.BlockSpec((1, G, W), ni, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, G, W), ri, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 24), lambda n_, h: (n_, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, T, L), lambda n_, h: (n_, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, G, T, L), lambda n_, h: (n_, 0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, YT), lambda n_, h: (n_, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T), lambda n_, h: (n_, h, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    iword, fpack, ymin, ws = pl.pallas_call(
        kernel,
        out_shape=[
            # pre-tiled [.., T, L] shapes (see prep_kernel tiled_out): the
            # fused warp kernel consumes these VERBATIM — no XLA reshape
            # between the custom calls (the fisheye trace carried ~10.6 ms
            # of relayout copies, a large share from exactly this seam)
            jax.ShapeDtypeStruct((N, H, T, L), jnp.int32),
            jax.ShapeDtypeStruct((N, 2, H, T, L), jnp.float32),
            jax.ShapeDtypeStruct((N, H, YT), jnp.int32),
            jax.ShapeDtypeStruct((N, H, T), jnp.int32),
        ],
        grid_spec=grid_spec,
    )(norm, rays_cf.astype(jnp.float32), mrows.reshape(N, 1, 24))
    return iword, fpack, (ymin if tile_ymin else ymin.reshape(N, H)), ws


def _mei_prep_bwd_kernel(norm_ref, rays_ref, *rest, G, H, W, F):
    """Grid (S*B, H // G). Operands after norm/rays: gfx_f x F, gfy_f x F
    ([1, G, W] blocks), mrows_f x F ([1, 1, 24] SMEM), then the dnorm
    [1, G, W] f32 output."""
    del G
    gfx_refs = rest[0:F]
    gfy_refs = rest[F:2 * F]
    m_refs = rest[2 * F:3 * F]
    out_ref = rest[3 * F]
    n = norm_ref[0].astype(jnp.float32)
    rx = rays_ref[0, 0].astype(jnp.float32)
    ry = rays_ref[0, 1].astype(jnp.float32)
    rz = rays_ref[0, 2].astype(jnp.float32)
    acc = None
    for f in range(F):
        x, y, aux = _mei_pix(m_refs[f], n, rx, ry, rz)
        (gx, gy, gz, px, py, pz, nn, inv_e, xh, yh, zh, inv_d, a, b,
         rho2, fac, k2, g1, g2, k1) = aux
        # d nn/d norm = (p . g) / nn (guarded; nn > 0 whenever any ray/pose
        # is non-degenerate, and the guard matches autodiff above 1e-12)
        dnn = (px * gx + py * gy + pz * gz) / jnp.maximum(nn, 1e-12)
        dxh = (gx - xh * dnn) * inv_e
        dyh = (gy - yh * dnn) * inv_e
        dzh = (gz - zh * dnn) * inv_e
        da = (dxh - a * dzh) * inv_d
        db = (dyh - b * dzh) * inv_d
        k = k1 + 2.0 * k2 * rho2
        common = 2.0 * k * (a * da + b * db)
        dux = g1 * (fac * da + a * common)
        dvy = g2 * (fac * db + b * common)
        # border-clamp zeroing (strict in-range test) matches _chain_to_grid
        mx = ((x > 0.0) & (x < W - 1)).astype(jnp.float32)
        my = ((y > 0.0) & (y < H - 1)).astype(jnp.float32)
        gx_c = gfx_refs[f][0].astype(jnp.float32)
        gy_c = gfy_refs[f][0].astype(jnp.float32)
        term = gx_c * mx * dux + gy_c * my * dvy
        acc = term if acc is None else acc + term
    out_ref[0] = acc


def mei_prep_bwd_pallas(norm: jnp.ndarray, rays_cf: jnp.ndarray,
                        gfx: jnp.ndarray, gfy: jnp.ndarray,
                        mrows: jnp.ndarray, S: int, F: int, group: int = 8):
    """(gfx, gfy) [N, H, W] pixel-space fraction cotangents -> d norm
    [S*B, H, W] f32, summing the F frames in-kernel."""
    SB, H, W = norm.shape
    B = SB // S
    G = group
    while H % G != 0:
        G //= 2
    kernel = functools.partial(_mei_prep_bwd_kernel, G=G, H=H, W=W, F=F)

    def nmap(f):
        # output block m = s * B + b -> warp n = (s * F + f) * B + b
        def im(m, h):
            return (m // B * F + f) * B + jax.lax.rem(m, B), h, 0
        return im

    in_specs = [
        pl.BlockSpec((1, G, W), lambda m, h: (m, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, G, W),
                     lambda m, h: (jax.lax.rem(m, B), 0, h, 0),
                     memory_space=pltpu.VMEM),
    ]
    for f in range(F):
        in_specs.append(pl.BlockSpec((1, G, W), nmap(f),
                                     memory_space=pltpu.VMEM))
    for f in range(F):
        in_specs.append(pl.BlockSpec((1, G, W), nmap(f),
                                     memory_space=pltpu.VMEM))
    for f in range(F):
        fm = nmap(f)
        in_specs.append(pl.BlockSpec(
            (1, 1, 24), lambda m, h, fm=fm: (fm(m, h)[0], 0, 0),
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
    )(norm, rays_cf.astype(jnp.float32), *([gfx] * F), *([gfy] * F),
      *([mrows.reshape(-1, 1, 24)] * F))
