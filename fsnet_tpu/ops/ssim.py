"""SSIM dissimilarity kernels (NHWC, pure jnp).

Reference ``monodepth/networks/utils/monodepth_utils.py``: ``SSIM:184`` (avg-pool
formulation over reflection-padded windows) and ``SSIMUncer:217`` (SSIM plus the
analytic derivative d(dissim)/dy used by the uncertainty-weighted distill loss).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


@functools.lru_cache(maxsize=None)
def _pool_matrix(n: int, kernel_size: int, padding: int) -> np.ndarray:
    """[n, n] banded matrix M with out = M @ x == reflect-pad(p) + 1D mean
    pool(k, stride 1) along an axis of size n."""
    m = np.zeros((n, n), np.float64)
    for i in range(n):
        for t in range(kernel_size):
            j = i + t - padding
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * n - 2 - j
            m[i, j] += 1.0 / kernel_size
    # built in f64 so the cast at use is correctly rounded for ANY compute
    # dtype (building in f32 bakes f32-rounded 1/k taps into f64 runs, which
    # the C2=9e-4 SSIM denominators amplify ~1000x — torch-oracle finding)
    return m


import os as _os

#: A/B toggle: implement the 3x3 stride-1 mean pool as a reflect-pad
#: shifted-adds stencil (pure elementwise, fuses into the surrounding SSIM
#: math) instead of banded-matrix MXU contractions. The matmul form burns
#: ~45 GFLOP per W-pool on what is a 3-tap stencil; the stencil form is
#: bandwidth-only. Exact to reassociation (sum*(1/k) vs per-tap 1/k).
#: Larger kernels (the k=13 similarity weight) always use the matmul form.
#: DEFAULT OFF until the full-step TPU A/B adjudicates (bench.py is the
#: only keep/revert arbiter — BASELINE.md methodology).
SSIM_STENCIL = _os.environ.get("FSNET_SSIM_STENCIL", "0") != "0"

#: Hybrid pool (k=3): H direction as a sublane-shift stencil, W direction as
#: the banded MXU matmul. Motivation: round-3 profiling showed the H einsum
#: ("bhwc,Hh->bHwc", contracting a non-minor axis) at ~2x the cost of the
#: W einsum despite 1/3 the FLOPs. DEFAULT OFF — benched 219 vs 250.7
#: imgs/s on the full step (bench.py, v5e): the H-shift reads break XLA's
#: producer fusions of the x*x / x*y moment inputs, re-materializing them
#: three times. FOURTH stencil-vs-matmul negative result on this toolchain
#: (BASELINE.md); kept for A/B on future toolchains.
SSIM_HSTENCIL = _os.environ.get("FSNET_SSIM_HSTENCIL", "0") != "0"


def _avg_pool_same(x: jnp.ndarray, kernel_size: int, padding: int) -> jnp.ndarray:
    """Reflection-pad then kernel_size x kernel_size mean pool, stride 1 (the
    reference's ``nn.ReflectionPad2d`` + ``nn.AvgPool2d(k, 1)`` pair).

    Two implementations, both MXU/TPU-conscious (depthwise convs and
    reduce_window lower to much slower VPU loops on TPU, and SSIM is on the
    training hot path): banded-matrix contractions on the MXU (default), or
    a reflect-pad shifted-adds stencil (:data:`SSIM_STENCIL`, k=3 only)."""
    B, H, W, C = x.shape
    if SSIM_STENCIL and kernel_size == 3 and padding == 1 and H > 2 and W > 2:
        acc_t = jnp.promote_types(x.dtype, jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     mode="reflect").astype(acc_t)     # f32 accumulation,
        s = xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]       # matching the matmul
        out = s[:, :, :-2] + s[:, :, 1:-1] + s[:, :, 2:]   # form's acc_t
        return (out * jnp.asarray(1.0 / kernel_size ** 2, acc_t)).astype(
            x.dtype)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)  # f32 accum for bf16,
    if SSIM_HSTENCIL and kernel_size == 3 and padding == 1 and H > 2:
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)),
                     mode="reflect").astype(acc_t)
        x = ((xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:])
             * jnp.asarray(1.0 / kernel_size, acc_t)).astype(x.dtype)
    else:
        # NOTE (round 3): two "obviously better" H-pool forms were benched
        # and REGRESSED the full step — merged-minor "Hh,bhm->bHm" on the
        # free [B, H, W*C] reshape: 221.8 vs 250.7 imgs/s; H-shift stencil:
        # 219. The trace's 2.7 ms on this line is mostly the FUSED x*x/x*y
        # moment producers, not the contraction — this einsum is already the
        # right form. Keep it; adjudicate any change with bench.py.
        mh = jnp.asarray(_pool_matrix(H, kernel_size, padding), x.dtype)
        x = jnp.einsum("bhwc,Hh->bHwc", x, mh,
                       preferred_element_type=acc_t).astype(x.dtype)
    mw = jnp.asarray(_pool_matrix(W, kernel_size, padding), x.dtype)
    return jnp.einsum("bhwc,Ww->bhWc", x, mw,
                      preferred_element_type=acc_t).astype(x.dtype)


def _avg_pool3_tiled(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 reflect-pad mean pool on the warp kernels' tiled layout
    [N, Ho, T, C, L] (W = T*L lane tiles with C between): the H stencil is a
    plain axis-1 shift; the W stencil shifts within the lane axis and stitches
    tile-boundary columns from the neighbouring tile (reflect at the ends).
    Equals :func:`_avg_pool_same`(k=3, p=1) on the NHWC-equivalent tensor."""
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)),
                 mode="reflect").astype(acc_t)
    s = xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]          # H pool

    # W neighbours across the (T, L) split
    first = s[:, :, 0:1, :, 1:2]                      # reflect: w=0 -> w=1
    left_col = jnp.concatenate([first, s[:, :, :-1, :, -1:]], axis=2)
    sl = jnp.concatenate([left_col, s[..., :-1]], axis=-1)
    last = s[:, :, -1:, :, -2:-1]                     # reflect: w=W-1 -> W-2
    right_col = jnp.concatenate([s[:, :, 1:, :, 0:1], last], axis=2)
    sr = jnp.concatenate([s[..., 1:], right_col], axis=-1)
    out = sl + s + sr
    return (out * jnp.asarray(1.0 / 9.0, acc_t)).astype(x.dtype)


def ssim_target_stats_tiled(y: jnp.ndarray):
    """Tiled-layout :func:`ssim_target_stats` (k=3, p=1)."""
    mu_y = _avg_pool3_tiled(y)
    sigma_y = jnp.maximum(_avg_pool3_tiled(y * y) - mu_y * mu_y, 0.0)
    return mu_y, sigma_y


def ssim_tiled(x: jnp.ndarray, y: jnp.ndarray, y_stats=None) -> jnp.ndarray:
    """:func:`ssim` (k=3, p=1) on the tiled [N, Ho, T, C, L] layout."""
    mu_x = _avg_pool3_tiled(x)
    if y_stats is None:
        y_stats = ssim_target_stats_tiled(y)
    mu_y, sigma_y = y_stats
    sigma_x = jnp.maximum(_avg_pool3_tiled(x * x) - mu_x * mu_x, 0.0)
    sigma_xy = _avg_pool3_tiled(x * y) - mu_x * mu_y
    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def _avg_pool_same_nchw(x: jnp.ndarray, kernel_size: int,
                        padding: int) -> jnp.ndarray:
    """:func:`_avg_pool_same` on channel-major [N, C, H, W] tensors (the
    warp kernels' ``cmajor`` output layout — a free reshape of their
    [N, C, Ho, T, L] emission). Same banded-matrix MXU form; the plane
    axes are the two minors, which is the layout XLA's photometric fusions
    were picking anyway (r5 trace)."""
    N, C, H, W = x.shape
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    mh = jnp.asarray(_pool_matrix(H, kernel_size, padding), x.dtype)
    x = jnp.einsum("bchw,Hh->bcHw", x, mh,
                   preferred_element_type=acc_t).astype(x.dtype)
    mw = jnp.asarray(_pool_matrix(W, kernel_size, padding), x.dtype)
    return jnp.einsum("bchw,Ww->bchW", x, mw,
                      preferred_element_type=acc_t).astype(x.dtype)


def ssim_target_stats_nchw(y: jnp.ndarray, kernel_size: int = 3,
                           padding: int = 1):
    """Channel-major :func:`ssim_target_stats`."""
    mu_y = _avg_pool_same_nchw(y, kernel_size, padding)
    sigma_y = jnp.maximum(
        _avg_pool_same_nchw(y * y, kernel_size, padding) - mu_y * mu_y, 0.0)
    return mu_y, sigma_y


def ssim_nchw(x: jnp.ndarray, y: jnp.ndarray, kernel_size: int = 3,
              padding: int = 1, y_stats=None) -> jnp.ndarray:
    """Channel-major :func:`ssim` (same math, [N, C, H, W] operands)."""
    mu_x = _avg_pool_same_nchw(x, kernel_size, padding)
    if y_stats is None:
        y_stats = ssim_target_stats_nchw(y, kernel_size, padding)
    mu_y, sigma_y = y_stats
    # variance clamp: see ssim()
    sigma_x = jnp.maximum(
        _avg_pool_same_nchw(x * x, kernel_size, padding) - mu_x * mu_x, 0.0)
    sigma_xy = _avg_pool_same_nchw(x * y, kernel_size, padding) - mu_x * mu_y
    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def ssim_target_stats(y: jnp.ndarray, kernel_size: int = 3,
                      padding: int = 1):
    """Precompute the target-side pooled stats (mu_y, sigma_y) of
    :func:`ssim`. When the same target is compared against many predictions
    (the S x F tiled min-reprojection loss) this removes the redundant
    re-pooling — 2 of the 5 pooled quantities per pair. Exact: broadcasting
    the pooled values is identical to pooling the broadcast target."""
    mu_y = _avg_pool_same(y, kernel_size, padding)
    sigma_y = jnp.maximum(
        _avg_pool_same(y * y, kernel_size, padding) - mu_y * mu_y, 0.0)
    return mu_y, sigma_y


def ssim(x: jnp.ndarray, y: jnp.ndarray, kernel_size: int = 3,
         padding: int = 1, y_stats=None) -> jnp.ndarray:
    """SSIM *dissimilarity* clamp((1 - SSIM)/2, 0, 1), elementwise over NHWC.

    Matches reference ``SSIM.forward`` (``monodepth_utils.py:199-215``).
    ``y_stats``: optional precomputed :func:`ssim_target_stats` for ``y``
    (any shape broadcastable against x's pooled stats).
    """
    mu_x = _avg_pool_same(x, kernel_size, padding)
    if y_stats is None:
        y_stats = ssim_target_stats(y, kernel_size, padding)
    mu_y, sigma_y = y_stats

    # clamp the variance estimates at >= 0: mathematically a no-op (true
    # variances are non-negative; f32/f64 negatives are ~1e-7 cancellation
    # noise, far below C2), but under bf16 compute the E[x^2] - mu^2
    # cancellation error reaches ~1% of E[x^2] on low-variance (flat-texture)
    # windows, driving sigma_x + sigma_y to exactly -C2 and the denominator
    # to 0 -> 0/0 NaN (observed at step 0 of the convergence probe on TPU).
    # The clamp bounds ssim_d >= C1*C2 > 0 in every dtype.
    sigma_x = jnp.maximum(
        _avg_pool_same(x * x, kernel_size, padding) - mu_x * mu_x, 0.0)
    sigma_xy = _avg_pool_same(x * y, kernel_size, padding) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def ssim_uncer(x0: jnp.ndarray, y0: jnp.ndarray, kernel_size: int = 3,
               padding: int = 1):
    """SSIM dissimilarity plus its analytic derivative w.r.t. y (reference
    ``SSIMUncer.forward``, ``monodepth_utils.py:220-249``). Returns (out, dout_dy)."""
    mu_x = _avg_pool_same(x0, kernel_size, padding)
    mu_y = _avg_pool_same(y0, kernel_size, padding)

    # variance clamp: see ssim()
    sigma_x = jnp.maximum(
        _avg_pool_same(x0 * x0, kernel_size, padding) - mu_x * mu_x, 0.0)
    sigma_y = jnp.maximum(
        _avg_pool_same(y0 * y0, kernel_size, padding) - mu_y * mu_y, 0.0)
    sigma_xy = _avg_pool_same(x0 * y0, kernel_size, padding) - mu_x * mu_y

    N = kernel_size ** 2
    dsigma_y_dy = 2.0 / N * y0 - 2.0 / N * mu_y
    dsigma_xy_dy = 1.0 / N * x0 - 1.0 / N * mu_x

    Id = mu_x ** 2 + mu_y ** 2 + _C1
    I = (2.0 * mu_x * mu_y + _C1) / Id  # noqa: E741 - matches reference naming

    Cs_n = 2.0 * sigma_xy + _C2
    Cs_d = sigma_x + sigma_y + _C2
    Cs = Cs_n / Cs_d

    dIdy = (2.0 * mu_x * (mu_x ** 2 - mu_y ** 2)) / (Id ** 2)
    dCsdy = (Cs_d * (2.0 * dsigma_xy_dy) - Cs_n * dsigma_y_dy) / (Cs_d ** 2)

    out = jnp.clip((1.0 - I * Cs) / 2.0, 0.0, 1.0)
    dout_dy = -(I * dCsdy + Cs * dIdy) / 2.0
    return out, dout_dy
