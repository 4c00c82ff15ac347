"""Fused photometric-loss kernels: warped prediction + target -> per-pixel
0.85*SSIM + 0.15*L1 in one pass, with a closed-form VJP pass.

Round-2 VERDICT item 1: after the warp kernels, ~9 ms of the training step
is SSIM/L1 assembly — banded-matmul pools (the H einsum contracts a
non-minor axis at ~2x the W einsum's cost), x*x / x*y moment producers that
XLA re-materializes per pooled quantity, pooled intermediates written and
re-read from HBM, and the mirrored backward. The XLA-side tiled-loss
attempt failed on boundary stitching (85 vs 53 ms, BASELINE.md); these
kernels do the stitching where it is free — inside the block:

    forward:  xpad [N, Hp, T, C, L] (reflect-2-row-padded tiled preds),
              ypad [B, Hp, T, C, L] (same for the target; y is indexed
              n mod B), target stats (mu_y, sigma_y) [B, Ho, T, C, L] ->
              loss [N, Ho, T, L] = 0.85 * mean_c ssim_d + 0.15 * mean_c |d|
    backward: + gpad [N, Ho+2, T, L] zero-padded cotangent ->
              dx [N, Ho, T, C, L], via the pooled-adjoint identity
              dL/dx = P^T(a_u) + 2x . P^T(a_v) + y . P^T(a_w) + L1 term
              (a_* the pointwise SSIM partials w.r.t. P(x), P(x^2), P(xy)).

The 3x3 reflect mean pool P factors as an H-direction 3-row sum (sublane
shifts over the DMA'd row window — free) times a W-direction banded [L, L]
matmul per lane tile with rank-1 cross-tile/edge matrices (the conv
kernel's block-Toeplitz trick at P=L: no lane rolls, no gathers, 1/5 the
FLOPs of the XLA [W, W] contraction). All pooling accumulates f32
regardless of the storage dtype (the bf16 inter-stage cast of the XLA path
disappears).

Reference semantics: ``compute_reprojection_loss``
(``monodepth/networks/models/heads/monodepth2_decoder.py:118-128``) with
``SSIM`` (``monodepth/networks/utils/monodepth_utils.py:184-215``),
including the variance clamp (BASELINE.md bf16 NaN production bug) and the
precomputed target stats of the S x F tiled loss.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2

#: Scoped-VMEM ceiling handed to Mosaic. The default 16 MB limit rejected
#: the backward at the flagship KITTI shape (bf16[96, 196, 5, 4, 128]:
#: 16.74 MB demanded — BENCH_r03 rc=1); v5e has 128 MB of VMEM and the
#: photo kernels run alone in their XLA region, so a 64 MB scope is safe.
_VMEM_LIMIT = 64 * 1024 * 1024
#: Target working-set budget for :func:`_group` — below ``_VMEM_LIMIT``
#: with headroom for Mosaic's own padding/alignment slop.
_VMEM_BUDGET = 44 * 1024 * 1024

#: W-pool implementation: 'roll' = lane-rotate 3-tap stencil on the VPU
#: (exact f32, ~L/3 x fewer FLOPs), 'mm' = dense banded [L, L] matmuls on
#: the MXU (the original form, kept for A/B).
POOL_IMPL = _os.environ.get("FSNET_PHOTO_POOL", "roll")

#: Row-group override for A/B tuning (0 = use the callers' default).
GROUP_OVERRIDE = int(_os.environ.get("FSNET_PHOTO_GROUP", "0"))


def _mm(x2d, wmat):
    # HIGHEST: the MXU's default single-pass bf16 multiply rounds the 1/9
    # taps and the f32 operands (~7e-3 abs loss error measured on v5e);
    # these banded [*, L] x [L, L] matmuls are a small slice of the kernel
    # so the 3-pass exact-f32 mode is cheap
    return jax.lax.dot_general(
        x2d, wmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _wmats(L, transpose: bool):
    """The W-direction pool matrices ([L, L] f32, taps 1/9 so the H stage
    can be an unnormalized 3-row sum): banded main matrix MA (symmetric),
    in-tile reflect-edge additions Le/Re, cross-tile single-tap ML/MR.
    ``transpose``: the adjoint P_w^T (edge taps transposed; ML/MR swap is
    handled by the caller's neighbor indexing)."""
    s = 1.0 / 9.0
    ii = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)

    def m(cond):
        return jnp.where(cond, s, 0.0).astype(jnp.float32)

    MA = m(jnp.abs(ii - jj) <= 1)
    if transpose:
        Le = m((ii == 0) & (jj == 1))
        Re = m((ii == L - 1) & (jj == L - 2))
    else:
        Le = m((ii == 1) & (jj == 0))
        Re = m((ii == L - 2) & (jj == L - 1))
    ML = m((ii == L - 1) & (jj == 0))   # prev tile's last col -> out col 0
    MR = m((ii == 0) & (jj == L - 1))   # next tile's first col -> out col L-1
    return MA, Le, Re, ML, MR


def _wpool_roll(hs, T, L, transpose: bool = False):
    """Lane-rotate form of :func:`_wpool`: the 3-tap W stencil as two
    single-lane rotates + iota-masked boundary columns on the VPU. Exact
    f32 (no MXU pass), and ~L/3 x fewer FLOPs than the dense [L, L]
    banded matmul it replaces (measured: the matmul form at the exact-f32
    precision the loss needs was a net step REGRESSION, BASELINE.md r3)."""
    s = jnp.float32(1.0 / 9.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 3)
    left = pltpu.roll(hs, shift=1, axis=3)    # [.., l] <- hs[.., l-1] (wrap)
    right = pltpu.roll(hs, shift=L - 1, axis=3)  # [.., l] <- hs[.., l+1]
    first = hs[..., 0:1]                       # [R, T, C, 1]
    last = hs[..., L - 1:L]
    if transpose:
        # adjoint boundary: zero outside the image
        edge_l = jnp.zeros_like(last[:, 0:1])
        edge_r = jnp.zeros_like(first[:, 0:1])
    else:
        # reflect-101: global col -1 -> col 1, col W -> col W-2
        edge_l = hs[:, 0:1, :, 1:2]
        edge_r = hs[:, T - 1:T, :, L - 2:L - 1]
    prev_last = jnp.concatenate([edge_l, last[:, :T - 1]], axis=1)
    next_first = jnp.concatenate([first[:, 1:], edge_r], axis=1)
    left = jnp.where(lane == 0, prev_last, left)
    right = jnp.where(lane == L - 1, next_first, right)
    out = (left + hs + right) * s
    if transpose:
        # P^T reflect extras: out[gcol 1] += x[gcol 0], out[W-2] += x[W-1]
        tidx = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
        out = out + jnp.where((tidx == 0) & (lane == 1), first[:, 0:1] * s,
                              0.0)
        out = out + jnp.where((tidx == T - 1) & (lane == L - 2),
                              last[:, T - 1:T] * s, 0.0)
    return out


def _wpool(hs, T, L, transpose: bool = False):
    """W-direction pooled [R, T, C, L] f32 from H-summed ``hs`` (same
    shape). Forward: reflect-edge 3-tap mean along W (x 1/9 fold of the H
    sum). Transpose: the exact adjoint (cross-tile roles swapped)."""
    if POOL_IMPL == "roll":
        return _wpool_roll(hs, T, L, transpose)
    R, _, C, _ = hs.shape
    # cross-tile taps: ML^T = MR AND the neighbor direction flips too, so
    # the adjoint uses the SAME ML/MR placement as the forward
    MA, Le, Re, ML, MR = _wmats(L, transpose)
    outs = []
    for t in range(T):
        mat = MA
        if t == 0:
            mat = mat + Le
        if t == T - 1:
            mat = mat + Re
        acc = _mm(hs[:, t].reshape(R * C, L), mat)
        if t > 0:
            acc = acc + _mm(hs[:, t - 1].reshape(R * C, L), ML)
        if t < T - 1:
            acc = acc + _mm(hs[:, t + 1].reshape(R * C, L), MR)
        outs.append(acc.reshape(R, C, L))
    return jnp.stack(outs, axis=1)


def _hsum(X, R):
    """Unnormalized 3-row vertical sums: X [R+2, T, C, L] -> [R, T, C, L]
    (the reflect padding already lives in the padded source rows)."""
    return X[0:R] + X[1:R + 1] + X[2:R + 2]


def _multi_dma(streams, *, G):
    """Double-buffered multi-stream row-window fetch over a sequential
    (N, Ho/G) grid. ``streams``: list of (hbm_ref, scr, sem, idx_fn, off,
    win) where ``idx_fn(n) -> batch index`` and the fetched window is
    rows [h*G + off, h*G + off + win) of the (pre-padded) source. Returns
    the ready slot."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    blk = n * nh + h
    nblk = pl.num_programs(0) * nh
    slot = jax.lax.rem(blk, 2)

    def dma(slot_, n_, h_, ref, scr, sem, idx_fn, off, win):
        return pltpu.make_async_copy(
            ref.at[idx_fn(n_), pl.ds(h_ * G + off, win)],
            scr.at[slot_], sem.at[slot_])

    @pl.when(blk == 0)
    def _():
        for st in streams:
            dma(slot, n, h, *st).start()

    @pl.when(blk + 1 < nblk)
    def _():
        nxt = blk + 1
        for st in streams:
            dma(1 - slot, nxt // nh, jax.lax.rem(nxt, nh), *st).start()

    for st in streams:
        dma(slot, n, h, *st).wait()
    return slot


def _pools_x(X, Y, R, T, L):
    """Pooled mu_x, P(x^2), P(xy) for R out-rows from (R+2)-row f32
    windows."""
    u = _wpool(_hsum(X, R), T, L)
    v = _wpool(_hsum(X * X, R), T, L)
    w = _wpool(_hsum(X * Y, R), T, L)
    return u, v, w


def _fwd_kernel(xpad_ref, ypad_ref, muy_ref, sy_ref, out_ref,
                scr_x, sem_x, scr_y, sem_y, *, G, T, C, L, B, sw, Cn):
    slot = _multi_dma(
        [(xpad_ref, scr_x, sem_x, lambda n_: n_, 1, G + 2),
         (ypad_ref, scr_y, sem_y, lambda n_: jax.lax.rem(n_, B), 1, G + 2)],
        G=G)
    X = scr_x[slot].astype(jnp.float32)          # [G+2, T, C, L]
    Y = scr_y[slot].astype(jnp.float32)
    u, v, w = _pools_x(X, Y, G, T, L)
    muy = muy_ref[0].astype(jnp.float32)         # [G, T, C, L]
    sy = sy_ref[0].astype(jnp.float32)

    sx = jnp.maximum(v - u * u, 0.0)
    sxy = w - u * muy
    n = (2.0 * u * muy + _C1) * (2.0 * sxy + _C2)
    d = (u * u + muy * muy + _C1) * (sx + sy + _C2)
    ssim_d = jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)

    xc = X[1:G + 1]
    yc = Y[1:G + 1]
    l1 = jnp.abs(xc - yc)
    # sum over (possibly zero-padded) channels, normalize by the true count
    # Cn: padded channels are exactly neutral (x = y = 0 -> ssim r = 1,
    # dissim 0; |x - y| = 0)
    loss = jnp.sum(sw * ssim_d + (1.0 - sw) * l1, axis=2) / Cn  # [G, T, L]
    out_ref[0] = loss.astype(out_ref.dtype)


def _bwd_kernel(xpad_ref, ypad_ref, gpad_ref, dx_ref,
                scr_x, sem_x, scr_y, sem_y, scr_g, sem_g, *,
                G, T, C, L, B, sw, Cn):
    slot = _multi_dma(
        [(xpad_ref, scr_x, sem_x, lambda n_: n_, 0, G + 4),
         (ypad_ref, scr_y, sem_y, lambda n_: jax.lax.rem(n_, B), 0, G + 4),
         (gpad_ref, scr_g, sem_g, lambda n_: n_, 0, G + 2)],
        G=G)
    X = scr_x[slot].astype(jnp.float32)          # [G+4, T, C, L]
    Y = scr_y[slot].astype(jnp.float32)
    # gpad rides a 2-sublane dim ([N, Ho+2, T, 2, L], row 1 zeros) so its
    # row DMA slices only untiled dims and the sublane dim matches the
    # minimal tile of both f32 and bf16; squeeze after the VMEM load
    gw = scr_g[slot].astype(jnp.float32)[:, :, 0]  # [G+2, T, L]

    R = G + 2                                    # pooled rows r-1 .. r+G
    u, v, w = _pools_x(X, Y, R, T, L)
    muy = _wpool(_hsum(Y, R), T, L)
    sy = jnp.maximum(_wpool(_hsum(Y * Y, R), T, L) - muy * muy, 0.0)

    sx_raw = v - u * u
    gmax = (sx_raw > 0.0).astype(jnp.float32)
    sx = jnp.maximum(sx_raw, 0.0)
    sxy = w - u * muy
    n1 = 2.0 * u * muy + _C1
    n2 = 2.0 * sxy + _C2
    inv1 = 1.0 / (u * u + muy * muy + _C1)
    inv2 = 1.0 / (sx + sy + _C2)
    r = n1 * n2 * inv1 * inv2
    val = (1.0 - r) * 0.5
    gclip = ((val > 0.0) & (val < 1.0)).astype(jnp.float32)

    base = gw[:, :, None] * (-0.5 * sw / Cn) * gclip     # [R, T, C, L]
    dr_dsx = -r * inv2
    dr_dw = 2.0 * n1 * inv1 * inv2
    dr_du = (2.0 * muy * n2 * inv1 * inv2 - r * 2.0 * u * inv1
             + dr_dsx * (-2.0 * u * gmax) + dr_dw * (-muy))
    a_u = base * dr_du
    a_v = base * dr_dsx * gmax
    a_w = base * dr_dw

    # P^T = Ph^T o Pw^T: W-adjoint per pooled row, then the 3-row vertical
    # adjoint sum; reflect H-edge extras are gated single-row adds below
    wu = _wpool(a_u, T, L, transpose=True)
    wv = _wpool(a_v, T, L, transpose=True)
    ww = _wpool(a_w, T, L, transpose=True)

    def hT(a):                                   # [G+2, ...] -> [G, ...]
        return a[0:G] + a[1:G + 1] + a[2:G + 2]

    hu, hv, hw = hT(wu), hT(wv), hT(ww)

    # Ph^T reflect extras (the zero-padded cotangent handles the interior):
    # d x[1] += a[0] (abs row 0 = local 1, first block only) and
    # d x[H-2] += a[H-1] (local G-2 / G+1, last block only). Arithmetic
    # gates instead of control flow; static row indices (G >= 2 enforced).
    h = pl.program_id(1)
    top = (h == 0).astype(jnp.float32)
    bot = (h == pl.num_programs(1) - 1).astype(jnp.float32)

    # Mosaic has no scatter-add: express the two static-row adds as
    # iota-masked broadcasts instead of hq.at[row].add(...)
    row = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1, 1), 0)
    m_top = jnp.where(row == 1, top, 0.0)
    m_bot = jnp.where(row == G - 2, bot, 0.0)

    def edge_fix(hq, wq):
        # local pooled row j <-> abs row h*G + j - 1: abs 0 -> j=1 (first
        # block), abs H-1 -> j=G (last block)
        return hq + m_top * wq[1][None] + m_bot * wq[G][None]

    hu = edge_fix(hu, wu)
    hv = edge_fix(hv, wv)
    hw = edge_fix(hw, ww)

    xc = X[2:G + 2]
    yc = Y[2:G + 2]
    gc = gw[1:G + 1][:, :, None]                 # center cotangent rows
    dl1 = gc * ((1.0 - sw) / Cn) * jnp.sign(xc - yc)
    dx = hu + 2.0 * xc * hv + yc * hw + dl1
    dx_ref[0] = dx.astype(dx_ref.dtype)


def photo_loss_pallas(xpad: jnp.ndarray, ypad: jnp.ndarray,
                      muy: jnp.ndarray, sy: jnp.ndarray,
                      ssim_weight: float = 0.85, group: int = 32,
                      cn: int | None = None):
    """``xpad`` [N, Ho+4, T, C, L] reflect-2-row-padded tiled predictions,
    ``ypad`` [B, Ho+4, T, C, L] same for the target, ``muy``/``sy``
    [B, Ho, T, C, L] the pooled target stats -> per-pixel loss
    [N, Ho, T, L] in xpad's dtype."""
    N, Hp, T, C, L = xpad.shape
    Ho = Hp - 4
    B = ypad.shape[0]
    G = _group(group, Ho, T, C, L, xpad.dtype.itemsize, live_f32=22)
    kernel = functools.partial(_fwd_kernel, G=G, T=T, C=C, L=L, B=B,
                               sw=float(ssim_weight), Cn=float(cn or C))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Ho, T, L), xpad.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N, Ho // G),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, G, T, C, L),
                             lambda n, h: (jax.lax.rem(n, B), h, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, T, C, L),
                             lambda n, h: (jax.lax.rem(n, B), h, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, T, L), lambda n, h: (n, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G + 2, T, C, L), xpad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, G + 2, T, C, L), ypad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        # Sequential grid required by the double-buffered scratch.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(xpad, ypad, muy, sy)


def photo_loss_bwd_pallas(xpad: jnp.ndarray, ypad: jnp.ndarray,
                          gpad: jnp.ndarray, ssim_weight: float = 0.85,
                          group: int = 32, cn: int | None = None):
    """``gpad`` [N, Ho+2, T, L] zero-1-row-padded cotangent -> dx
    [N, Ho, T, C, L] f32 (the target/stats are loss constants)."""
    N, Hp, T, C, L = xpad.shape
    gpad = jnp.stack([gpad, jnp.zeros_like(gpad)], axis=3)  # 2-sublane dim
    Ho = Hp - 4
    B = ypad.shape[0]
    G = _group(group, Ho, T, C, L, xpad.dtype.itemsize, live_f32=48)
    kernel = functools.partial(_bwd_kernel, G=G, T=T, C=C, L=L, B=B,
                               sw=float(ssim_weight), Cn=float(cn or C))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Ho, T, C, L), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N, Ho // G),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec((1, G, T, C, L),
                                   lambda n, h: (n, h, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G + 4, T, C, L), xpad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, G + 4, T, C, L), ypad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, G + 2, T, 2, L), gpad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(xpad, ypad, gpad)


def _group(group: int, Ho: int, T: int, C: int, L: int,
           itemsize: int, live_f32: int = 48) -> int:
    """Rows per grid block: divides Ho, >= 2 for the H-edge adjoint's
    static row indices, and sized so the whole scoped-VMEM working set fits
    ``_VMEM_BUDGET``: the (up to 3) double-buffered scratch windows PLUS
    ``live_f32`` live f32 ``[G+4, T, C, L]`` kernel-body temporaries —
    Mosaic's stack, NOT just scratch. The round-3 OOM (BENCH_r03 rc=1,
    16.74 MB at G=32 / T=5 / C=4) measured ~44 live buffers in the
    backward; 48 (bwd) / 22 (fwd) are those measurements + slop. The f32
    X/Y casts of the scratch windows are counted inside ``live_f32``."""
    def _need(g: int) -> int:
        scratch = 3 * 2 * (g + 4) * T * C * L * itemsize
        stack = live_f32 * (g + 4) * T * C * L * 4
        return scratch + stack

    if GROUP_OVERRIDE:
        group = GROUP_OVERRIDE
    while group > 2 and (Ho % group != 0 or _need(group) > _VMEM_BUDGET):
        group //= 2
    return max(group, 2)
