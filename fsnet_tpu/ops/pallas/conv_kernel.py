"""Fused width-packed 3x3 conv kernels: one HBM read of the input, one HBM
write of the output.

The XLA block-Toeplitz formulation (:mod:`fsnet_tpu.ops.fast_conv`) is
MXU-friendly but HBM-hungry: it materializes the window-column tensor
(1.25x input) and the 3N-wide dy-plane tensor (3x output) — ~9.5 tensor
traversals per conv at the decoder's hot shapes. These kernels keep both
in VMEM.

Formulation: for a width-packed input xp [B, H, NB, PC] (PC = P*C lanes,
phase-major; reference conv semantics
``monodepth/networks/models/heads/depth_encoder.py:52-63``) the 3x3 conv is

    out[h, nb] = sum_dy ( X[h+dy, nb]   @ M_A[dy]
                        + X[h+dy, nb-1] @ M_L[dy]
                        + X[h+dy, nb+1] @ M_R[dy]
                        + [nb == 0]      X[h+dy, 0]      @ M_Le[dy]
                        + [nb == NB-1]   X[h+dy, NB-1]   @ M_Re[dy] )

on the row-pre-padded X = xpad [B, H+2, NB, PC], where M_A [PC, PCo] is the
banded block matrix A[p*C+ci, p'*Co+co] = w[dy, p'-p+1, ci, co]
(|p'-p| <= 1), M_L/M_R carry the single cross-block column (phase P-1 ->
out phase 0 with w[dy, 0]; phase 0 -> out phase P-1 with w[dy, 2]), and
M_Le/M_Re implement replicate column edges in-kernel (zero for zeros
padding).  Every column shift lives in the weight matrices, so the kernel
needs only sublane-dim shifts of the input block (no lane rolls, no
gathers); nine + six [*, PC] @ [PC, PCo] MXU matmuls accumulate in f32.

The input-cotangent pass is the SAME kernel on the 2-row-padded cotangent
with mats (A^T, R^T, L^T, Le^T, Re^T) reversed in dy; the weight-cotangent
kernel accumulates the 15 per-matrix gradients in a VMEM scratch across a
sequential grid.  Double-buffered row DMA as in the warp kernels;
sequential grid pinned via dimension_semantics (BASELINE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NM = 15   # 5 matrix slots (A, L, R, Le, Re) x 3 dy


def make_mats(w: jnp.ndarray, P: int, pad_mode: str,
              dtype) -> jnp.ndarray:
    """w [3, 3, C, Co] -> mats [15, P*C, P*Co] ordered (A, L, R, Le, Re)
    slot-major, dy-minor (slot*3 + dy)."""
    kH, kW, C, Co = w.shape
    assert (kH, kW) == (3, 3)
    w = w.astype(jnp.float32)
    A = jnp.zeros((3, P, C, P, Co), jnp.float32)
    # A[input phase p_q -> output phase p']: out column p' reads source
    # column p' + dj - 1, so p_q = p' + dj - 1 and with dp = p' - p_q the
    # tap is dj = 1 - dp.
    for dp in (-1, 0, 1):                      # p' - p_q
        for p in range(P):
            if 0 <= p + dp < P:
                A = A.at[:, p, :, p + dp, :].set(w[:, 1 - dp])
    L = jnp.zeros((3, P, C, P, Co), jnp.float32)
    L = L.at[:, P - 1, :, 0, :].set(w[:, 0])   # prev block phase P-1 -> p'=0
    R = jnp.zeros((3, P, C, P, Co), jnp.float32)
    R = R.at[:, 0, :, P - 1, :].set(w[:, 2])   # next block phase 0 -> p'=P-1
    if pad_mode == "replicate":
        Le = jnp.zeros((3, P, C, P, Co), jnp.float32)
        Le = Le.at[:, 0, :, 0, :].set(w[:, 0])     # col -1 := col 0
        Re = jnp.zeros((3, P, C, P, Co), jnp.float32)
        Re = Re.at[:, P - 1, :, P - 1, :].set(w[:, 2])  # col W := col W-1
    else:
        Le = jnp.zeros((3, P, C, P, Co), jnp.float32)
        Re = Le
    mats = jnp.stack([A, L, R, Le, Re]).reshape(5 * 3, P * C, P * Co)
    return mats.astype(dtype)


def transpose_mats(mats: jnp.ndarray) -> jnp.ndarray:
    """Forward mats -> input-cotangent mats: per slot, transpose each dy
    matrix and reverse dy; swap the L and R slots (g's prev block carries
    R^T, its next block L^T)."""
    m = mats.reshape(5, 3, mats.shape[1], mats.shape[2])
    mt = jnp.transpose(m[:, ::-1], (0, 1, 3, 2))
    mt = jnp.stack([mt[0], mt[2], mt[1], mt[3], mt[4]])
    return mt.reshape(5 * 3, mats.shape[2], mats.shape[1])


def fold_dw(dwacc: jnp.ndarray, P: int, C: int, Co: int,
            pad_mode: str) -> jnp.ndarray:
    """Invert :func:`make_mats`: dwacc [15, PC, PCo] f32 -> dw [3, 3, C, Co]
    by summing the banded blocks each w tap was broadcast into."""
    a = dwacc.reshape(5, 3, P, C, P, Co)
    dw = jnp.zeros((3, 3, C, Co), dwacc.dtype)
    for dp in (-1, 0, 1):
        blocks = [a[0, :, p, :, p + dp, :] for p in range(P)
                  if 0 <= p + dp < P]
        dw = dw.at[:, 1 - dp].add(sum(blocks))
    dw = dw.at[:, 0].add(a[1, :, P - 1, :, 0, :])       # L
    dw = dw.at[:, 2].add(a[2, :, 0, :, P - 1, :])       # R
    if pad_mode == "replicate":
        dw = dw.at[:, 0].add(a[3, :, 0, :, 0, :])       # Le
        dw = dw.at[:, 2].add(a[4, :, P - 1, :, P - 1, :])  # Re
    return dw


def _mm(x2d, wmat):
    return jax.lax.dot_general(
        x2d, wmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _shifted_blocks(X):
    """X [G+2, NB, PC] -> (Xp, Xn): prev/next-block views (zero edges)."""
    z = jnp.zeros_like(X[:, :1])
    Xp = jnp.concatenate([z, X[:, :-1]], axis=1)
    Xn = jnp.concatenate([X[:, 1:], z], axis=1)
    return Xp, Xn


def _conv_tile(X, m_ref, *, G, NB, PC, PCo):
    """X [G+2, NB, PC] -> f32 out [G, NB, PCo]."""
    Xp, Xn = _shifted_blocks(X)
    acc = None
    for dy in range(3):
        for si, src in ((0, X), (1, Xp), (2, Xn)):
            y = _mm(src[dy:dy + G].reshape(G * NB, PC), m_ref[si * 3 + dy])
            acc = y if acc is None else acc + y
    acc = acc.reshape(G, NB, PCo)
    eL = sum(_mm(X[dy:dy + G, 0], m_ref[9 + dy]) for dy in range(3))
    eR = sum(_mm(X[dy:dy + G, NB - 1], m_ref[12 + dy]) for dy in range(3))
    return jnp.concatenate(
        [acc[:, :1] + eL[:, None], acc[:, 1:NB - 1],
         acc[:, NB - 1:] + eR[:, None]], axis=1)


def _row_dma(xpad_ref, scr, sems, G, NI):
    """Double-buffered (G+2)-row window fetch over grid (B', H/G); the grid
    batch may be a multiple of the image batch (B' = B is the only current
    use, NI = B)."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    blk = n * nh + h
    nblk = pl.num_programs(0) * nh
    slot = jax.lax.rem(blk, 2)

    def dma(slot_, n_, h_):
        return pltpu.make_async_copy(
            xpad_ref.at[n_, pl.ds(h_ * G, G + 2)],
            scr.at[slot_], sems.at[slot_])

    @pl.when(blk == 0)
    def _():
        dma(slot, n, h).start()

    @pl.when(blk + 1 < nblk)
    def _():
        nxt = blk + 1
        dma(1 - slot, nxt // nh, jax.lax.rem(nxt, nh)).start()

    dma(slot, n, h).wait()
    return slot


def _fwd_kernel(xpad_ref, m_ref, bias_ref, out_ref, scr, sems, *,
                G, NB, PC, PCo):
    slot = _row_dma(xpad_ref, scr, sems, G, None)
    acc = _conv_tile(scr[slot], m_ref, G=G, NB=NB, PC=PC, PCo=PCo)
    acc = acc + bias_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _fwd_kernel_m(xpad_ref, m_ref, bias_ref, prev_ref, out_ref, mom_ref,
                  scr, sems, macc, *, G, NB, PC, PCo, with_prev):
    """:func:`_fwd_kernel` + BN-moments epilogue: accumulates per-lane sum
    and sum-of-squares of the biased output into a VMEM scratch across the
    sequential grid and writes [2, PCo] f32 at the last block — the
    train-mode BN stats then cost ZERO extra HBM reads of the activation
    (the XLA moments pass re-read every conv output, ~1.5 ms/step across
    the decoder). ``with_prev``: add a previous partial sum (multi-part
    convs accumulate IN-KERNEL, which also removes the XLA add pass)."""
    blk0 = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(blk0)
    def _():
        macc[...] = jnp.zeros((2, PCo), jnp.float32)

    slot = _row_dma(xpad_ref, scr, sems, G, None)
    acc = _conv_tile(scr[slot], m_ref, G=G, NB=NB, PC=PC, PCo=PCo)
    acc = acc + bias_ref[0].astype(jnp.float32)
    if with_prev:
        acc = acc + prev_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)
    # moments of the STORED value (cast round-trip), so mean/var describe
    # exactly the tensor downstream consumers normalize
    accs = out_ref[0].astype(jnp.float32)
    macc[0:1] += jnp.sum(accs, axis=(0, 1)).reshape(1, PCo)
    macc[1:2] += jnp.sum(accs * accs, axis=(0, 1)).reshape(1, PCo)

    nblk = pl.num_programs(0) * pl.num_programs(1)
    blk = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(blk == nblk - 1)
    def _():
        mom_ref[...] = macc[...]


def conv3x3_fused_mats(xpad: jnp.ndarray, mats: jnp.ndarray, brow,
                       group: int = 32) -> jnp.ndarray:
    """Fused conv on prebuilt banded matrices. ``xpad`` [B, Hout+2, NB, PC]
    row-pre-padded, ``mats`` [15, PC, PCo] (:func:`make_mats`), ``brow``
    [1, PCo] or None -> out [B, Hout, NB, PCo] in xpad's dtype."""
    B, Hp, NB, PC = xpad.shape
    H = Hp - 2
    PCo = mats.shape[-1]
    G = _group(group, H, NB, max(PC, PCo), xpad.dtype.itemsize)
    if brow is None:
        brow = jnp.zeros((1, PCo), xpad.dtype)

    kernel = functools.partial(_fwd_kernel, G=G, NB=NB, PC=PC, PCo=PCo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, NB, PCo), xpad.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H // G),
            in_specs=[
                # Pin HBM: ANY lets the compiler place small xpads in VMEM,
                # where the dynamic row-window slice hits a Mosaic internal
                # error (padded-sublane memref_slice); the kernel's DMA
                # pattern requires an off-chip source anyway.
                pl.BlockSpec(memory_space=pltpu.HBM),          # xpad (HBM)
                pl.BlockSpec((_NM, PC, PCo), lambda n, h: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PCo), lambda n, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, NB, PCo),
                                   lambda n, h: (n, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G + 2, NB, PC), xpad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        # Sequential grid required by the double-buffered scratch. The
        # 32 MB scoped-vmem limit absorbs the f32/highest-precision
        # operand inflation (see _group); bf16 production stays well
        # under the default 16 MB.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
    )(xpad, mats.astype(xpad.dtype), brow)


def conv3x3_fused_mats_m(xpad: jnp.ndarray, mats: jnp.ndarray, brow,
                         prev=None, group: int = 32):
    """:func:`conv3x3_fused_mats` with the BN-moments epilogue (and an
    optional in-kernel previous-partial-sum operand for multi-part convs):
    returns (out [B, Hout, NB, PCo], mom [2, PCo] f32) where mom[0]/mom[1]
    are the sum / sum-of-squares of the stored output over (B, Hout, NB)
    per packed lane."""
    B, Hp, NB, PC = xpad.shape
    H = Hp - 2
    PCo = mats.shape[-1]
    G = _group(group, H, NB, max(PC, PCo), xpad.dtype.itemsize)
    if brow is None:
        brow = jnp.zeros((1, PCo), xpad.dtype)
    with_prev = prev is not None
    if not with_prev:
        prev = jnp.zeros((1, 1, 1, PCo), xpad.dtype)
        pspec = pl.BlockSpec((1, 1, 1, PCo), lambda n, h: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        pspec = pl.BlockSpec((1, G, NB, PCo), lambda n, h: (n, h, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel_m, G=G, NB=NB, PC=PC, PCo=PCo,
                               with_prev=with_prev)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, H, NB, PCo), xpad.dtype),
                   jax.ShapeDtypeStruct((2, PCo), jnp.float32)],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H // G),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),          # xpad (HBM)
                pl.BlockSpec((_NM, PC, PCo), lambda n, h: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PCo), lambda n, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pspec,
            ],
            out_specs=[pl.BlockSpec((1, G, NB, PCo),
                                    lambda n, h: (n, h, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((2, PCo), lambda n, h: (0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((2, G + 2, NB, PC), xpad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, PCo), jnp.float32),
            ],
        ),
        # Sequential grid required by the double-buffered scratch AND the
        # cross-block moments accumulator.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
    )(xpad, mats.astype(xpad.dtype), brow, prev)


def _dw_kernel(xpad_ref, g_ref, dw_ref, scr, sems, acc, *, G, NB, PC, PCo):
    blk0 = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(blk0)
    def _():
        acc[...] = jnp.zeros((_NM, PC, PCo), jnp.float32)

    slot = _row_dma(xpad_ref, scr, sems, G, None)
    X = scr[slot]                                     # [G+2, NB, PC]
    Xp, Xn = _shifted_blocks(X)
    g = g_ref[0]                                      # [G, NB, PCo]
    g2d = g.reshape(G * NB, PCo)
    for dy in range(3):
        for si, src in ((0, X), (1, Xp), (2, Xn)):
            x2d = src[dy:dy + G].reshape(G * NB, PC)
            acc[si * 3 + dy] += jax.lax.dot_general(
                x2d, g2d, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc[9 + dy] += jax.lax.dot_general(
            X[dy:dy + G, 0], g[:, 0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[12 + dy] += jax.lax.dot_general(
            X[dy:dy + G, NB - 1], g[:, NB - 1],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    nblk = pl.num_programs(0) * pl.num_programs(1)
    blk = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(blk == nblk - 1)
    def _():
        dw_ref[...] = acc[...]


def conv3x3_fused_dw(xpad: jnp.ndarray, g: jnp.ndarray,
                     group: int = 32) -> jnp.ndarray:
    """Weight-cotangent accumulators: xpad [B, H+2, NB, PC] (the forward's
    padded input), g [B, H, NB, PCo] output cotangent -> dwacc
    [15, PC, PCo] f32, entry si*3+dy = sum over pixels of
    X_si[h+dy]^T g[h] (si as in :func:`make_mats`; edge slots restricted to
    their nb column). Fold with :func:`fold_dw`."""
    B, Hp, NB, PC = xpad.shape
    H = Hp - 2
    PCo = g.shape[-1]
    G = _group(group, H, NB, max(PC, PCo), xpad.dtype.itemsize)

    kernel = functools.partial(_dw_kernel, G=G, NB=NB, PC=PC, PCo=PCo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_NM, PC, PCo), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H // G),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, G, NB, PCo), lambda n, h: (n, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_NM, PC, PCo), lambda n, h: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G + 2, NB, PC), xpad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((_NM, PC, PCo), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
    )(xpad, g)


def _group(group: int, H: int, NB: int, PCmax: int, itemsize: int) -> int:
    """Rows per grid block: divides H, FULL live working set in budget.

    The working set is not just the double-buffered DMA scratch: Mosaic
    materializes the two shifted-block copies (Xp/Xn) plus a copy per
    reshaped matmul operand (9 dy/slot slices) — ~13 [(G+2), NB, PCmax]
    buffers live at peak. Round-5 post-mortem: the old scratch-only budget
    (6 MB) admitted G=16 for the f32 route at upconv_1_1 (NB=80, PC=256),
    whose real scoped allocation is 18.3 MB > the 16 MB limit — an
    f32-only compile failure the bf16 production path never hit (half the
    itemsize). "Supported" must never admit a shape that cannot compile
    (BASELINE.md round 4), so the budget now models the measured live set;
    bf16 groupings are unchanged at every shipped shape."""
    budget = 12 * 1024 * 1024
    while group > 1 and (H % group != 0
                         or 13 * (group + 2) * NB * PCmax * itemsize
                         > budget):
        group //= 2
    return max(group, 1)


def conv_kernel_supported(NB: int, PC: int, PCo: int, dtype) -> bool:
    """Lane-tileable shapes only. NB must be a whole number of 8-sublane
    tiles: an unaligned NB gets sublane-padded in the HBM memref and the
    row-window DMA cannot slice the logical extent (Mosaic: "Slice shape
    along dimension 2 must be aligned to tiling (8)"); e.g. the coarse-scale
    dispconvs (Co=16 -> P=8, W=160/80 -> NB=20/10) fall back to XLA."""
    return (PC % _LANE == 0 and PCo % _LANE == 0
            and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                     jnp.dtype(jnp.bfloat16))
            and NB >= 8 and NB % 8 == 0)
