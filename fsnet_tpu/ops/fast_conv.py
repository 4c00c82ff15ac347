"""Width-packed small-channel convolution for TPU.

Why: XLA's native conv and *every* elementwise op on NHWC tensors with few
channels (the monodepth2 decoder runs C=16..64 at up to 192x640) waste most
of the chip — the C-minor layout uses C of 128 lanes, and measured cost of a
single 16-channel full-res conv is ~1.3 ms with another ~1 ms of layout
penalty per surrounding op (``scripts/tpu_model_bench2.py``). Packing P
consecutive output columns into the channel axis keeps ``P*C = 128`` so all
ops run lane-full, and a 3x3 conv becomes ONE block-Toeplitz matmul with
N = P*Co = 128 on the MXU:

    out[b, h, wb, (p, co)] = sum_{dy, j, ci} cols[b, h+dy, wb, (j, ci)]
                                         * W[dy, j - p, ci, co]

where cols is the packed row extended by one source column on each side
(neighbor-block channel slices — unit-stride concats, no gathers).

The packed representation of [B, H, W, C] at pack factor P is
[B, H, W//P, P*C] with channel index (p*C + c) — a pure reshape (identical
memory order), so packing/unpacking is free.

Reference equivalence: matches ``jax.lax.conv_general_dilated`` stride-1
3x3 SAME conv (zero or replicate padding) exactly up to matmul precision;
covered by tests against the native conv.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def pack_width(x: jnp.ndarray, P: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W//P, P*C] (free reshape)."""
    B, H, W, C = x.shape
    assert W % P == 0, (W, P)
    return x.reshape(B, H, W // P, P * C)


def unpack_width(xp: jnp.ndarray, C: int) -> jnp.ndarray:
    """[B, H, NB, P*C] -> [B, H, NB*P, C] (free reshape)."""
    B, H, NB, PC = xp.shape
    return xp.reshape(B, H, NB * (PC // C), C)


def repack(xp: jnp.ndarray, C: int, P_new: int) -> jnp.ndarray:
    """Change pack factor (free reshape chain)."""
    return pack_width(unpack_width(xp, C), P_new)


def _toeplitz_wmat(w: jnp.ndarray, P: int) -> jnp.ndarray:
    """w [kH, kW, C, Co] -> [kH, (P+kW-1)*C, P*Co] block-Toeplitz (traced),
    rows ordered [window cols 0..P-1 | left halo | right halo] to match
    :func:`_part_cols`."""
    kH, kW, C, Co = w.shape
    span = P + kW - 1
    wmat = jnp.zeros((kH, span, C, P, Co), w.dtype)
    for p in range(P):
        wmat = wmat.at[:, p:p + kW, :, p, :].set(w)
    wmat = wmat.reshape(kH, span, C * P * Co)
    # window order (l, 0..P-1, r) -> cols order (0..P-1, l, r)
    wmat = jnp.concatenate([wmat[:, 1:P + 1], wmat[:, 0:1], wmat[:, P + 1:]],
                           axis=1)
    return wmat.reshape(kH, span * C, P * Co)


def _part_cols(xp: jnp.ndarray, C: int, P: int, pad_mode: str) -> jnp.ndarray:
    """One input part's window columns [B, H, NB, (P+2)*C], ordered
    [block columns | left-halo col | right-halo col].

    Putting the halo channels at the END (instead of window order) makes the
    dominant concat piece a lane-aligned full-bandwidth copy of the packed
    row itself — interleaving the halos forced the whole cols tensor through
    a C-minor relayout (~7x slower, see BASELINE.md). The Toeplitz weight
    rows are reordered to match (:func:`_toeplitz_wmat` ``halo_last``)."""
    xp = repack(xp, C, P)
    B, H, NB, PC = xp.shape
    if pad_mode == "replicate":
        left0 = xp[:, :, 0:1, 0:C]
        rightn = xp[:, :, -1:, PC - C:]
    else:
        left0 = jnp.zeros_like(xp[:, :, 0:1, 0:C])
        rightn = left0
    l = jnp.concatenate([left0, xp[:, :, :-1, PC - C:]], axis=2)
    r = jnp.concatenate([xp[:, :, 1:, 0:C], rightn], axis=2)
    return jnp.concatenate([xp, l, r], axis=3)


def conv3x3_packed(xp, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None,
                   C=None, pad_mode: str = "zeros") -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv on width-packed tensor(s).

    ``xp`` is one packed [B, H, NB, P_in*C] tensor (any P_in) or a
    tuple/list of them — a multi-part input is convolved as if the parts
    were channel-concatenated (``w``'s input-channel axis spans the parts in
    order), WITHOUT materializing the concat. ``w`` [3, 3, sum(C), Co]
    (flax HWIO), ``pad_mode`` 'zeros' or 'replicate'. Returns the output
    packed at ``P_out = max(128 // Co, 1)``: [B, H, W//P_out, P_out*Co].

    Compute shape: the whole conv is ONE 2D matmul
    [B*(H+2)*NB, K] @ [K, 3*P*Co] (K = 3x3 taps unrolled into a
    block-Toeplitz weight; all three dy planes share one read of the window
    columns) followed by three H-shifted lane-block adds. Flattening to 2D
    matters: a [..., NB, K] @ [K, N] dot lowers with M=NB(~80) batched
    matmuls that starve the 128x128 MXU."""
    parts = xp if isinstance(xp, (tuple, list)) else [xp]
    Cs = list(C) if isinstance(C, (tuple, list)) else [
        parts[0].shape[-1] if C is None else C]
    assert len(parts) == len(Cs)
    kH, kW, Cw, Co = w.shape
    assert (kH, kW) == (3, 3), (kH, kW)
    assert Cw == sum(Cs), (Cw, Cs)
    P = max(128 // Co, 1)

    cols = [_part_cols(p, c, P, pad_mode) for p, c in zip(parts, Cs)]
    cols = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=3)
    B, H, NB, K = cols.shape

    if pad_mode == "replicate":
        colsp = jnp.concatenate([cols[:, :1], cols, cols[:, -1:]], axis=1)
    else:
        colsp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)))

    off = 0
    wmats = []
    for c in Cs:
        wmats.append(_toeplitz_wmat(w[:, :, off:off + c, :], P))
        off += c
    # [3, K, P*Co] with rows grouped (part, j, ci) to match the cols order
    wmat = (wmats[0] if len(wmats) == 1
            else jnp.concatenate(wmats, axis=1))
    wcat = jnp.concatenate([wmat[0], wmat[1], wmat[2]], axis=1)  # [K, 3PCo]

    # Always accumulate the K=(P+2)*C*3 contraction in f32 so the packed path
    # matches the unpacked nn.Conv (which accumulates f32 on the MXU) under
    # bf16 activations; the result is cast back to the input dtype below.
    y = jnp.dot(colsp.reshape(-1, K), wcat.astype(cols.dtype),
                preferred_element_type=jnp.float32)
    N = P * Co
    y = y.reshape(B, H + 2, NB, 3 * N)
    out = (y[:, 0:H, :, 0:N] + y[:, 1:H + 1, :, N:2 * N]
           + y[:, 2:H + 2, :, 2 * N:]).astype(cols.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), P)
    return out


def conv7x7s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """7x7 stride-2 pad-3 conv for tiny input channels (the ResNet stem,
    C=3 or 6): XLA's native conv runs it at ~2% of peak because the C-minor
    layout uses 3 of 128 lanes. Reformulated as a K=(7*span*C)-contraction
    matmul over W-minor column pieces (every piece copy is lane-full).

    ``x`` [B, H, W, C] NHWC, ``w`` [7, 7, C, Co]; returns [B, H//2, W//2, Co]
    (reference stem semantics, torchvision conv1)."""
    B, H, W, C = x.shape
    kH, kW, Cw, Co = w.shape
    assert (kH, kW) == (7, 7) and Cw == C
    S = 2
    P = max(128 // Co, 1)
    Ho, Wo = H // S, W // S
    NB = Wo // P
    SP = S * P
    span = (P - 1) * S + kW

    xt = jnp.transpose(x, (0, 1, 3, 2))               # [B, H, C, W]
    Wp = -(-(W + 6) // SP) * SP
    xt = jnp.pad(xt, ((0, 0), (3, 3), (0, 0), (3, Wp - W - 3)))
    Hp = H + 6
    xv = xt.reshape(B, Hp // 2, 2, C, Wp // SP, SP)

    pieces = []
    for dy in range(kH):
        hb, hpar = dy // 2, dy % 2
        for j in range(span):
            wb, wsub = j // SP, j % SP
            pieces.append(
                xv[:, hb:hb + Ho, hpar, :, wb:wb + NB, wsub])  # [B,Ho,C,NB]
    cols = jnp.stack(pieces, axis=2)                   # [B, Ho, 49.., C, NB]
    cols = cols.reshape(B, Ho, kH * span * C, NB)

    wmat = jnp.zeros((kH, span, C, P, Co), w.dtype)
    for p in range(P):
        wmat = wmat.at[:, S * p:S * p + kW, :, p, :].set(w)
    wmat = wmat.reshape(kH * span * C, P * Co)

    out = jax.lax.dot_general(
        cols, wmat.astype(cols.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # f32 accum, as nn.Conv
    return out.astype(x.dtype).reshape(B, Ho, Wo, Co)


def batchnorm_packed(xp: jnp.ndarray, C: int, mean, var, gamma, beta,
                     epsilon: float = 1e-5) -> jnp.ndarray:
    """Apply per-channel affine BN stats to a packed tensor (stats are per
    real channel c, tiled over the P phases)."""
    PC = xp.shape[-1]
    P = PC // C
    scale = (gamma * jax.lax.rsqrt(var + epsilon)).astype(xp.dtype)
    shift = (beta - mean * gamma * jax.lax.rsqrt(var + epsilon)).astype(
        xp.dtype)
    return xp * jnp.tile(scale, P) + jnp.tile(shift, P)


def batch_moments_packed(xp: jnp.ndarray, C: int):
    """Batch mean/var per real channel of a packed tensor (for training-mode
    BN): reduces over batch, H, W-blocks AND the P phases.

    The big (B, H, NB) reduction runs on the lane-full PC-minor tensor; only
    the tiny [P, C] -> [C] phase fold reshapes to C-minor (a [PC] vector)."""
    xf = xp.astype(jnp.float32)
    n = xp.shape[0] * xp.shape[1] * xp.shape[2]
    s1 = jnp.sum(xf, axis=(0, 1, 2))                    # [PC]
    s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2))        # [PC]
    PC = xp.shape[-1]
    P = PC // C
    mean = jnp.sum(s1.reshape(P, C), axis=0) / (n * P)
    m2 = jnp.sum(s2.reshape(P, C), axis=0) / (n * P)
    return mean, m2 - jnp.square(mean)


def _shuffle_matrix(src_pc: int, dst_pc: int, dst_of_src) -> np.ndarray:
    """0/1 [src_pc, dst_pc] lane-shuffle matrix: channel shuffles of packed
    tensors run as MXU matmuls (full-bandwidth) instead of C-minor
    reshape+concat relayouts (which XLA executes at ~1/8 bandwidth)."""
    m = np.zeros((src_pc, dst_pc), np.float32)
    for s in range(src_pc):
        for d in dst_of_src(s):
            m[s, d] = 1.0
    return m


def upsample2x_packed(xp: jnp.ndarray, C: int) -> jnp.ndarray:
    """2x nearest upsample of a packed tensor; returns packing P' = 2P
    (so ``P*C`` stays at 128 when channel count halves between decoder
    stages). out[(b, 2h+{0,1}, wb, (2p+{0,1}, c))] = in[b, h, wb, (p, c)].
    The W-phase duplication is a 0/1 shuffle matmul; the H duplication a
    broadcast."""
    B, H, NB, PC = xp.shape
    P = PC // C
    sel = jnp.asarray(_shuffle_matrix(
        PC, 2 * PC,
        lambda s: ((2 * (s // C) + 0) * C + s % C,
                   (2 * (s // C) + 1) * C + s % C))).astype(xp.dtype)
    up = jnp.dot(xp, sel, preferred_element_type=xp.dtype)  # [B,H,NB,2PC]
    up = jnp.broadcast_to(up[:, :, None], (B, H, 2, NB, 2 * PC))
    return up.reshape(B, H * 2, NB, 2 * PC)


def concat_packed(a: jnp.ndarray, Ca: int, b: jnp.ndarray, Cb: int,
                  P: int) -> jnp.ndarray:
    """Channel-concat two packed tensors (same spatial shape, same P):
    out real channels = [a's Ca | b's Cb]. Runs as two 0/1 shuffle matmuls
    summed (keeps every pass lane-full)."""
    Cc = Ca + Cb
    sa = jnp.asarray(_shuffle_matrix(
        P * Ca, P * Cc,
        lambda s: ((s // Ca) * Cc + s % Ca,))).astype(a.dtype)
    sb = jnp.asarray(_shuffle_matrix(
        P * Cb, P * Cc,
        lambda s: ((s // Cb) * Cc + Ca + s % Cb,))).astype(b.dtype)
    return (jnp.dot(a, sa, preferred_element_type=a.dtype)
            + jnp.dot(b, sb, preferred_element_type=b.dtype))
