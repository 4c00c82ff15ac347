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
    """w [kH, kW, C, Co] -> [kH, (P+kW-1)*C, P*Co] block-Toeplitz (traced)."""
    kH, kW, C, Co = w.shape
    span = P + kW - 1
    wmat = jnp.zeros((kH, span, C, P, Co), w.dtype)
    for p in range(P):
        wmat = wmat.at[:, p:p + kW, :, p, :].set(w)
    return wmat.reshape(kH, span * C, P * Co)


def conv3x3_packed(xp: jnp.ndarray, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None,
                   C: int = None, pad_mode: str = "zeros") -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv on a width-packed tensor.

    ``xp`` [B, H, NB, P_in*C] packed input (any P_in), ``w`` [3, 3, C, Co]
    (flax HWIO), ``pad_mode`` 'zeros' or 'replicate' (torch
    ``padding_mode='replicate'``). Returns the output packed at
    ``P_out = max(128 // Co, 1)``: [B, H, (NB*P_in)//P_out, P_out*Co].
    """
    kH, kW, Cw, Co = w.shape
    assert (kH, kW) == (3, 3), (kH, kW)
    C = Cw if C is None else C
    P_out = max(128 // Co, 1)
    xp = repack(xp, C, P_out)
    B, H, NB, PC = xp.shape
    P = PC // C
    assert P == P_out

    xw = xp.reshape(B, H, NB, P, C)
    if pad_mode == "replicate":
        left0 = xw[:, :, 0:1, 0]
        rightn = xw[:, :, -1:, P - 1]
    else:
        left0 = jnp.zeros_like(xw[:, :, 0:1, 0])
        rightn = left0
    l = jnp.concatenate([left0, xw[:, :, :-1, P - 1]], axis=2)
    r = jnp.concatenate([xw[:, :, 1:, 0], rightn], axis=2)
    cols = jnp.concatenate(
        [l[:, :, :, None], xw, r[:, :, :, None]], axis=3
    ).reshape(B, H, NB, (P + 2) * C)

    if pad_mode == "replicate":
        colsp = jnp.concatenate([cols[:, :1], cols, cols[:, -1:]], axis=1)
    else:
        colsp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)))

    wmat = _toeplitz_wmat(w, P)
    out = None
    for dy in range(3):
        part = jnp.dot(colsp[:, dy:dy + H], wmat[dy],
                       preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    out = out.astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), P)
    return out


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
    BN): reduces over batch, H, W-blocks AND the P phases."""
    B, H, NB, PC = xp.shape
    P = PC // C
    xv = xp.astype(jnp.float32).reshape(B, H, NB, P, C)
    mean = jnp.mean(xv, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(xv), axis=(0, 1, 2, 3)) - jnp.square(mean)
    return mean, var


def upsample2x_packed(xp: jnp.ndarray, C: int) -> jnp.ndarray:
    """2x nearest upsample of a packed tensor; returns packing P' = 2P
    (so ``P*C`` stays at 128 when channel count halves between decoder
    stages). out[(b, 2h+{0,1}, wb, (2p+{0,1}, c))] = in[b, h, wb, (p, c)]."""
    B, H, NB, PC = xp.shape
    P = PC // C
    xv = xp.reshape(B, H, NB, P, C)
    xv = jnp.broadcast_to(xv[:, :, None, :, :, None, :],
                          (B, H, 2, NB, P, 2, C))
    return xv.reshape(B, H * 2, NB, 2 * P * C)


def concat_packed(a: jnp.ndarray, Ca: int, b: jnp.ndarray, Cb: int,
                  P: int) -> jnp.ndarray:
    """Channel-concat two packed tensors (same spatial shape, same P):
    out real channels = [a's Ca | b's Cb]."""
    B, H, NB, _ = a.shape
    av = a.reshape(B, H, NB, P, Ca)
    bv = b.reshape(B, H, NB, P, Cb)
    return jnp.concatenate([av, bv], axis=4).reshape(B, H, NB, P * (Ca + Cb))
