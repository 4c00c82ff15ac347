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
    parts = list(xp) if isinstance(xp, (tuple, list)) else [xp]
    Cs = list(C) if isinstance(C, (tuple, list)) else [
        parts[0].shape[-1] if C is None else C]
    assert len(parts) == len(Cs)
    kH, kW, Cw, Co = w.shape
    assert (kH, kW) == (3, 3), (kH, kW)
    assert Cw == sum(Cs), (Cw, Cs)
    if PALLAS_CONV and _pallas_conv_supported(parts, Cs, Co):
        return _conv3x3_pallas_cvjp(tuple(parts), w, bias, tuple(Cs),
                                    pad_mode)
    if PACKED_VJP and bias is not None:
        return _conv3x3_packed_cvjp(tuple(parts), w, bias, tuple(Cs),
                                    pad_mode)
    return _conv3x3_forward(parts, Cs, w, bias, pad_mode)


def _conv3x3_forward(parts, Cs, w, bias, pad_mode: str) -> jnp.ndarray:
    Co = w.shape[3]
    P = max(128 // Co, 1)
    if SUMMUL:
        return _conv3x3_forward_summul(parts, Cs, w, bias, pad_mode)
    # The K=(P+2)*C*3 contraction accumulates in f32 (MXU native bf16-mul/
    # f32-acc mode, matching the unpacked nn.Conv), but the result is cast to
    # the compute dtype IN the matmul epilogue so the [B, H+2, NB, 3N] plane
    # tensor is stored at compute width (storing it f32 under bf16 cost
    # ~+140 MB HBM write+read per conv, a measured ~6% step regression).
    # Only the final 3-plane shifted add then runs in the compute dtype
    # (<= 2 ulp vs the unpacked conv's fully-f32-accumulated result).
    y, _, _ = _conv3x3_packed_planes(parts, Cs, w, pad_mode, hpad=1)
    B, H2, NB, _ = y.shape
    H = H2 - 2
    N = P * Co
    out = (y[:, 0:H, :, 0:N] + y[:, 1:H + 1, :, N:2 * N]
           + y[:, 2:H + 2, :, 2 * N:])
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), P)
    return out


def _conv3x3_forward_summul(parts, Cs, w, bias, pad_mode: str) -> jnp.ndarray:
    """A/B variant (:data:`SUMMUL`): three H-shifted [M, K] @ [K, N] matmuls
    summed, instead of one [M, K] @ [K, 3N] matmul + materialized dy-plane
    shifted add. Reads the window columns 3x but never writes/rereads the
    3x-wide y-plane tensor — a win iff XLA output-fuses the matmul sum."""
    Co = w.shape[3]
    P = max(128 // Co, 1)
    N = P * Co
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
    wmat = (wmats[0] if len(wmats) == 1
            else jnp.concatenate(wmats, axis=1))       # [3, K, N]

    out = None
    for dy in range(3):
        y = jnp.dot(colsp[:, dy:H + dy].reshape(-1, K),
                    wmat[dy].astype(cols.dtype),
                    preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    out = out.astype(cols.dtype).reshape(B, H, NB, N)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), P)
    return out


def _conv3x3_packed_planes(xp_parts, Cs, w: jnp.ndarray, pad_mode: str,
                           hpad: int = 1):
    """Shared core of :func:`conv3x3_packed`: window columns + Toeplitz
    matmul, returning the UNFOLDED dy-planes ``y [B, H + 2*hpad, NB, 3N]``
    (plane dy covers source row h + dy - 1). ``hpad=2`` (zero rows) yields
    the extended output rows -1 and H needed by the replicate-pad VJP."""
    P = max(128 // w.shape[3], 1)
    cols = [_part_cols(p, c, P, pad_mode) for p, c in zip(xp_parts, Cs)]
    cols = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=3)
    B, H, NB, K = cols.shape

    if pad_mode == "replicate":
        assert hpad == 1
        colsp = jnp.concatenate([cols[:, :1], cols, cols[:, -1:]], axis=1)
    else:
        colsp = jnp.pad(cols, ((0, 0), (hpad, hpad), (0, 0), (0, 0)))

    off = 0
    wmats = []
    for c in Cs:
        wmats.append(_toeplitz_wmat(w[:, :, off:off + c, :], P))
        off += c
    wmat = (wmats[0] if len(wmats) == 1
            else jnp.concatenate(wmats, axis=1))
    wcat = jnp.concatenate([wmat[0], wmat[1], wmat[2]], axis=1)  # [K, 3PCo]

    y = jnp.dot(colsp.reshape(-1, K), wcat.astype(cols.dtype),
                preferred_element_type=jnp.float32).astype(cols.dtype)
    return y.reshape(B, H + 2 * hpad, NB, 3 * P * w.shape[3]), colsp, wcat


def _flip_w(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, Co] -> correlation weights for the input cotangent:
    spatially flipped, channels transposed -> [3, 3, Co, C]."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _edge_col_corr(g_unpacked: jnp.ndarray, w_col: jnp.ndarray,
                   pad_mode: str) -> jnp.ndarray:
    """Replicate-pad column correction: contributions of the replicated
    column (fwd taps dj reading clip(k + dj - 1) = edge) fold into the edge
    column of dx. ``g_unpacked`` [B, H, 1, Co] is the output cotangent at
    the edge column, ``w_col`` [3, Co, C] the matching dj weight plane;
    returns [B, H, 1, C] to ADD into dx's edge column. Row-replicate clip is
    applied to the 3-tap row correlation itself."""
    B, H, _, Co = g_unpacked.shape
    g = g_unpacked[:, :, 0]                                # [B, H, Co]
    taps = [jnp.einsum("bhc,cd->bhd", g, w_col[dy]) for dy in range(3)]
    # dx_edge[i] = sum_dy g[h]*w[dy] over h: clip(h+dy-1)=i
    ext = (jnp.pad(taps[0], ((0, 0), (0, 2), (0, 0)))      # h+(-1) -> rows
           + jnp.pad(taps[1], ((0, 0), (1, 1), (0, 0)))
           + jnp.pad(taps[2], ((0, 0), (2, 0), (0, 0))))   # [B, H+2, C]
    out = ext[:, 1:H + 1]
    if pad_mode == "replicate":
        out = out.at[:, 0].add(ext[:, 0]).at[:, H - 1].add(ext[:, H + 1])
    return out[:, :, None, :]


def conv3x3_packed_vjp_bwd(xp_parts, Cs, w, bias, pad_mode, P_ins, g):
    """Backward of :func:`conv3x3_packed` built from the SAME block-Toeplitz
    MXU machinery (XLA's autodiff of the forward lowers the cols/halo
    assembly transposes poorly — this keeps every pass lane-full):

    - d input: packed correlation of ``g`` with flipped/transposed weights
      (+ extended-row and edge-column folds for replicate padding)
    - d w: one [K, M] @ [M, 3N] matmul + inverse Toeplitz fold
    - d bias: phase-folded reduction
    """
    kH, kW, Cw, Co = w.shape
    P = max(128 // Co, 1)
    B, H, NB_out, PCo = g.shape

    # ---- dw: scatter g into the 3 shifted dy-planes, contract against cols.
    # Forward folded out[h] = y[h, p0] + y[h+1, p1] + y[h+2, p2], so plane
    # p_dy's cotangent at padded row r is g[r - dy] (zeros out of range).
    _, colsp, _ = _conv3x3_packed_planes(xp_parts, Cs, w, pad_mode, hpad=1)
    K = colsp.shape[-1]
    N = P * Co
    z = jnp.zeros_like(g[:, :1])
    d0 = jnp.concatenate([g, z, z], axis=1)                # [B, H+2, NB, N]
    d1 = jnp.concatenate([z, g, z], axis=1)
    d2 = jnp.concatenate([z, z, g], axis=1)
    dyp = jnp.concatenate([d0, d1, d2], axis=-1)           # [B, H+2, NB, 3N]

    dwcat = jnp.dot(colsp.reshape(-1, K).T.astype(jnp.float32),
                    dyp.reshape(-1, 3 * N).astype(jnp.float32),
                    preferred_element_type=jnp.float32)    # [K, 3N]

    # invert the Toeplitz embedding per part: wcat rows are ordered
    # (part | cols order (0..P-1, l, r) x ci), columns (dy, p, co)
    span = P + kW - 1
    dw_parts = []
    row_off = 0
    for c in Cs:
        dpart = dwcat[row_off:row_off + span * c].reshape(span, c, 3, P, Co)
        row_off += span * c
        # cols order (0..P-1, l, r) -> window order (l, 0..P-1, r)
        dpart = jnp.concatenate(
            [dpart[P:P + 1], dpart[0:P], dpart[P + 1:]], axis=0)
        dpart = jnp.transpose(dpart, (2, 0, 1, 4, 3))      # [dy, span, c, Co, P]
        dw_c = sum(dpart[:, p:p + kW, :, :, p] for p in range(P))
        dw_parts.append(dw_c)                              # [3, 3, c, Co]
    dw = (dw_parts[0] if len(dw_parts) == 1
          else jnp.concatenate(dw_parts, axis=2)).astype(w.dtype)

    dbias = (jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
             .reshape(P, Co).sum(0).astype(g.dtype)
             if bias is not None else None)

    # ---- dx: packed correlation of g with flipped weights, extended rows
    wf = _flip_w(w)                                        # [3, 3, Co, sumC]
    dxs = []
    off = 0
    for c, part, P_in in zip(Cs, xp_parts, P_ins):
        wf_c = wf[:, :, :, off:off + c]
        off += c
        yx, _, _ = _conv3x3_packed_planes([g], [Co], wf_c, "zeros", hpad=2)
        Px = max(128 // c, 1)
        Nx = Px * c
        Hx = H
        ext = (yx[:, 0:Hx + 2, :, 0:Nx] + yx[:, 1:Hx + 3, :, Nx:2 * Nx]
               + yx[:, 2:Hx + 4, :, 2 * Nx:])              # rows -1..H
        dx = ext[:, 1:Hx + 1]
        if pad_mode == "replicate":
            dx = dx.at[:, 0].add(ext[:, 0]).at[:, Hx - 1].add(ext[:, Hx + 1])
            # edge columns: replicated halo contributions (fwd dj = 0 taps
            # for the left edge, dj = 2 for the right), in unpacked minor
            # space. _edge_col_corr wants w[dy, dj_edge].T in ORIGINAL dy
            # order; wf_c[dy', 2 - dj_edge] = w[2 - dy', dj_edge].T, so
            # reverse the dy axis.
            gu = unpack_width(g, Co)
            left = _edge_col_corr(gu[:, :, 0:1], wf_c[::-1, 2], pad_mode)
            right = _edge_col_corr(gu[:, :, -1:], wf_c[::-1, 0], pad_mode)
            dxu = unpack_width(dx, c)
            dxu = dxu.at[:, :, 0:1].add(left.astype(dxu.dtype))
            dxu = dxu.at[:, :, -1:].add(right.astype(dxu.dtype))
            dx = pack_width(dxu, Px)
        dxs.append(repack(dx, c, P_in).astype(part.dtype))
    return dxs, dw, dbias


from functools import partial as _partial  # noqa: E402  (local helper)

import os as _os

#: A/B toggle for the hand-written packed-conv VJP. Default OFF: the
#: in-process A/B harness (scripts/tpu_ab_bench.py) measured it at 88.0 vs
#: 79.4 ms/step — XLA's autodiff of the forward beats this hand-written
#: backward on v5e. Kept (exact, tested in tests/test_packed_decoder.py)
#: for future re-evaluation on other topologies.
PACKED_VJP = _os.environ.get("FSNET_PACKED_VJP", "0") == "1"

#: A/B toggle: 3-matmul dy-plane-sum forward (see _conv3x3_forward_summul).
SUMMUL = _os.environ.get("FSNET_CONV3_SUMMUL", "0") == "1"

#: Fused Pallas conv kernel (one HBM read in, one write out — kills the
#: cols + dy-plane materializations). Dispatches on TPU backends for
#: lane-tileable shapes; ``FSNET_CONV3_PALLAS=0`` restores the XLA path.
PALLAS_CONV = _os.environ.get("FSNET_CONV3_PALLAS", "1") != "0"


def _pallas_conv_supported(parts, Cs, Co) -> bool:
    import jax as _jax

    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    from .pallas import conv_kernel as ck

    P = max(128 // Co, 1)
    if P * Co % 128 != 0:
        return False
    for part, c in zip(parts, Cs):
        W_tot = part.shape[2] * (part.shape[-1] // c)
        if W_tot % P != 0:
            return False
        if not ck.conv_kernel_supported(W_tot // P, P * c, P * Co,
                                        part.dtype):
            return False
    return True


def _rowpad3(xp: jnp.ndarray, pad_mode: str, extra: int = 0) -> jnp.ndarray:
    """[B, H, NB, PC] -> [B, H + 2 + 2*extra, NB, PC] row padding for the
    fused kernel (conv row pad + ``extra`` zero rows per side for the
    cotangent pass)."""
    if pad_mode == "replicate":
        xp = jnp.concatenate([xp[:, :1], xp, xp[:, -1:]], axis=1)
    else:
        xp = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    if extra:
        xp = jnp.pad(xp, ((0, 0), (extra, extra), (0, 0), (0, 0)))
    return xp


def _conv3x3_forward_pallas(parts, Cs, w, bias, pad_mode: str):
    from .pallas import conv_kernel as ck

    Co = w.shape[3]
    P = max(128 // Co, 1)
    out = None
    off = 0
    for part, c in zip(parts, Cs):
        xp = repack(part, c, P)
        xpad = _rowpad3(xp, pad_mode)
        mats = ck.make_mats(w[:, :, off:off + c], P, pad_mode, xp.dtype)
        off += c
        brow = (jnp.tile(bias.astype(xp.dtype), P)[None]
                if bias is not None and out is None else None)
        o = ck.conv3x3_fused_mats(xpad, mats, brow)
        out = o if out is None else out + o
    return out


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_pallas_cvjp(parts, w, bias, Cs, pad_mode):
    return _conv3x3_forward_pallas(list(parts), list(Cs), w, bias, pad_mode)


def _pallas_cvjp_fwd(parts, w, bias, Cs, pad_mode):
    out = _conv3x3_forward_pallas(list(parts), list(Cs), w, bias, pad_mode)
    return out, (parts, w, None if bias is None else True)


def _pallas_cvjp_bwd(Cs, pad_mode, res, g):
    from .pallas import conv_kernel as ck

    parts, w, has_bias = res
    Co = w.shape[3]
    P = max(128 // Co, 1)
    B, H, NBo, PCo = g.shape

    # dx out rows span the padded input (H+2); round the kernel's output
    # height up to a multiple of 16 so the row DMA keeps large windows.
    # Alignment: the kernel computes dxpad[r] = sum_dy' G[r+dy'] @ M2[dy']
    # with M2[dy'] = M[2-dy']^T, i.e. sum_dy G[r+2-dy] @ M[dy]^T; the true
    # cotangent is dxpad[r] = sum_dy g[r-dy] @ M[dy]^T, so G[k] = g[k-2]:
    # TWO zero rows on top, zeros to Hout+2 below.
    Hout = -(-(H + 2) // 16) * 16
    gpad = jnp.pad(g, ((0, 0), (2, Hout - H), (0, 0), (0, 0)))

    dxs, dws = [], []
    off = 0
    for part, c in zip(parts, Cs):
        xp = repack(part, c, P)
        xpad = _rowpad3(xp, pad_mode)
        wp = w[:, :, off:off + c]
        off += c
        mats = ck.make_mats(wp, P, pad_mode, g.dtype)
        dxpad = ck.conv3x3_fused_mats(gpad, ck.transpose_mats(mats), None)
        dxpad = dxpad[:, :H + 2]               # rows of xpad
        dxp = dxpad[:, 1:H + 1]
        if pad_mode == "replicate":
            dxp = jnp.concatenate(
                [dxp[:, :1] + dxpad[:, :1], dxp[:, 1:H - 1],
                 dxp[:, H - 1:] + dxpad[:, H + 1:]], axis=1)
        P_in = part.shape[-1] // c
        dxs.append(repack(dxp, c, P_in).astype(part.dtype))

        dwacc = ck.conv3x3_fused_dw(xpad, g)
        dws.append(ck.fold_dw(dwacc, P, c, Co, pad_mode).astype(w.dtype))

    dw = dws[0] if len(dws) == 1 else jnp.concatenate(dws, axis=2)
    dbias = (jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
             .reshape(P, Co).sum(0).astype(g.dtype) if has_bias else None)
    return tuple(dxs), dw, dbias


_conv3x3_pallas_cvjp.defvjp(_pallas_cvjp_fwd, _pallas_cvjp_bwd)


def conv3x3_packed_bn(xp, w: jnp.ndarray, bias, C=None,
                      pad_mode: str = "zeros"):
    """:func:`conv3x3_packed` + per-packed-lane output moments for
    train-mode BN: returns (out [B, H, NB, PCo], s1 [PCo] f32, s2 [PCo]
    f32) with s1/s2 the sum / sum-of-squares of ``out`` over (B, H, NB).

    On the Pallas path the moments ride the conv kernel's epilogue (zero
    extra HBM reads — the XLA moments pass re-read every conv output,
    ~1.5 ms/step across the decoder at the KITTI recipe) and multi-part
    inputs accumulate in-kernel (removing the XLA output-add pass too).
    Fallback: the plain conv + an XLA reduction (identical math)."""
    parts = list(xp) if isinstance(xp, (tuple, list)) else [xp]
    Cs = list(C) if isinstance(C, (tuple, list)) else [
        parts[0].shape[-1] if C is None else C]
    if PALLAS_CONV and _pallas_conv_supported(parts, Cs, w.shape[3]):
        return _conv3x3_pallas_bn_cvjp(tuple(parts), w, bias, tuple(Cs),
                                       pad_mode)
    out = conv3x3_packed(xp, w, bias, C=C, pad_mode=pad_mode)
    xf = out.astype(jnp.float32)
    return out, jnp.sum(xf, axis=(0, 1, 2)), \
        jnp.sum(xf * xf, axis=(0, 1, 2))


def _conv3x3_forward_pallas_bn(parts, Cs, w, bias, pad_mode: str):
    from .pallas import conv_kernel as ck

    Co = w.shape[3]
    P = max(128 // Co, 1)
    out = None
    off = 0
    last = len(parts) - 1
    for i, (part, c) in enumerate(zip(parts, Cs)):
        xp = repack(part, c, P)
        xpad = _rowpad3(xp, pad_mode)
        mats = ck.make_mats(w[:, :, off:off + c], P, pad_mode, xp.dtype)
        off += c
        brow = (jnp.tile(bias.astype(xp.dtype), P)[None]
                if bias is not None and i == 0 else None)
        if i == last:
            out, mom = ck.conv3x3_fused_mats_m(xpad, mats, brow, prev=out)
        else:
            o = ck.conv3x3_fused_mats(xpad, mats, brow)
            out = o if out is None else out + o
    return out, mom[0], mom[1]


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_pallas_bn_cvjp(parts, w, bias, Cs, pad_mode):
    return _conv3x3_forward_pallas_bn(list(parts), list(Cs), w, bias,
                                      pad_mode)


def _pallas_bn_cvjp_fwd(parts, w, bias, Cs, pad_mode):
    out, s1, s2 = _conv3x3_forward_pallas_bn(list(parts), list(Cs), w,
                                             bias, pad_mode)
    return (out, s1, s2), (parts, w, None if bias is None else True, out)


def _pallas_bn_cvjp_bwd(Cs, pad_mode, res, cots):
    parts, w, has_bias, out = res
    g, gs1, gs2 = cots
    # d s1/d out = 1, d s2/d out = 2*out — fold the moment cotangents into
    # the output cotangent (one fused elementwise pass; this is exactly
    # what XLA's autodiff of the separate moments reduction emitted)
    g_tot = (g.astype(jnp.float32) + gs1[None, None, None, :]
             + 2.0 * out.astype(jnp.float32)
             * gs2[None, None, None, :]).astype(g.dtype)
    return _pallas_cvjp_bwd(Cs, pad_mode, (parts, w, has_bias), g_tot)


_conv3x3_pallas_bn_cvjp.defvjp(_pallas_bn_cvjp_fwd, _pallas_bn_cvjp_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_packed_cvjp(parts, w, bias, Cs, pad_mode):
    return _conv3x3_forward(list(parts), list(Cs), w, bias, pad_mode)


def _cvjp_fwd(parts, w, bias, Cs, pad_mode):
    out = _conv3x3_forward(list(parts), list(Cs), w, bias, pad_mode)
    return out, (parts, w)


def _cvjp_bwd(Cs, pad_mode, res, g):
    parts, w = res
    P_ins = [p.shape[-1] // c for p, c in zip(parts, Cs)]
    dxs, dw, dbias = conv3x3_packed_vjp_bwd(
        list(parts), list(Cs), w, True, pad_mode, P_ins, g)
    return tuple(dxs), dw, dbias


_conv3x3_packed_cvjp.defvjp(_cvjp_fwd, _cvjp_bwd)


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
