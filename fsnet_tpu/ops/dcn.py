"""Modulated deformable convolution (DCNv2) — TPU-native.

Reference: the CUDA extension ``vision_base/networks/ops/dcn/`` —
``deform_conv_ext`` pybind dispatch (``src/deform_conv_ext.cpp:11-163``),
im2col CUDA kernels (``src/cuda/deform_conv_cuda_kernel.cu``:
``deformable_im2col_gpu_kernel:191``, bilinear sampler ``:85``) and the
autograd wrappers (``deform_conv.py:54-490``).

TPU-first design: the CUDA im2col + bilinear-gather pipeline becomes, for each
of the K*K kernel taps, one bilinear warp at (base tap position + learned
offset) through the band-warp fast path (``ops/warp_fast.py``) followed by a
1x1 contraction on the MXU — no scatter/gather kernels, fully differentiable
through offsets and masks. Layout NHWC; offset channel order matches the
reference ((dy, dx) interleaved per tap, ``deform_conv_cuda_kernel.cu:262-270``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .warp_fast import grid_sample


def modulated_deform_conv(
    x: jnp.ndarray,            # [B, H, W, Cin]
    offset: jnp.ndarray,       # [B, Ho, Wo, 2*K*K] (dy, dx per tap)
    mask: jnp.ndarray,         # [B, Ho, Wo, K*K] (post-sigmoid modulation)
    weight: jnp.ndarray,       # [K, K, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    warp_band: int = 8,
) -> jnp.ndarray:
    """Forward modulated deformable conv. ``Ho = (H + 2p - d(K-1) - 1)/s + 1``.

    Offsets are in pixels relative to each tap's regular sampling position
    (reference semantics)."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Cout = weight.shape[-1]

    # base sampling positions of the conv taps (top-left origin includes -pad)
    ys = jnp.arange(Ho, dtype=x.dtype) * stride - padding
    xs = jnp.arange(Wo, dtype=x.dtype) * stride - padding
    base_y, base_x = jnp.meshgrid(ys, xs, indexing="ij")  # [Ho, Wo]

    offset = offset.reshape(B, Ho, Wo, K * K, 2)
    mask = mask.reshape(B, Ho, Wo, K * K)

    out = jnp.zeros((B, Ho, Wo, Cout), dtype=x.dtype)
    for ky in range(K):
        for kx in range(K):
            tap = ky * K + kx
            sy = base_y + ky * dilation + offset[..., tap, 0]
            sx = base_x + kx * dilation + offset[..., tap, 1]
            # -> normalized [-1, 1] grid (align_corners=True convention)
            gx = sx / max(W - 1, 1) * 2.0 - 1.0
            gy = sy / max(H - 1, 1) * 2.0 - 1.0
            grid = jnp.stack([gx, gy], axis=-1)
            sampled = grid_sample(x, grid, mode="bilinear",
                                  padding_mode="zeros", align_corners=True,
                                  band=warp_band,
                                  image_grad=True)      # [B, Ho, Wo, Cin]
            sampled = sampled * mask[..., tap, None]
            out = out + jnp.einsum("bhwc,cd->bhwd", sampled,
                                   weight[ky, kx],
                                   preferred_element_type=x.dtype)
    if bias is not None:
        out = out + bias
    return out


def deform_conv(
    x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None, stride: int = 1, padding: int = 1,
    dilation: int = 1, warp_band: int = 8,
) -> jnp.ndarray:
    """Non-modulated variant (reference ``DeformConv``, ``deform_conv.py:230``):
    all-ones modulation."""
    B, Ho, Wo = offset.shape[0], offset.shape[1], offset.shape[2]
    K = weight.shape[0]
    ones = jnp.ones((B, Ho, Wo, K * K), dtype=x.dtype)
    return modulated_deform_conv(x, offset, ones, weight, bias, stride,
                                 padding, dilation, warp_band)
