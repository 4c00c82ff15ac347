"""DLA upsampling head with deformable-conv aggregation (flax.linen, NHWC).

Reference: ``vision_base/networks/models/backbone/dla_utils.py`` —
``DeformConv:40`` (ModulatedDeformConvPack + BN + ReLU), ``IDAUp:57``
(bilinear-initialised grouped deconv upsample + node fusion), ``DLAUp:87``
(iterative aggregation), ``DLASegUpsample:124`` — plus the DCN module itself
(``vision_base/networks/ops/dcn/deform_conv.py``: ``ModulatedDeformConvPack:422``
predicts offsets/mask with an internal conv, ``init_offset:335`` zero-init).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.dcn import modulated_deform_conv
from ..blocks import BatchNorm


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 with self-predicted offsets/mask (reference
    ``deform_conv.py:422-457``): a regular conv (zero-initialised,
    ``init_offset:335-339``) produces [2*K*K offsets, K*K mask-logits]."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1  # API parity; groups=1 supported
    warp_band: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = self.kernel_size
        off_mask = nn.Conv(
            3 * K * K, (K, K), strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset")(x)
        offset = off_mask[..., : 2 * K * K]
        mask = jax.nn.sigmoid(off_mask[..., 2 * K * K:])

        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (K, K, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return modulated_deform_conv(
            x, offset, mask, weight, bias, stride=self.stride,
            padding=self.padding, dilation=self.dilation,
            warp_band=self.warp_band)


class DeformConv(nn.Module):
    """DCN -> BN -> ReLU (reference ``dla_utils.py:40-55``)."""

    cho: int
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ModulatedDeformConvPack(self.cho, name="conv")(x)
        x = BatchNorm(frozen=self.norm_frozen, name="bn")(x, train)
        return jax.nn.relu(x)


def _bilinear_upsample_kernel(f: int, channels: int) -> np.ndarray:
    """Bilinear-interp deconv weights (reference ``fill_up_weights:27-36``);
    HWIO with feature_group_count=channels (I=1)."""
    k = f * 2
    c = (2 * math.ceil(k / 2) - 1 - (math.ceil(k / 2)) % 2) / (2.0 * math.ceil(k / 2))
    # reference: f = ceil(size/2); c = (2f-1-f%2)/(2f) with size = k
    fk = math.ceil(k / 2)
    c = (2 * fk - 1 - fk % 2) / (2.0 * fk)
    w1d = np.array([1 - abs(i / fk - c) for i in range(k)], dtype=np.float32)
    w2d = w1d[:, None] * w1d[None, :]
    w = np.zeros((k, k, 1, channels), dtype=np.float32)
    for ch in range(channels):
        w[:, :, 0, ch] = w2d
    return w


class _GroupedDeconvUp(nn.Module):
    """Fixed bilinear grouped ConvTranspose x``f`` (reference ``IDAUp.up``)."""

    channels: int
    f: int

    @nn.compact
    def __call__(self, x):
        f = self.f
        if f == 1:
            return x
        kernel = self.param(
            "kernel",
            lambda key: jnp.asarray(_bilinear_upsample_kernel(f, self.channels)))
        # grouped ConvTranspose(k=2f, s=f, p=f//2) == input-dilated depthwise
        # conv with padding (3f-2)/2 (bilinear kernel is symmetric, so no flip)
        p = (3 * f - 2) // 2
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=((p, p), (p, p)),
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.channels)


class IDAUp(nn.Module):
    """Iterative deep aggregation (reference ``dla_utils.py:57-84``)."""

    o: int
    channels: Sequence[int]
    up_f: Sequence[int]
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, layers, startp: int, endp: int, train: bool = True):
        layers = list(layers)
        for i in range(startp + 1, endp):
            idx = i - startp
            x = DeformConv(self.o, self.norm_frozen,
                           name=f"proj_{idx}")(layers[i], train)
            x = _GroupedDeconvUp(self.o, int(self.up_f[idx]),
                                 name=f"up_{idx}")(x)
            layers[i] = DeformConv(self.o, self.norm_frozen,
                                   name=f"node_{idx}")(
                x + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Full DLA upsampling pyramid (reference ``dla_utils.py:87-110``)."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, layers, train: bool = True):
        layers = list(layers)
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = np.array(self.scales, dtype=int)

        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            j = -i - 2
            layers_out = IDAUp(
                channels[j], in_channels[j:],
                list(scales[j:] // scales[j]), self.norm_frozen,
                name=f"ida_{i}")(layers, len(layers) - i - 2, len(layers),
                                 train)
            layers = layers_out
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j] for _ in channels[j + 1:]]
            out.insert(0, layers[-1])
        return out


class DLASegUpsample(nn.Module):
    """Standalone DLASeg/RTM3D upsampling head (reference ``dla_utils.py:124-153``)."""

    input_channels: Sequence[int]
    down_ratio: int = 4
    final_kernel: int = 1
    last_level: int = 5
    out_channel: int = 0
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, tensors, train: bool = True):
        assert self.down_ratio in (2, 4, 8, 16)
        first_level = int(np.log2(self.down_ratio))
        channels = list(self.input_channels)
        scales = [2 ** i for i in range(len(channels[first_level:]))]

        tensors = DLAUp(first_level, channels[first_level:], scales,
                        self.norm_frozen, name="dla_up")(tensors, train)

        out_channel = self.out_channel or channels[first_level]
        y = list(tensors[: self.last_level - first_level])
        y = IDAUp(out_channel, channels[first_level:self.last_level],
                  [2 ** i for i in range(self.last_level - first_level)],
                  self.norm_frozen, name="ida_up")(y, 0, len(y), train)
        return y[-1]
