"""ResNet-{18,34,50,101,152} multi-scale feature backbone (flax.linen, NHWC).

Feature-parity with the reference backbone
(``vision_base/networks/models/backbone/resnet.py``): multi-scale
``out_indices`` incl. the stem (-1), per-stage strides/dilations,
``frozen_stages`` (handled functionally: parameters are masked out of the
optimizer update, see ``runtime/optim.py``), ``norm_eval`` frozen-BN-stats
mode (``resnet.py:169-196``), and ``num_input_images`` for the 6-channel pose
encoder input (``resnet.py:116,155-160``; pretrained conv1 weights are
replicated/averaged by the torch-checkpoint converter,
``fsnet_tpu/models/torch_convert.py``).

TPU-first notes: NHWC layout; explicit torch-style paddings (XLA 'SAME'
differs for stride 2); BN supports a cross-replica ``axis_name`` (SyncBN).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..blocks import BatchNorm, max_pool_3x3_s2_p1

_LAYERS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

PLANES = (64, 128, 256, 512)


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          name: Optional[str] = None) -> nn.Conv:
    pad = dilation if kernel == 3 else (3 if kernel == 7 else 0)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation),
                   use_bias=False, name=name)


import os as _os

#: Space-to-depth stem dispatch (TPU backends): the 7x7/s2 conv on C=3 (or
#: 6, pose) input uses ~2% of the MXU's 128-channel contraction — and its
#: stride-2 small-C backward is worse. Regrouping 2x2 pixel blocks into
#: channels turns it into an EXACT 4x4/s1 conv at 4x the channel depth
#: (MLPerf-style resnet stem). Params stay the canonical [7,7,C,64] kernel
#: (checkpoint-compatible); the weight regroup is a trace-time reshape.
S2D_STEM = _os.environ.get("FSNET_S2D_STEM", "1") != "0"


def _stem_kernel_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """[7, 7, C, Co] stem kernel -> [4, 4, 4C, Co] space-to-depth kernel.

    out[i,j] = sum_{dy,dx} w[dy,dx] x[2i+dy-3, 2j+dx-3]; writing
    dy-3 = 2a+p (p in {0,1}) gives taps a in [-2,1] over the s2d grid with
    input channel (p,q,c). (a=-2, p=0) maps to dy=-1: no source tap, zero."""
    C, Co = w.shape[2], w.shape[3]
    w4 = jnp.zeros((4, 4, 2, 2, C, Co), w.dtype)
    for a in range(-2, 2):
        for p in (0, 1):
            dy = 2 * a + p + 3
            if not 0 <= dy < 7:
                continue
            for b in range(-2, 2):
                for q in (0, 1):
                    dx = 2 * b + q + 3
                    if not 0 <= dx < 7:
                        continue
                    w4 = w4.at[a + 2, b + 2, p, q].set(w[dy, dx])
    return w4.reshape(4, 4, 4 * C, Co)


def _space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (p, q, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W // 2, 4 * C)


class StemConv(nn.Module):
    """7x7/s2 stem conv owning the canonical [7, 7, C, 64] kernel, dispatched
    as the exact space-to-depth 4x4/s1 form on TPU backends (even H, W)."""

    features: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, C, self.features), jnp.float32)
        kernel = kernel.astype(x.dtype)
        if (S2D_STEM and jax.default_backend() in ("tpu", "axon")
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            return jax.lax.conv_general_dilated(
                _space_to_depth2(x), _stem_kernel_to_s2d(kernel),
                window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection residual (reference ``resnet.py:21-50``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    norm_axis_name: Optional[str] = None
    norm_frozen: bool = False

    expansion = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = lambda name: BatchNorm(axis_name=self.norm_axis_name,  # noqa: E731
                                    frozen=self.norm_frozen, name=name)
        residual = x
        out = _conv(self.planes, 3, self.stride, name="conv1")(x)
        out = bn("bn1")(out, train)
        out = jax.nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, name="conv2")(out)
        out = bn("bn2")(out, train)
        if self.has_downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, train)
        return jax.nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck residual (reference ``resnet.py:53-90``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    norm_axis_name: Optional[str] = None
    norm_frozen: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = lambda name: BatchNorm(axis_name=self.norm_axis_name,  # noqa: E731
                                    frozen=self.norm_frozen, name=name)
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(bn("bn1")(out, train))
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2")(out)
        out = jax.nn.relu(bn("bn2")(out, train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out, train)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, train)
        return jax.nn.relu(out + residual)


class ResNet(nn.Module):
    """Multi-scale ResNet feature extractor (reference ``resnet.py:93-213``).

    Returns a list of NHWC feature maps selected by ``out_indices``
    (-1 = post-stem pre-maxpool activation, 0..3 = stage outputs).
    """

    block_type: str = "basic"          # 'basic' | 'bottleneck'
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    num_stages: int = 4
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    out_indices: Tuple[int, ...] = (-1, 0, 1, 2, 3)
    frozen_stages: int = -1            # consumed by the optimizer mask
    norm_eval: bool = True
    num_input_images: int = 1          # API parity; input channels are inferred
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        assert 1 <= self.num_stages <= 4
        assert max(self.out_indices) < self.num_stages
        block_cls = BasicBlock if self.block_type == "basic" else Bottleneck
        expansion = block_cls.expansion
        frozen = self.norm_eval  # norm_eval freezes BN stats even in training

        outs = []
        x = self._stem_conv(x)
        Cs = x.shape[-1]
        if (jax.default_backend() in ("tpu", "axon")
                and x.shape[2] % 2 == 0 and 2 * Cs == 128):
            # lane-full stem BN+ReLU: the [B, H, W, 64] stem stage uses 64
            # of 128 lanes on every elementwise/BN op in NHWC; the width-
            # packed view [B, H, W/2, 128] (a free reshape) runs the
            # moments + normalize + relu lane-full. Parameters/stat names
            # are identical (BatchNorm packed_C path).
            from ...ops import fast_conv as fc

            xp = fc.pack_width(x, 2)
            xp = BatchNorm(axis_name=self.norm_axis_name, frozen=frozen,
                           name="bn1")(xp, train, packed_C=Cs)
            x = fc.unpack_width(jax.nn.relu(xp), Cs)
        else:
            x = BatchNorm(axis_name=self.norm_axis_name, frozen=frozen,
                          name="bn1")(x, train)
            x = jax.nn.relu(x)
        if -1 in self.out_indices:
            outs.append(x)
        x = max_pool_3x3_s2_p1(x)

        inplanes = 64
        for i in range(self.num_stages):
            planes = PLANES[i]
            stride = self.strides[i]
            dilation = self.dilations[i]
            for b in range(self.layers[i]):
                # torch quirk kept for weight parity: the first block of a
                # stage always runs dilation 1 (reference resnet.py:147-151)
                has_ds = b == 0 and (stride != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=1 if b == 0 else dilation,
                    has_downsample=has_ds,
                    norm_axis_name=self.norm_axis_name,
                    norm_frozen=frozen,
                    name=f"layer{i + 1}_{b}",
                )(x, train)
                inplanes = planes * expansion
            if i in self.out_indices:
                outs.append(x)
        return outs

    def _stem_conv(self, x: jnp.ndarray) -> jnp.ndarray:
        """7x7 stride-2 stem; on TPU backends dispatched as the exact
        space-to-depth 4x4/s1 form (:class:`StemConv`, FSNET_S2D_STEM).
        A W-minor matmul reformulation was also tried
        (:func:`fsnet_tpu.ops.fast_conv.conv7x7s2`, exact) but benched
        SLOWER end-to-end (166.3 -> 153.6 imgs/s — its backward scatters
        through 63 window pieces), so it is not dispatched; see
        BASELINE.md."""
        return StemConv(64, name="conv1")(x)


def resnet(depth: int, pretrained: bool = False, pretrained_path: str = "",
           **kwargs) -> ResNet:
    """Config-facing factory (reference ``resnet.py:270-284``).

    ``pretrained`` weight loading is decoupled from module construction in the
    functional paradigm: pass ``pretrained_path`` (a torchvision ``.pth``) to
    the checkpoint loader (``fsnet_tpu.models.torch_convert.load_torch_resnet``)
    at init time — the zero-egress build cannot download model-zoo weights.
    """
    if depth not in _LAYERS:
        raise ValueError(
            "Unsupported model depth, must be one of 18, 34, 50, 101, 152")
    block_type, layers = _LAYERS[depth]
    kwargs.pop("pretrained", None)
    # drop torch-only kwargs accepted for config compatibility
    for legacy in ("pretrained_backbone",):
        kwargs.pop(legacy, None)
    return ResNet(block_type=block_type, layers=layers, **kwargs)
