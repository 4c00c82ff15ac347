"""Monodepth2-style U-Net depth decoders (flax.linen, NHWC).

Reference: ``monodepth/networks/models/heads/depth_encoder.py`` —
``DepthDecoder:17`` (sigmoid-disparity decode), ``MultiChannelDepthDecoder:114``
(softmax over log-spaced depth bins; the variant all wpose configs use) and
``MultiChannelDepthDecoderUncertain:142`` (adds a per-scale sigmoid
uncertainty head for the distill loss).

Output dict keys keep the reference's tuple-key protocol:
``('disp', s)``, ``('depth', s, s)``, ``('logits', s)``, ``('uncertain_z', s)``.
Tensors are NHWC; the "channel" bin axis is the trailing axis.

The full-scale ("fx-aware") trick: depth is multiplied by ``fx / base_fx``
taken from the camera matrix P2 (reference ``depth_encoder.py:36-43``), which
lets one network serve cameras with different focal lengths.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.depth_codec import build_depth_bins, gather_activation
from ...ops.geometry import depth_to_disp, disp_to_depth
from ..blocks import ConvBnReLU, pad2d, upsample2x_nearest

NUM_CH_DEC = (16, 32, 64, 128, 256)


def _replicate_pad_conv(features: int, name: str) -> nn.Module:
    """3x3 conv with replicate (edge) padding — the reference's
    ``padding_mode='replicate'`` dispconv (``depth_encoder.py:63``).

    Called with ``packed_C`` the input is width-packed and the conv runs as a
    block-Toeplitz MXU matmul; the output is then unpacked NHWC (the packed
    rep of [B, H, W, C] is a free reshape). Parameters are identical either
    way."""

    class _RepConv(nn.Module):
        @nn.compact
        def __call__(self, x, packed_C: Optional[int] = None):
            from ...ops import fast_conv as fc

            if packed_C is not None:
                P_out = max(128 // features, 1)
                W_tot = x.shape[2] * (x.shape[3] // packed_C)
                if W_tot % P_out == 0:
                    from ..blocks import _ConvParams

                    k, b = _ConvParams(features, packed_C, name="conv")()
                    out = fc.conv3x3_packed(x, k, b, C=packed_C,
                                            pad_mode="replicate")
                    return fc.unpack_width(out, features)
                x = fc.unpack_width(x, packed_C)   # free reshape fallback
            x = pad2d(x, 1, "edge")
            return nn.Conv(features, (3, 3), padding="VALID", name="conv")(x)

    return _RepConv(name=name)


def _use_packed_trunk(packed: Optional[bool], input_features) -> bool:
    """Resolve the packed-layout switch: explicit flag wins; ``None`` enables
    it on TPU backends when the fine-stage widths are lane-packable.

    The gate simulates the trunk loop's actual widths stage by stage (rather
    than assuming ``input_features[0]`` sits at stride 2): every packed stage
    (channels <= 64) convolves at pack factor ``P = max(128 // ch, 1)``, so
    its conv input width and the skip width it concatenates must divide P."""
    if packed is not None:
        return packed
    import jax as _jax

    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    w = input_features[-1].shape[2]
    for i in range(4, -1, -1):
        ch = NUM_CH_DEC[i]
        P = max(128 // ch, 1)
        if ch <= 64 and w % P != 0:
            return False          # conv0 input at this stage
        w *= 2                    # nearest-upsample before conv1 / skip concat
        if i > 0:
            skip_w = input_features[i - 1].shape[2]
            if skip_w != w:
                return False      # concat widths disagree; keep native path
            if ch <= 64 and skip_w % P != 0:
                return False
    return True


class _DecoderTrunk(nn.Module):
    """The 5-stage up-conv trunk shared by all decoder variants
    (reference ``depth_encoder.py:90-111`` loop). Yields per-stage feature maps
    for stages listed in ``scales``.

    ``packed`` selects the TPU width-packed layout for the fine stages
    (channels <= 64): every tensor keeps P*C >= 128 channels-minor so the
    small-channel convs/BN/concats run lane-full (XLA's native path wastes
    ~8x bandwidth there — see BASELINE.md). Parameters and math are identical;
    when enabled, returned stage feature maps are packed tensors
    [B, H_s, W_s/P, P*C] (a free reshape of NHWC). ``None`` = auto on TPU."""

    scales: Sequence[int]
    use_skips: bool = True
    norm_axis_name: Optional[str] = None
    packed: Optional[bool] = None

    @nn.compact
    def __call__(self, input_features, train: bool = True):
        from ...ops import fast_conv as fc

        packed = _use_packed_trunk(self.packed, input_features)
        stage_feats = {}
        x = input_features[-1]
        xC = x.shape[-1]
        is_packed = False
        for i in range(4, -1, -1):
            ch = NUM_CH_DEC[i]
            pack_here = packed and ch <= 64
            conv0 = ConvBnReLU(output_features=ch, kernel_size=(3, 3),
                               norm_axis_name=self.norm_axis_name,
                               name=f"upconv_{i}_0")
            if pack_here and not is_packed:
                x = fc.pack_width(x, 1)
                is_packed = True
            x = conv0(x, train, packed_C=xC if is_packed else None)
            xC = ch
            if is_packed:
                x = fc.upsample2x_packed(x, xC)
            else:
                x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                skip = input_features[i - 1]
                sC = skip.shape[-1]
                if is_packed:
                    # no materialized concat: the packed conv takes the
                    # parts and fuses the channel-concat into its columns
                    x = (x, fc.pack_width(skip, 1))
                    xC = (xC, sC)
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
                    xC = xC + sC
            conv1 = ConvBnReLU(output_features=ch, kernel_size=(3, 3),
                               padding_mode="replicate",
                               norm_axis_name=self.norm_axis_name,
                               name=f"upconv_{i}_1")
            x = conv1(x, train, packed_C=xC if is_packed else None)
            xC = ch
            if i in self.scales:
                stage_feats[i] = (x, xC) if is_packed else x
        return stage_feats


def _apply_dispconv(conv, feat):
    """Apply a dispconv to a trunk stage output, which is either NHWC or a
    (packed_tensor, C) pair from the packed trunk."""
    if isinstance(feat, tuple):
        return conv(feat[0], packed_C=feat[1])
    return conv(feat)


def _get_scale(P2: Optional[jnp.ndarray], base_fx: Optional[float]):
    """fx-aware depth scale [B,1,1,1] or 1 (reference ``depth_encoder.py:36-43``)."""
    if base_fx is None or P2 is None:
        return 1.0
    input_fx = P2[:, 0, 0]
    return (input_fx / base_fx).reshape(-1, 1, 1, 1)


class DepthDecoder(nn.Module):
    """Sigmoid-disparity variant (ref ``DepthDecoder``, ``depth_encoder.py:17-111``)."""

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)  # API parity (inferred)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    min_depth: float = 0.1
    max_depth: float = 100.0
    base_fx: Optional[float] = None
    norm_axis_name: Optional[str] = None
    packed: Optional[bool] = None

    @nn.compact
    def __call__(self, input_features, P2=None, train: bool = True):
        outputs = {}
        depth_scale = _get_scale(P2, self.base_fx)
        feats = _DecoderTrunk(self.scales, self.use_skips, self.norm_axis_name,
                              self.packed,
                              name="trunk")(input_features, train)
        for i in self.scales:
            logits = _apply_dispconv(
                _replicate_pad_conv(self.num_output_channels,
                                    name=f"dispconv_{i}"), feats[i])
            outputs[("logits", i)] = logits
            disp = jax.nn.sigmoid(logits)
            outputs[("disp", i)] = disp
            _, depth = disp_to_depth(disp, self.min_depth, self.max_depth)
            outputs[("depth", i, i)] = depth * depth_scale
        return outputs


class MultiChannelDepthDecoder(nn.Module):
    """Softmax-over-depth-bins variant (reference ``MultiChannelDepthDecoder``,
    ``depth_encoder.py:114-139``) — the flagship wpose decoder."""

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 16
    use_skips: bool = True
    min_depth: float = 0.1
    max_depth: float = 100.0
    base_fx: Optional[float] = None
    norm_axis_name: Optional[str] = None
    packed: Optional[bool] = None

    def setup(self):
        self.depth_bins = jnp.asarray(
            build_depth_bins(self.min_depth, self.max_depth,
                             self.num_output_channels))
        self.trunk = _DecoderTrunk(self.scales, self.use_skips,
                                   self.norm_axis_name, self.packed,
                                   name="trunk")
        self.dispconvs = {
            str(i): _replicate_pad_conv(self.num_output_channels,
                                        name=f"dispconv_{i}")
            for i in self.scales
        }

    def gather_output(self, output_logits, depth_scale):
        """Bins -> (depth, disp) with fx-aware min/max (reference
        ``depth_encoder.py:115-121``)."""
        depth = gather_activation(output_logits, self.depth_bins)
        if self.base_fx is not None:
            depth = depth * depth_scale
        disp = depth_to_disp(depth, self.min_depth * depth_scale,
                             self.max_depth * depth_scale)
        return depth, disp

    def __call__(self, input_features, P2=None, train: bool = True):
        outputs = {}
        depth_scale = _get_scale(P2, self.base_fx)
        feats = self.trunk(input_features, train)
        for i in self.scales:
            logits = _apply_dispconv(self.dispconvs[str(i)], feats[i])
            outputs[("logits", i)] = logits
            outputs[("depth", i, i)], outputs[("disp", i)] = self.gather_output(
                logits, depth_scale)
        return outputs


class MultiChannelDepthDecoderUncertain(nn.Module):
    """MultiChannel variant plus per-scale sigmoid uncertainty ``('uncertain_z', s)``
    (reference ``MultiChannelDepthDecoderUncertain``, ``depth_encoder.py:142-194``)."""

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 16
    use_skips: bool = True
    min_depth: float = 0.1
    max_depth: float = 100.0
    base_fx: Optional[float] = None
    norm_axis_name: Optional[str] = None
    packed: Optional[bool] = None

    def setup(self):
        self.depth_bins = jnp.asarray(
            build_depth_bins(self.min_depth, self.max_depth,
                             self.num_output_channels))
        self.trunk = _DecoderTrunk(self.scales, self.use_skips,
                                   self.norm_axis_name, self.packed,
                                   name="trunk")
        self.dispconvs = {
            str(i): _replicate_pad_conv(self.num_output_channels,
                                        name=f"dispconv_{i}")
            for i in self.scales
        }
        self.uncertain_convs = {
            str(i): _replicate_pad_conv(1, name=f"uncertain_logz_{i}")
            for i in self.scales
        }

    def __call__(self, input_features, P2=None, train: bool = True):
        outputs = {}
        depth_scale = _get_scale(P2, self.base_fx)
        feats = self.trunk(input_features, train)
        for i in self.scales:
            x = feats[i]
            depth = gather_activation(_apply_dispconv(self.dispconvs[str(i)], x),
                                      self.depth_bins)
            depth = depth * depth_scale
            outputs[("depth", i, i)] = depth
            outputs[("disp", i)] = depth_to_disp(
                depth, self.min_depth * depth_scale, self.max_depth * depth_scale)
            outputs[("uncertain_z", i)] = jax.nn.sigmoid(
                _apply_dispconv(self.uncertain_convs[str(i)], x))
        return outputs
