"""Extended blocks library: losses, FPN variants, ASPP, 3D cost-volume
regularizer, RAFT-style convex upsampling.

Reference: ``vision_base/networks/blocks/blocks.py`` — ``FocalLoss:137``,
``ModifiedSmoothedL1:157``, ``UpsampleFPN:180``, ``PyramidFeatures:217``,
``ASPP:263``, ``ConvBnReLU3D:306``, ``reg3d:315``, ``localmax:370``,
``convex_upsample_layer:386`` / ``convex_upsample:402``.

All NHWC / NDHWC; 3D convs carry features last ([B, D, H, W, C]).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import BatchNorm, upsample2x_nearest


# ----------------------------------------------------------------------- losses

def focal_loss(scores: jnp.ndarray, probs: jnp.ndarray, targets: jnp.ndarray,
               alpha: float, weights: Optional[jnp.ndarray] = None):
    """Probability-weighted CE (reference ``FocalLoss:137-155``).
    ``scores`` [N, 2] logits, ``probs`` [N, 2], ``targets`` [N] in {0, 1}.
    Returns (mean loss, label_weights)."""
    label_weights = jnp.ones_like(scores[:, 0])
    label_weights = jnp.where(targets == 0, probs[:, 0] ** alpha, label_weights)
    label_weights = jnp.where(targets == 1, probs[:, 1] ** alpha, label_weights)

    log_probs = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    if weights is not None:
        ce = ce * weights[targets]
    return jnp.mean(ce * label_weights), label_weights


def modified_smoothed_l1(deltas: jnp.ndarray, targets: jnp.ndarray,
                         sigma: float) -> jnp.ndarray:
    """Per-element smooth-L1 with the reference's (one-sided) switch condition
    kept verbatim (``ModifiedSmoothedL1:157-178``)."""
    sigma2 = sigma * sigma
    diffs = deltas - targets
    option1 = diffs * diffs * 0.5 * sigma2
    option2 = jnp.abs(diffs) - 0.5 / sigma2
    cond1 = (diffs < (1.0 / sigma2)).astype(deltas.dtype)
    return option1 * cond1 + option2 * (1 - cond1)


# ------------------------------------------------------------------------- FPNs

class UpsampleFPN(nn.Module):
    """RetinaNet-style top-down merge returning only P3
    (reference ``UpsampleFPN:180-215``)."""

    C3_size: int = 0
    C4_size: int = 0
    C5_size: int = 0
    feature_size: int = 256

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        C3, C4, C5 = inputs
        P5 = nn.Conv(self.feature_size, (1, 1), name="P5_1")(C5)
        P4 = nn.Conv(self.feature_size, (1, 1), name="P4_1")(C4)
        P4 = P4 + upsample2x_nearest(P5)
        P3 = nn.Conv(self.feature_size, (1, 1), name="P3_1")(C3)
        P3 = P3 + upsample2x_nearest(P4)
        P3 = nn.Conv(self.feature_size, (3, 3), padding=((1, 1), (1, 1)),
                     name="P3_2")(P3)
        return [P3]


class PyramidFeatures(nn.Module):
    """Full RetinaNet FPN P3..P6 (reference ``PyramidFeatures:217-261``)."""

    C3_size: int = 0
    C4_size: int = 0
    C5_size: int = 0
    feature_size: int = 256

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        C3, C4, C5 = inputs
        p = ((1, 1), (1, 1))
        P5x = nn.Conv(self.feature_size, (1, 1), name="P5_1")(C5)
        P5_up = upsample2x_nearest(P5x)
        P5 = nn.Conv(self.feature_size, (3, 3), padding=p, name="P5_2")(P5x)

        P4x = nn.Conv(self.feature_size, (1, 1), name="P4_1")(C4) + P5_up
        P4_up = upsample2x_nearest(P4x)
        P4 = nn.Conv(self.feature_size, (3, 3), padding=p, name="P4_2")(P4x)

        P3x = nn.Conv(self.feature_size, (1, 1), name="P3_1")(C3) + P4_up
        P3 = nn.Conv(self.feature_size, (3, 3), padding=p, name="P3_2")(P3x)

        P6 = nn.Conv(self.feature_size, (3, 3), strides=(2, 2), padding=p,
                     name="P6")(C5)
        return [P3, P4, P5, P6]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling head (reference ``ASPP:263-304``)."""

    C: int = 0
    depth: int = 256
    num_classes: int = 1
    mult: float = 1.0
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        outs = []
        for i, dilation in enumerate([1, int(6 * self.mult),
                                      int(12 * self.mult),
                                      int(18 * self.mult)]):
            k = (1, 1) if i == 0 else (3, 3)
            pad = 0 if i == 0 else dilation
            h = nn.Conv(self.depth, k, padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(dilation, dilation), use_bias=False,
                        name=f"aspp{i + 1}")(x)
            h = BatchNorm(axis_name=self.norm_axis_name,
                          name=f"aspp{i + 1}_bn")(h, train)
            outs.append(jax.nn.relu(h))
        x = jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv2")(x)


# ------------------------------------------------------------- 3D cost volumes

class ConvBnReLU3D(nn.Module):
    """3D conv -> BN -> ReLU on [B, D, H, W, C] (reference ``ConvBnReLU3D:306-313``)."""

    in_channels: int = 0
    out_channels: int = 8
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        k, s, p = self.kernel_size, self.stride, self.pad
        x = nn.Conv(self.out_channels, (k, k, k), strides=(s, s, s),
                    padding=((p, p), (p, p), (p, p)), use_bias=False,
                    name="conv")(x)
        x = BatchNorm(axis_name=self.norm_axis_name, name="bn")(x, train)
        return jax.nn.relu(x)


class _Deconv3D(nn.Module):
    out_channels: int = 8
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch ConvTranspose3d(k3, s2, p1, output_padding=1) == exact 2x
        # upsample; flax 'SAME' padding on ConvTranspose gives the same shape
        x = nn.ConvTranspose(self.out_channels, (3, 3, 3), strides=(2, 2, 2),
                             padding="SAME", use_bias=False,
                             transpose_kernel=True, name="deconv")(x)
        x = BatchNorm(axis_name=self.norm_axis_name, name="bn")(x, train)
        return jax.nn.relu(x)


class Reg3D(nn.Module):
    """3D cost-volume regularizer U-Net (reference ``reg3d:315-368``).
    Input [B, D, H, W, C]; output [B, D, H, W] logits."""

    in_channels: int = 0
    base_channels: int = 8
    down_size: int = 3
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        bc = self.base_channels
        conv0 = ConvBnReLU3D(out_channels=bc, name="conv0")(x, train)
        conv2 = ConvBnReLU3D(out_channels=bc * 2, name="conv2")(
            ConvBnReLU3D(out_channels=bc * 2, stride=2, name="conv1")(
                conv0, train), train)
        if self.down_size >= 2:
            conv4 = ConvBnReLU3D(out_channels=bc * 4, name="conv4")(
                ConvBnReLU3D(out_channels=bc * 4, stride=2, name="conv3")(
                    conv2, train), train)
        if self.down_size >= 3:
            h = ConvBnReLU3D(out_channels=bc * 8, name="conv6")(
                ConvBnReLU3D(out_channels=bc * 8, stride=2, name="conv5")(
                    conv4, train), train)
            h = conv4 + _Deconv3D(out_channels=bc * 4, name="conv7")(h, train)
            h = conv2 + _Deconv3D(out_channels=bc * 2, name="conv9")(h, train)
            h = conv0 + _Deconv3D(out_channels=bc, name="conv11")(h, train)
        elif self.down_size == 2:
            h = conv2 + _Deconv3D(out_channels=bc * 2, name="conv9")(conv4, train)
            h = conv0 + _Deconv3D(out_channels=bc, name="conv11")(h, train)
        else:
            h = conv0 + _Deconv3D(out_channels=bc, name="conv11")(conv2, train)
        h = nn.Conv(1, (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)),
                    use_bias=False, name="prob")(h)
        return h[..., 0]


def localmax(cost_prob: jnp.ndarray, radius: int, casbin: int,
             depth_bins: jnp.ndarray) -> jnp.ndarray:
    """Local-window softmax-expectation decode around the argmax bin
    (reference ``localmax:370-384``). ``cost_prob`` [B, H, W, D] (bins last),
    ``depth_bins`` [B, H, W, D] or broadcastable. Returns [B, H, W, 1]."""
    pred_idx = jnp.argmax(cost_prob, axis=-1, keepdims=True)  # [B, H, W, 1]
    offsets = jnp.arange(2 * radius + 1) - radius
    idx = jnp.clip(pred_idx + offsets.reshape(1, 1, 1, -1), 0, casbin - 1)

    bins = jnp.broadcast_to(depth_bins, cost_prob.shape)
    prob_sel = jnp.take_along_axis(cost_prob, idx, axis=-1)
    bins_sel = jnp.take_along_axis(bins, idx, axis=-1)
    depth = jnp.sum(bins_sel * prob_sel, axis=-1, keepdims=True)
    return depth / (jnp.sum(prob_sel, axis=-1, keepdims=True) + 1e-6)


# ------------------------------------------------------------- convex upsample

def _unfold3x3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 1] -> [B, H, W, 9] of reflect-padded 3x3 neighborhoods."""
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)), mode="reflect")
    patches = [xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2]]
               for dy in range(3) for dx in range(3)]
    return jnp.stack(patches, axis=-1)


def convex_upsample(depth: jnp.ndarray, mask: jnp.ndarray,
                    scale: int = 2) -> jnp.ndarray:
    """RAFT-style learned upsampling (reference ``convex_upsample:402-416``).
    ``depth`` [B, H, W] or [B, H, W, 1]; ``mask`` [B, H, W, 9*(2^scale)^2].
    Returns [B, H*2^scale, W*2^scale]."""
    if depth.ndim == 3:
        depth = depth[..., None]
    B, H, W, _ = depth.shape
    up = 2 ** scale
    mask = mask.reshape(B, H, W, 9, up, up)
    mask = jax.nn.softmax(mask, axis=3)

    patches = _unfold3x3_reflect(depth)  # [B, H, W, 9]
    out = jnp.einsum("bhwk,bhwkuv->bhwuv", patches, mask)  # [B, H, W, up, up]
    out = out.transpose(0, 1, 3, 2, 4)  # B H u W v
    return out.reshape(B, H * up, W * up)


class ConvexUpsampleLayer(nn.Module):
    """Mask-predicting head + convex upsample
    (reference ``convex_upsample_layer:386-400``)."""

    feature_dim: int = 0
    scale: int = 2

    @nn.compact
    def __call__(self, depth: jnp.ndarray, feat: jnp.ndarray):
        h = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="mask_conv1")(feat)
        h = jax.nn.relu(h)
        mask = nn.Conv((2 ** self.scale) ** 2 * 9, (1, 1), use_bias=False,
                       name="mask_conv2")(h)
        return convex_upsample(depth, mask, self.scale)
