"""ManyDepth-style cost-volume ResNet encoder (flax.linen, NHWC).

Reference: ``monodepth/networks/models/backbone/resnet_matching.py`` —
``ResnetEncoderMatching:8``: ResNet feature extraction (first 2 blocks),
plane-sweep warping of lookup frames over ``num_depth_bins`` hypothesised
depths (``match_features:83-173``), edge masking, missing-value fill,
confidence mask (``compute_confidence_mask:195-202``), ``reduce_conv`` fusion,
adaptive bins.

TPU-first redesign: the reference loops over the batch in python and computes
``inv_K`` with a CPU ``np.linalg.pinv`` per call (``:100-104``); here the
whole (batch x lookup-frame x depth-bin) sweep is one batched band-warp +
reduction, and the pose==0 "missing frame" skip becomes a multiplicative mask.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.geometry import invert_K, make_K44, reproject
from ...ops.warp_fast import grid_sample
from ..blocks import BatchNorm, max_pool_3x3_s2_p1
from .resnet import _LAYERS, PLANES, BasicBlock, Bottleneck, _conv


class ResnetEncoderMatching(nn.Module):
    """Reference ``ResnetEncoderMatching:8-268``."""

    depth: int = 18
    pretrained: bool = False  # API parity; weights via torch_convert
    input_height: int = 192
    input_width: int = 640
    min_depth_bin: float = 0.1
    max_depth_bin: float = 20.0
    num_depth_bins: int = 96
    adaptive_bins: bool = False
    depth_binning: str = "linear"
    norm_eval: bool = False
    norm_axis_name: Optional[str] = None
    warp_band: int = 24

    @property
    def num_ch_enc(self):
        ch = np.array([64, 64, 128, 256, 512])
        if self.depth > 34:
            ch[1:] *= 4
        return ch

    def setup(self):
        block_type, layers = _LAYERS[self.depth]
        self._block_cls = BasicBlock if block_type == "basic" else Bottleneck
        self._layers = layers
        self.matching_height = self.input_height // 4
        self.matching_width = self.input_width // 4

        # stage modules (mirrors resnet.py naming for weight conversion)
        expansion = self._block_cls.expansion
        blocks = {}
        inplanes = 64
        for i in range(4):
            planes = PLANES[i]
            stride = 1 if i == 0 else 2
            for b in range(layers[i]):
                has_ds = b == 0 and (stride != 1 or inplanes != planes * expansion)
                blocks[f"layer{i + 1}_{b}"] = self._block_cls(
                    planes=planes, stride=stride if b == 0 else 1,
                    has_downsample=has_ds, norm_axis_name=self.norm_axis_name,
                    norm_frozen=self.norm_eval, name=f"layer{i + 1}_{b}")
                inplanes = planes * expansion
        self.blocks = blocks
        self.conv1 = _conv(64, 7, 2, name="conv1")
        self.bn1 = BatchNorm(axis_name=self.norm_axis_name,
                             frozen=self.norm_eval, name="bn1")

        self.prematching_conv = nn.Conv(16, (1, 1), name="prematching_conv")
        self.reduce_conv = nn.Conv(
            int(self.num_ch_enc[1]), (3, 3), padding=((1, 1), (1, 1)),
            name="reduce_conv")

    # ----------------------------------------------------------------- stages

    def _stage(self, x, stage: int, train: bool):
        for b in range(self._layers[stage - 1]):
            x = self.blocks[f"layer{stage}_{b}"](x, train)
        return x

    def feature_extraction(self, image, train: bool = True,
                           return_all_feats: bool = False):
        """First 2 blocks with the reference's fixed imagenet normalisation
        (``resnet_matching.py:175-186``)."""
        image = (image - 0.45) / 0.225
        feats_0 = jax.nn.relu(self.bn1(self.conv1(image), train))
        feats_1 = self._stage(max_pool_3x3_s2_p1(feats_0), 1, train)
        if return_all_feats:
            return [feats_0, feats_1]
        return feats_1

    def compute_depth_bins(self, min_depth_bin, max_depth_bin):
        """Linear or inverse-linear depth hypotheses (``:59-80``); traced-safe."""
        t = jnp.linspace(0.0, 1.0, self.num_depth_bins)
        if self.depth_binning == "inverse":
            inv = 1.0 / max_depth_bin + t * (1.0 / min_depth_bin
                                             - 1.0 / max_depth_bin)
            return (1.0 / inv)[::-1]
        if self.depth_binning == "linear":
            return min_depth_bin + t * (max_depth_bin - min_depth_bin)
        raise NotImplementedError(self.depth_binning)

    # ------------------------------------------------------------ cost volume

    def match_features(self, current_feats, lookup_feats, relative_poses, P2,
                       depth_bins):
        """Batched plane-sweep cost volume (reference ``match_features:83-173``).

        current_feats [B, h, w, C]; lookup_feats [B, F, h, w, C];
        relative_poses [B, F, 4, 4]. Returns (cost_volume [B, h, w, D],
        missing_mask [B, h, w, D]).
        """
        B, h, w, C = current_feats.shape
        F = lookup_feats.shape[1]
        D = self.num_depth_bins

        K = make_K44(P2)
        inv_K = invert_K(K)

        # grids for all (D, B, F): depth plane d constant over the image
        warp_depths = jnp.broadcast_to(
            depth_bins[:, None, None, None, None], (D, B, h, w, 1))

        def grid_for_depth(depth_plane):   # [B, h, w, 1]
            def grid_for_frame(T_f):       # [B, 4, 4]
                return reproject(depth_plane, K, inv_K, T_f)
            return jax.vmap(grid_for_frame)(
                jnp.moveaxis(relative_poses, 1, 0))  # [F, B, h, w, 2]

        grids = jax.vmap(grid_for_depth)(warp_depths)  # [D, F, B, h, w, 2]

        lookup = jnp.moveaxis(lookup_feats, 1, 0)      # [F, B, h, w, C]
        lookup_flat = lookup.reshape(F * B, h, w, C)

        # lax.map over depth hypotheses bounds peak memory (D x [F*B] warps)
        def warp_bin(grids_d):
            return grid_sample(lookup_flat, grids_d.reshape(F * B, h, w, 2),
                               mode="bilinear", padding_mode="zeros",
                               align_corners=True, band=self.warp_band)

        warped = jax.lax.map(warp_bin, grids).reshape(D, F, B, h, w, C)

        # edge masks (reference :141-155)
        x_vals = (grids[..., 0] / 2 + 0.5) * (w - 1)
        y_vals = (grids[..., 1] / 2 + 0.5) * (h - 1)
        edge_mask = ((x_vals >= 2.0) & (x_vals <= w - 2)
                     & (y_vals >= 2.0) & (y_vals <= h - 2))
        current_mask = jnp.zeros((h, w), bool).at[2:-2, 2:-2].set(True)
        edge_mask = (edge_mask & current_mask[None, None, None]).astype(
            current_feats.dtype)

        # missing lookup frames: pose sum == 0 (reference :127-129)
        frame_ok = (jnp.sum(jnp.abs(relative_poses), axis=(2, 3)) != 0
                    ).astype(current_feats.dtype)  # [B, F]
        frame_ok = jnp.moveaxis(frame_ok, 1, 0)[None, :, :, None, None]

        diffs = jnp.mean(jnp.abs(
            warped - jax.lax.stop_gradient(current_feats)[None, None]),
            axis=-1) * edge_mask * frame_ok  # [D, F, B, h, w]

        cost = jnp.sum(diffs, axis=1)
        counts = jnp.sum((diffs > 0).astype(cost.dtype), axis=1)
        cost = cost / (counts + 1e-7)                  # [D, B, h, w]

        missing = (cost == 0).astype(cost.dtype)
        cost = (cost * (1 - missing)
                + jnp.max(cost, axis=0, keepdims=True) * missing)

        # to NHWC-with-bins-last
        cost = jnp.moveaxis(cost, 0, -1)               # [B, h, w, D]
        missing = jnp.moveaxis(missing, 0, -1)
        return cost, missing

    def compute_confidence_mask(self, cost_volume, num_bins_threshold=None):
        """Fraction-of-bins-observed mask (reference ``:195-202``); bins last."""
        if num_bins_threshold is None:
            num_bins_threshold = self.num_depth_bins
        observed = jnp.sum((cost_volume > 0).astype(cost_volume.dtype), axis=-1)
        return (observed == num_bins_threshold).astype(cost_volume.dtype)

    def indices_to_disparity(self, indices, depth_bins):
        """argmin bin -> 1/depth for visualisation (reference ``:188-194``)."""
        return 1.0 / depth_bins[indices]

    def __call__(self, current_image, lookup_images, poses, P2,
                 min_depth_bin=None, max_depth_bin=None, train: bool = True):
        """``lookup_images`` [B, F, H, W, 3]; returns
        (features list, lowest_cost disparity [B, h, w], confidence_mask)."""
        features = self.feature_extraction(current_image, train,
                                           return_all_feats=True)
        current_feats = features[-1]

        if self.adaptive_bins:
            depth_bins = self.compute_depth_bins(min_depth_bin, max_depth_bin)
        else:
            depth_bins = self.compute_depth_bins(self.min_depth_bin,
                                                 self.max_depth_bin)

        B, F, H, W, C3 = lookup_images.shape
        lookup_flat = lookup_images.reshape(B * F, H, W, C3)
        lookup_feats = jax.lax.stop_gradient(
            self.feature_extraction(lookup_flat, train))
        h, w = lookup_feats.shape[1:3]
        lookup_feats = lookup_feats.reshape(B, F, h, w, -1)

        cost_volume, missing_mask = self.match_features(
            current_feats, jax.lax.stop_gradient(lookup_feats),
            poses, P2, depth_bins)
        confidence_mask = self.compute_confidence_mask(
            jax.lax.stop_gradient(cost_volume)
            * (1 - jax.lax.stop_gradient(missing_mask)))

        viz = jax.lax.stop_gradient(cost_volume)
        viz = jnp.where(viz == 0, 100.0, viz)
        argmin = jnp.argmin(viz, axis=-1)
        lowest_cost = self.indices_to_disparity(argmin, depth_bins)

        cost_volume = cost_volume * confidence_mask[..., None]
        post = jax.nn.relu(self.reduce_conv(
            jnp.concatenate([features[-1], cost_volume], axis=-1)))

        f2 = self._stage(post, 2, train)
        f3 = self._stage(f2, 3, train)
        f4 = self._stage(f3, 4, train)
        return features + [f2, f3, f4], lowest_cost, confidence_mask
