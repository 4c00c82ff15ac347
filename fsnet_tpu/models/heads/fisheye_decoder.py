"""Fisheye (Mei unified camera) loss head.

Reference: ``FishEyeDecoder`` (``monodepth/networks/models/heads/
monodepepth2_decoder.py:350-420`` — file ``monodepth2_decoder.py``): instead of
K-projection, lifts the predicted *norm* map to 3D through cached inverse ray
maps, SE(3)-transforms, re-projects through the Mei forward model, and
grid-samples; ``get_prediction`` returns z-depth + norm.

TPU-first design: the inverse Newton/bisection ray maps are precomputed
host-side per camera at dataset-build time and shipped in the batch as arrays
(``'fisheye_rays'`` [B, H, W, 4] = (X, Y, Z, mask)); the Mei *forward* model
and per-sample scalars (``'fisheye_params'`` [B, 3] = (xi, k1, k2)) run
in-graph, fully batched over scales x frames like the pinhole head. The
reference instead runs a per-batch-element python loop with a host cache
(``mei_fisheye_utils.py:139-187``) — a host sync per step.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.photo_loss import photo_loss_supported
from ...ops.warp_fast import grid_sample, scale_batched_warp_is_fused
from ...ops.warp_mei import (
    make_mei_rows, warp_mei_fused, warp_mei_fused_tiled, warp_mei_supported)
from ..blocks import interpolate_bilinear
from .monodepth2_decoder import MonoDepth2Decoder


def _mei_project(points: jnp.ndarray, P: jnp.ndarray, params: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """Batched Mei forward projection: points [B, H, W, 3], P [B, 3+, 4],
    params [B, 3] = (xi, k1, k2) -> pixel coords [B, H, W, 2]."""
    xi = params[:, 0][:, None, None]
    k1 = params[:, 1][:, None, None]
    k2 = params[:, 2][:, None, None]

    norm = jnp.linalg.norm(points, axis=-1)
    x = points[..., 0] / (norm + eps)
    y = points[..., 1] / (norm + eps)
    z = points[..., 2] / (norm + eps)

    x = x / (z + xi + eps)
    y = y / (z + xi + eps)
    ro2 = x * x + y * y
    factor = 1.0 + k1 * ro2 + k2 * ro2 * ro2
    x = x * factor
    y = y * factor

    gamma1 = P[:, 0, 0][:, None, None]
    gamma2 = P[:, 1, 1][:, None, None]
    u0 = P[:, 0, 2][:, None, None]
    v0 = P[:, 1, 2][:, None, None]
    return jnp.stack([gamma1 * x + u0, gamma2 * y + v0], axis=-1)


class FishEyeDecoder(MonoDepth2Decoder):
    """Drop-in fisheye head; same config surface as the reference."""

    # Mei fisheye reprojections bend rows vertically far more than pinhole
    # grids; keep the wider band here (the band-8 default was validated on
    # pinhole KITTI motion only — BASELINE.md convergence probe).
    warp_band: int = 16

    def _lift(self, norm_map: jnp.ndarray, input_dict: Dict):
        """norm [B, H, W, 1] + batched ray maps -> (points [B, H, W, 3],
        valid mask [B, H, W])."""
        rays = input_dict["fisheye_rays"]  # [B, H, W, 4] = X, Y, Z, mask
        points = rays[..., 0:3] * norm_map
        return points, rays[..., 3]

    def _warp_all(self, input_dict, output_dict):
        scales = tuple(self.scales)
        frames = tuple(self.frame_ids[1:])
        S, F = len(scales), len(frames)
        H, W = self.height, self.width

        norms_full = jnp.stack([
            interpolate_bilinear(output_dict[("depth", s, s)], H, W,
                                 align_corners=True)
            for s in scales
        ], axis=0)  # [S, B, H, W, 1] — "depth" here is the norm map
        B = norms_full.shape[1]

        P = input_dict["P2"]
        params = input_dict["fisheye_params"]  # [B, 3]
        Ts = jnp.stack([
            input_dict["stereo_T"] if f == "s" else output_dict[("cam_T_cam", f)]
            for f in frames
        ], axis=0)  # [F, B, 4, 4]

        sources = jnp.stack([
            input_dict[("original_image", f)] for f in frames], axis=0)
        C = sources.shape[-1]
        sources_flat = sources.reshape(F * B, H, W, C)

        # Norm-direct Pallas path (ops/warp_mei.py): when every pose is a
        # dataset constant, the whole Mei grid chain — rotated ray field,
        # projection, index/fraction prep, AND the nearest mask warp —
        # fuses into the Mei prep kernel + two band-warp sweeps; no
        # [S, F, B, H, W, 2] grid is ever materialized (round-2 VERDICT
        # item 7; reference full-res per-scale chain:
        # monodepth2_decoder.py:355-413).
        pose_const = bool(output_dict.pop("pose_is_const", False))
        if (pose_const and not self.is_residual_flow
                and self.warp_impl == "band"
                and warp_mei_supported(sources_flat.shape, self.warp_band)):
            rays = input_dict["fisheye_rays"]
            rays_cf = jnp.moveaxis(
                rays[..., 0:3].astype(jnp.float32), -1, 1)   # [B, 3, H, W]
            mask = rays[..., 3].astype(jnp.float32)
            if "patched_mask" in input_dict:
                mask = mask * input_dict["patched_mask"].astype(jnp.float32)
            mrows = make_mei_rows(P, params, Ts, S)
            if photo_loss_supported((S * F * B, H, W, C)):
                # zero-relayout chain (see the pinhole head): tiled warp
                # output -> fused photometric kernel -> tiled cotangent
                preds_tl, ov_flat = warp_mei_fused_tiled(
                    sources_flat, mask, norms_full.reshape(S * B, H, W),
                    rays_cf, mrows, S, F, self.warp_band,
                    bool(self.overlapped_mask))
                preds = jnp.moveaxis(preds_tl, 3, 4).reshape(
                    S, F, B, H, W, C)
                overlap = (ov_flat.reshape(S, F, B, H, W)
                           if self.overlapped_mask else None)
                return preds, overlap, norms_full, None, preds_tl
            preds_flat, ov_flat = warp_mei_fused(
                sources_flat, mask, norms_full.reshape(S * B, H, W),
                rays_cf, mrows, S, F, self.warp_band,
                bool(self.overlapped_mask))
            preds = preds_flat.reshape(S, F, B, H, W, C)
            overlap = (ov_flat.reshape(S, F, B, H, W)
                       if self.overlapped_mask else None)
            return preds, overlap, norms_full

        # grid math in f32 even under bf16 mixed precision: pixel
        # addressing needs sub-pixel accuracy, bf16 quantizes to +-2 px
        # beyond x ~ 256 (see ops.geometry.reproject). The SE(3) transform
        # of the lifted points decomposes as
        #     T @ (rays * norm) = norm * (R @ rays) + t
        # so the rotated ray field (the only matmul in the chain) hoists out
        # of the S loop: one [B, H, W, 3] einsum per frame instead of a 4x4
        # homogeneous einsum + concat per (scale, frame) — the reference
        # instead reruns its full image2cam/cam2image chain per scale
        # (``monodepth2_decoder.py:355-413``).
        f32 = jnp.float32
        rays = input_dict["fisheye_rays"][..., 0:3].astype(f32)
        # explicit fma matvec, not einsum: small-K f32 einsums lower to
        # noisy bf16 MXU passes (+-3 px at gamma*W scale — see
        # ops/geometry.py:reproject and BASELINE.md round 3)
        R = Ts[:, :, :3, :3].astype(f32)[:, :, None, None]  # [F,B,1,1,3,3]
        rot_rays = jnp.stack([
            R[..., k, 0] * rays[None, ..., 0]
            + R[..., k, 1] * rays[None, ..., 1]
            + R[..., k, 2] * rays[None, ..., 2]
            for k in range(3)], axis=-1)         # [F, B, H, W, 3]
        trans = Ts[:, :, :3, 3].astype(f32)      # [F, B, 3]
        Pf = P.astype(f32)
        params_f = params.astype(f32)

        def grid_for(norm_s, rot_f, t_f):
            transformed = (norm_s.astype(f32) * rot_f
                           + t_f[:, None, None, :])
            pix = _mei_project(transformed, Pf, params_f)
            u = pix[..., 0] / max(W - 1, 1) * 2.0 - 1.0
            v = pix[..., 1] / max(H - 1, 1) * 2.0 - 1.0
            return jnp.stack([u, v], axis=-1)

        grids = jax.vmap(lambda n: jax.vmap(
            lambda rf, tf: grid_for(n, rf, tf))(rot_rays, trans))(
            norms_full)  # [S, F, B, H, W, 2]

        if self.is_residual_flow:
            for fi, f in enumerate(frames):
                if ("residual_flow", f, 0) in output_dict:
                    grids = grids.at[:, fi].add(
                        output_dict[("residual_flow", f, 0)][None])

        # all S x F warps in one batched pass on the Pallas fused-DMA path
        # (kernels index sources modulo the image batch — no S-fold tiling);
        # chunk per scale on the einsum/gather fallbacks to bound memory,
        # same dispatch as the pinhole head's _warp_all
        def warp_photo(src, g):
            return grid_sample(src, g, mode="bilinear",
                               padding_mode="border", align_corners=True,
                               impl=self.warp_impl, band=self.warp_band)

        grids_flat = grids.reshape(S * F * B, H, W, 2)
        if scale_batched_warp_is_fused(sources_flat.shape, grids_flat.shape,
                                       self.warp_impl):
            preds = warp_photo(sources_flat, grids_flat)
        else:
            preds = jax.lax.map(
                lambda g: warp_photo(sources_flat,
                                     g.reshape(F * B, H, W, 2)), grids)
        preds = preds.reshape(S, F, B, H, W, C)

        overlap = None
        if self.overlapped_mask:
            valid = input_dict["fisheye_rays"][..., 3]  # [B, H, W]
            patched = input_dict.get(
                "patched_mask", jnp.ones((B, H, W), dtype=preds.dtype))
            patched = patched * valid
            patched_flat = jnp.broadcast_to(
                patched[None, ..., None], (F, B, H, W, 1)
            ).reshape(F * B, H, W, 1)

            def warp_mask(src, g):
                return grid_sample(
                    src, g, mode="nearest", padding_mode="zeros",
                    align_corners=True, impl=self.warp_impl,
                    band=self.warp_band)

            if scale_batched_warp_is_fused(
                    patched_flat.shape, grids_flat.shape, self.warp_impl):
                warped = warp_mask(patched_flat, grids_flat)
            else:
                warped = jax.lax.map(
                    lambda g: warp_mask(patched_flat,
                                        g.reshape(F * B, H, W, 2)), grids)
            overlap = (warped.reshape(S, F, B, H, W) == 1.0)

        return preds, overlap, norms_full

    def get_prediction(self, input_dict, output_dict):
        """z-depth + norm map (reference ``monodepth2_decoder.py:415-420``)."""
        if ("depth", 0, 0) in output_dict:
            norm = output_dict[("depth", 0, 0)]
        else:
            norm = interpolate_bilinear(
                output_dict[("depth", self.scales[0], self.scales[0])],
                self.height, self.width, align_corners=True)
        points, mask = self._lift(norm, input_dict)
        return dict(depth=points[..., 2:3], norm=norm, fisheye_mask=mask)
