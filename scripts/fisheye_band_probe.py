"""Mei-motion band-accuracy probe (round-2 VERDICT item 7).

The fisheye head ships ``warp_band=16`` justified only by caution — no
fisheye-motion probe existed. This measures, for KITTI-360-like Mei
intrinsics and a side-mounted camera under realistic ego-motion, how far
each output row's vertical source-sample spread exceeds a given band, and
the resulting warp divergence vs the exact gather warp.

Geometry: KITTI-360 fisheyes face sideways, so vehicle forward motion is
camera-lateral (x) translation; scene = ground plane + building wall seen
through the Mei distortion, norm map taken from the analytic intersection
(piecewise-smooth, sharp roofline edge).

CPU f32 exact math: run with
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/fisheye_band_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from fsnet_tpu.ops.fisheye import backtrack_ray_map
from fsnet_tpu.models.heads.fisheye_decoder import _mei_project
from fsnet_tpu.ops.warp import grid_sample as grid_sample_exact
from fsnet_tpu.ops.warp_fast import grid_sample_band

H, W = 192, 640            # fisheye recipe trains 192x640 crops too
XI, K1, K2 = 2.2, 0.05, -0.01
GAMMA = 1.3 * W


def main():
    rng = np.random.RandomState(0)
    P = np.zeros((1, 3, 4), np.float32)
    P[0, 0, 0] = P[0, 1, 1] = GAMMA
    P[0, 0, 2], P[0, 1, 2] = W / 2.0, H / 2.0
    P[0, 2, 2] = 1.0

    X, Y, Z, mask = backtrack_ray_map(H, W, P[0], XI, K1, K2)
    rays = np.stack([X[0], Y[0], Z[0]], axis=-1).astype(np.float32)
    valid = mask[0] > 0

    # side-facing camera: x = vehicle forward, z = lateral (toward wall),
    # y = down. Ground plane y = 1.6 m; wall z = 8 m.
    with np.errstate(divide="ignore", invalid="ignore"):
        s_ground = 1.6 / np.where(rays[..., 1] > 1e-4, rays[..., 1], np.nan)
        s_wall = 8.0 / np.where(rays[..., 2] > 1e-4, rays[..., 2], np.nan)
    s = np.nanmin(np.stack([s_ground, s_wall]), axis=0)
    s = np.where(np.isfinite(s) & (s > 0), s, 60.0)
    norm = np.clip(s * np.linalg.norm(rays, axis=-1), 0.5, 80.0)
    norm = norm.astype(np.float32)[None]                    # [1, H, W]

    img = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    params = jnp.asarray([[XI, K1, K2]], np.float32)
    Pj = jnp.asarray(P)

    print(f"valid pixels: {valid.mean():.2%}")
    for rot_deg, tx in [(0.0, 0.7), (0.3, 0.7), (0.6, 0.7), (1.0, 0.7),
                        (2.0, 0.7), (0.3, 1.4)]:
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_euler(
            "xyz", rng.uniform(-rot_deg, rot_deg, 3),
            degrees=True).as_matrix()
        T[:3, 3] = [tx, rng.uniform(-0.02, 0.02), rng.uniform(-0.05, 0.05)]

        points = rays * norm[0][..., None]
        transformed = points @ T[:3, :3].T + T[:3, 3]
        pix = np.asarray(_mei_project(jnp.asarray(transformed[None]),
                                      Pj, params))[0]       # [H, W, 2]
        u = pix[..., 0] / (W - 1) * 2 - 1
        v = pix[..., 1] / (H - 1) * 2 - 1
        grid = jnp.asarray(np.stack([u, v], axis=-1,
                                    dtype=np.float32)[None])

        # vertical spread per output row (the band must cover it)
        y_src = np.clip((v + 1) * 0.5 * (H - 1), 0, H - 1)
        y0 = np.floor(y_src)
        row_min = y0.min(axis=1, keepdims=True)
        row_min = np.minimum(row_min, H - 2) - (row_min.astype(int) & 1)
        spread = (np.ceil(y_src) - row_min)[valid]

        # per-TILE spread: if the kernels carried a band start per 128-lane
        # output tile instead of per row, the band would only need to cover
        # the within-tile spread (round-4 fisheye attribution: the band-16
        # sweeps are VPU-issue-bound, and issue scales with band rows)
        L = 128
        Tn = W // L
        y0_t = y0.reshape(H, Tn, L)
        ymax_t = np.ceil(y_src).reshape(H, Tn, L)
        vt = valid.reshape(H, Tn, L)
        tile_min = np.where(vt, y0_t, np.inf).min(axis=2, keepdims=True)
        tile_min = np.where(np.isfinite(tile_min), tile_min, 0.0)
        tile_min = np.minimum(tile_min, H - 2) - (tile_min.astype(int) & 1)
        t_spread = np.where(vt, ymax_t - tile_min, 0.0)[vt]

        exact = grid_sample_exact(img, grid, padding_mode="border",
                                  align_corners=True)
        line = [f"rot {rot_deg:.1f}deg tx {tx:.1f}m: "
                f"row-spread p50/p95/max "
                f"{np.percentile(spread, 50):.0f}/"
                f"{np.percentile(spread, 95):.0f}/{spread.max():.0f}",
                f"tile-spread {np.percentile(t_spread, 50):.0f}/"
                f"{np.percentile(t_spread, 95):.0f}/{t_spread.max():.0f}"]
        for band in (4, 8, 12, 16, 24):
            banded = grid_sample_band(img, grid, band=band)
            d = np.asarray(jnp.abs(banded - exact))[0][valid]
            line.append(f"b{band}: {float((d.max(-1) > 1e-3).mean()):.3%}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
