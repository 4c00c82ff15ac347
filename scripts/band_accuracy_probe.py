"""Band-size accuracy probe: band-warp vs exact gather warp under realistic
driving motion (CPU, f32 exact math).

The band warp is exact when each output row's vertical sample spread fits in
``band`` source rows (ops/warp_fast.py). Spread is driven by roll/pitch
between frames; KITTI 10 Hz inter-frame rotation is typically < 0.3 deg.
This sweeps rotation magnitudes and reports the fraction of pixels where a
given band diverges from the exact warp.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fsnet_tpu.ops.geometry import (make_K44, invert_K, reproject,
                                    transformation_from_parameters)
from fsnet_tpu.ops.warp import grid_sample as grid_sample_exact
from fsnet_tpu.ops.warp_fast import grid_sample_band

B, H, W = 2, 192, 640


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    P2 = np.zeros((B, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = 0.58 * W
    P2[:, 0, 2] = W / 2
    P2[:, 1, 2] = H / 2
    P2[:, 2, 2] = 1.0
    K = make_K44(jnp.asarray(P2))
    inv_K = invert_K(K)

    # piecewise-smooth street depth (network predictions are smooth): ground
    # plane 5..60 m + a few rectangular objects with sharp edges
    ys = np.linspace(0.15, 1.0, H)[None, :, None]
    depth = np.tile(4.0 / ys, (B, 1, W))
    for b in range(B):
        for _ in range(8):
            y0, x0 = rng.randint(H // 3, H - 20), rng.randint(0, W - 80)
            hh, ww = rng.randint(20, 60), rng.randint(30, 120)
            depth[b, y0:y0 + hh, x0:x0 + ww] = rng.uniform(4.0, 25.0)
    depth = jnp.asarray(depth.astype(np.float32))[..., None]

    for rot_deg in [0.0, 0.1, 0.3, 0.6, 1.0, 2.0]:
        rot = np.full((B, 1, 3), rot_deg * np.pi / 180.0, np.float32)
        trans = np.tile(np.array([[0.02, 0.01, 0.8]], np.float32), (B, 1))
        T = transformation_from_parameters(
            jnp.asarray(rot), jnp.asarray(trans[:, None]), invert=False)
        grid = reproject(depth, K, inv_K, T)

        exact = grid_sample_exact(img, grid, mode="bilinear",
                                  padding_mode="border", align_corners=True)
        line = f"rot {rot_deg:4.1f} deg: "
        for band in (16, 12, 8, 6):
            out = grid_sample_band(img, grid, band=band)
            d = np.abs(np.asarray(out) - np.asarray(exact))
            bad = float((d > 1e-4).mean())
            line += f" band{band}: bad={bad:8.2e} max={d.max():.3f} "
        print(line, flush=True)


if __name__ == "__main__":
    main()
