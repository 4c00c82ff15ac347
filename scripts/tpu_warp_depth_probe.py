"""TPU probe: warp_depth_fused (Pallas prep kernel + fused DMA warp) alone.

Validates the depth-direct path compiles/executes on the real chip and
matches the grid route, then times fwd and fwd+bwd.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fsnet_tpu.ops.warp_depth import (
    make_affine_rows, warp_depth_fused, warp_depth_supported)
from fsnet_tpu.ops.geometry import reproject
from fsnet_tpu.ops.warp_fast import grid_sample_band_tiled

S, F, B, H, W, C = 4, 2, 12, 192, 640, 3
BAND = 4


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(F * B, H, W, C).astype(np.float32))
    depth = jnp.asarray(
        (rng.rand(S * B, H, W) * 40 + 1).astype(np.float32))
    K = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    K[:, 0, 0], K[:, 1, 1] = 350.0, 350.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    inv_K = np.linalg.inv(K)
    Ts = np.eye(4, dtype=np.float32)[None, None].repeat(F, 0).repeat(B, 1)
    Ts[..., 0, 3] = 0.1
    Ts[..., 2, 3] = -0.3
    K, inv_K, Ts = map(jnp.asarray, (K, inv_K, Ts))

    print("supported:", warp_depth_supported(image.shape, BAND), flush=True)
    arows = make_affine_rows(K, inv_K, Ts, S)

    fwd = jax.jit(lambda i, d, a: warp_depth_fused(i, d, a, S, F, BAND))
    t0 = time.perf_counter()
    out, ov = fwd(image, depth, arows)
    out.block_until_ready()
    print(f"fwd compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    # reference via the grid route
    def ref(i, d, a):
        grids = jax.vmap(lambda ds: jax.vmap(
            lambda Tf: reproject(ds, K, inv_K, Tf))(Ts))(
                d.reshape(S, B, H, W, 1))
        g = grids.reshape(S * F * B, H, W, 2)
        src = jnp.broadcast_to(i[None], (S, F * B, H, W, C)).reshape(-1, H,
                                                                     W, C)
        return grid_sample_band_tiled(src, g, band=BAND)

    from fsnet_tpu.ops.warp_fast import _tile_nhwc as tile_nhwc
    ref_out = jax.jit(ref)(image, depth, arows)   # tiled [N, H, T, C, L]
    out_t = tile_nhwc(out, ref_out.shape[-1])
    err = float(jnp.max(jnp.abs(out_t - ref_out)))
    print("max |fused - grid|:", err, flush=True)

    def loss_fused(d):
        o, _ = warp_depth_fused(image, d, arows, S, F, BAND)
        return jnp.sum(o * o)

    g_step = jax.jit(jax.grad(loss_fused))
    t0 = time.perf_counter()
    g = g_step(depth)
    g.block_until_ready()
    print(f"bwd compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    def loss_grid(d):
        o = ref(image, d, arows)
        return jnp.sum(o * o)

    g_ref = jax.jit(jax.grad(loss_grid))(depth)
    gerr = float(jnp.max(jnp.abs(g - g_ref)))
    gmag = float(jnp.max(jnp.abs(g_ref)))
    print("max |dfused - dgrid|:", gerr, "(ref max", gmag, ")", flush=True)

    for name, f in [("fwd", lambda: fwd(image, depth, arows)[0]),
                    ("grad", lambda: g_step(depth))]:
        f().block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            r = f()
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
