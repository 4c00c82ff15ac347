"""A/B the fused-DMA band gather vs the XLA-gather + materialized-band path.

Runs the Pallas warp forward and fused backward at the KITTI training shape
(the hot 96-warp workload: F*B=24 images of 192x640x3, 4 scales -> we bench
one pass of 24 and scale), checking numerical agreement and timing both.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import fsnet_tpu.ops.pallas.warp_kernel as wk
from fsnet_tpu.ops.warp_fast import _indices_and_weights

B, H, W, C = 24, 192, 640, 3
BAND = 16
STEPS = 20


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    base = np.stack([xs, ys], -1)[None].astype(np.float32)
    grid = jnp.asarray(
        np.tile(base, (B, 1, 1, 1))
        + (rng.rand(B, H, W, 2) * 0.04 - 0.02).astype(np.float32))
    gcot = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    return img, grid, gcot


def _sync(out):
    # on the axon tunnel block_until_ready can return before execution
    # finishes; a host read of the result is a true barrier
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return out


def bench(fn, *args):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / STEPS * 1e3, out


def main():
    img, grid, gcot = make_inputs()
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    iw = jax.tree.map(jnp.asarray, iw)

    def fwd(dma):
        def f(img, iw):
            return wk.grid_sample_band_pallas(
                img, iw, BAND, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"],
                dma=dma)
        return jax.jit(f)

    def bwd(dma):
        def f(img, iw, gcot):
            one = jnp.ones_like(iw["wx0"])
            return wk.grid_sample_band_pallas_bwd(
                img, iw, BAND, -one, one, iw["wy0"], iw["wy1"],
                iw["wx0"], iw["wx1"], -one, one, gcot, dma=dma)
        return jax.jit(f)

    t_f0, out0 = bench(fwd(False), img, iw)
    t_f1, out1 = bench(fwd(True), img, iw)
    err = float(jnp.max(jnp.abs(out0 - out1)))
    print(f"fwd  old {t_f0:7.2f} ms   dma {t_f1:7.2f} ms   maxerr {err:.2e}")

    t_b0, g0 = bench(bwd(False), img, iw, gcot)
    t_b1, g1 = bench(bwd(True), img, iw, gcot)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g0, g1))
    print(f"bwd  old {t_b0:7.2f} ms   dma {t_b1:7.2f} ms   maxerr {err:.2e}")


if __name__ == "__main__":
    main()
