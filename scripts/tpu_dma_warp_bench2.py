"""Component timings for the fused-DMA warp: prep transposes vs kernel."""
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


def _sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return out


def bench(name, fn, *args):
    out = _sync(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = jax.jit(fn)(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:32s} {ms:7.2f} ms")
    return out


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    base = np.stack([xs, ys], -1)[None].astype(np.float32)
    grid = jnp.asarray(
        np.tile(base, (B, 1, 1, 1))
        + (rng.rand(B, H, W, 2) * 0.04 - 0.02).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    iw = jax.tree.map(jnp.asarray, iw)

    bench("pack+tile_img_rows", lambda im: wk._tile_img_rows(
        wk.pack_rows_bf16(im)), img)
    bench("pack+gather_bands_cw", lambda im, ym: wk.gather_bands_cw(
        wk.pack_rows_bf16(im), ym // 2, BAND // 2), img, iw["ymin"])

    def prep(im, iw):
        img_tiled, ymin_rows, rows, packed = wk._prep_img_dma(im, iw, BAND)
        ipack = wk._make_ipack(iw, W, 128)
        fpack = jnp.stack([iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"]],
                          axis=2).astype(jnp.float32)
        return img_tiled, ymin_rows, ipack, fpack

    img_tiled, ymin_rows, ipack, fpack = _sync(jax.jit(prep)(img, iw))

    for grp in (4, 8, 12):
        bench(f"kernel_dma fwd (G={grp})",
              lambda a, b, c, d, grp=grp: wk.warp_rows_pallas_dma(
                  a, b, c, d, BAND // 2, C, group=grp, packed=True),
              img_tiled, ymin_rows, ipack, fpack)

    def prep_old(im, iw):
        bands_cw, rows, packed = wk._prep_bands(im, iw, BAND)
        return bands_cw

    bands_cw = _sync(jax.jit(prep_old)(img, iw))
    for grp in (8, 16):
        bench(f"kernel old fwd (G={grp})",
              lambda a, b, c, grp=grp: wk.warp_rows_pallas(
                  a, b, c, BAND // 2, C, group=grp, packed=True),
              bands_cw, ipack, fpack)


if __name__ == "__main__":
    main()
