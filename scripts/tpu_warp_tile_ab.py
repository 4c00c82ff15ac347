"""Standalone A/B of the fused Mei warp pass: per-row band16 vs per-tile
band8 (tile-ymin) at the EXACT fisheye image-pass shape.

The round-4 trace attributes 37.9 ms/step to this one custom call
(`head._warp_all.5`, bs16 @ 384x384: N=128 warps, packed bf16, C=3,
band16) — 36% of the whole step — while the DMA-only probe
(`scripts/tpu_dma_rate_probe.py`) bounds its band DMA at ~2.8 ms: the
gather/select sweep dominates. Halving the band via per-tile anchors
SHOULD halve the sweep, yet the full-step A/B measured tile mode 8.6 ms
slower; this harness times the kernel alone (differencing scan, chained
through the image so calls cannot fold) so kernel-structure variants can
be iterated without 18-minute full-step compiles.

Usage: python scripts/tpu_warp_tile_ab.py [band_row=16] [band_tile=8]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fsnet_tpu.ops.pallas.warp_kernel as wk
from fsnet_tpu.ops.pallas.mei_prep_kernel import mei_prep_pallas
from fsnet_tpu.ops.warp_mei import make_mei_rows

S, F, B, H, W, C = 4, 2, 16, 384, 384, 3
BAND_ROW = int(sys.argv[1]) if len(sys.argv) > 1 else 16
BAND_TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 8

print("backend:", jax.default_backend(), flush=True)


def scene():
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(F * B, H, W, C).astype(np.float32)
                        ).astype(jnp.bfloat16)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    norm = jnp.asarray(
        (8.0 + 4.0 * np.sin(xs / W * 4.0)[None]
         + rng.rand(S * B, 1, 1) * 6.0
         + 2.0 * np.cos(ys / H * 3.0)[None]).astype(np.float32))
    u = (xs - 0.5 * W) / (0.35 * W)
    v = (ys - 0.5 * H) / (0.35 * W)
    rays = np.stack([u, v, np.ones_like(u)], axis=-1).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rays_cf = jnp.asarray(
        np.tile(np.moveaxis(rays, -1, 0)[None], (B, 1, 1, 1)))
    P = np.zeros((B, 3, 4), np.float32)
    P[:, 0, 0] = P[:, 1, 1] = 1.3 * W
    P[:, 0, 2], P[:, 1, 2], P[:, 2, 2] = 0.5 * W, 0.5 * H, 1.0
    params = np.tile(np.array([[2.2, 0.2, 0.1]], np.float32), (B, 1))
    Ts = np.tile(np.eye(4, dtype=np.float32), (F, B, 1, 1))
    for f in range(F):
        for b in range(B):
            ang = (rng.rand(3) - 0.5) * 0.01
            Ts[f, b, :3, 3] = [rng.uniform(0.55, 0.8),
                               rng.uniform(-0.02, 0.02),
                               rng.uniform(-0.05, 0.05)]
            Ts[f, b, 0, 1], Ts[f, b, 1, 0] = -ang[2], ang[2]
            Ts[f, b, 0, 2], Ts[f, b, 2, 0] = ang[1], -ang[1]
            Ts[f, b, 1, 2], Ts[f, b, 2, 1] = -ang[0], ang[0]
    mrows = make_mei_rows(jnp.asarray(P), jnp.asarray(params),
                          jnp.asarray(Ts), S)
    return image, norm, rays_cf, mrows


def timed(fn, args, reps=2):
    """Fixed k-pair differencing (64 vs 192): every new k is a fresh jit
    trace + Mosaic compile over this tunnel (~minutes), so the roofline
    harness's adaptive doubling times out here; a 0.4-0.8 s delta against
    the ~50 ms dispatch jitter resolves the 2x question this A/B asks."""
    def run(k):
        @jax.jit
        def f(img):
            def step(c, _):
                out, _, _ = fn(c, *args)
                # chain: perturb one image element by an out-dependent bf16
                # epsilon so the scan cannot fold the calls
                eps = (out.ravel()[0].astype(jnp.float32) * 1e-30
                       ).astype(jnp.bfloat16)
                return c.at[0, 0, 0, 0].add(eps), None
            c, _ = jax.lax.scan(step, img, None, length=k)
            return c.ravel()[0].astype(jnp.float32)
        out = f(args_img)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(args_img))
            best = min(best, time.perf_counter() - t0)
        return best

    k = 64
    t1, t3 = run(k), run(3 * k)
    return (t3 - t1) / (2 * k)


def main():
    global args_img
    image, norm, rays_cf, mrows = scene()

    for tag, band, tile in (("per-row", BAND_ROW, False),
                            ("per-tile", BAND_TILE, True)):
        iword, fpack, ymin, ws = jax.jit(
            lambda n: mei_prep_pallas(n, rays_cf, mrows, S, F, band,
                                      tile_ymin=tile))(norm)
        ymin_img = (ymin // 2) * C
        img_tiled = wk._tile_img_rows(wk.pack_rows_bf16(image))
        rows = band // 2
        args_img = jax.device_put(img_tiled)
        ops = (ymin_img, ws, iword, fpack)
        ops = tuple(jax.device_put(o) for o in ops)

        def call(img, ymin_img, ws, iword, fpack, rows=rows):
            return wk.warp_rows_pallas_dma_fused(
                img, ymin_img, ws, iword, fpack, rows, C, group=8,
                packed=True, tiled_vjp="all", border=True)

        t = timed(call, ops)
        print(f"{tag:9s} band={band:2d}: {t * 1e3:8.3f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
