"""Measure the band-DMA descriptor rate of the fused warp kernels.

Round-4 diagnosis (BASELINE.md "per-tile band anchors" section): the Mei
warp passes issue ONE band DMA per output row (N*H ~ 49k descriptors per
pass) and looked descriptor-rate-bound — halving the sweep via per-tile
anchors LOST 11 imgs/s to 3x the descriptors, and bf16-packing the mask
sweep (half the rows AND compares) gained only 2.2 ms of a 14.8 ms pass.

This probe isolates the descriptor cost: a minimal kernel that performs
ONLY the double-buffered band DMAs of the fisheye image pass (identical
shapes: N=128 warp rows of [T=3, KL, 128] windows from a [32, 3, 576, 128]
HBM image) plus a negligible consume, at R output rows per DMA
(R=1 is the shipped kernel's pattern; R>1 merges adjacent rows into one
taller window, the candidate lever). A bytes-control config (R=1 at the
R=4 window height) separates descriptor count from window bytes.

Usage: python scripts/tpu_dma_rate_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

NI, T, HC, L = 32, 3, 576, 128   # fisheye packed image pass (f32 words)
N, H = 128, 384                  # warp rows (S*F*B, H)
G = 8                            # rows per grid block (shipped)


def _kernel(ymin_ref, img_ref, out_ref, scr, sems, *, R, KL):
    """Grid (N, H//G); G//R band DMAs per block, double-buffered exactly
    like warp_kernel._dma_prologue; consume one sublane per group."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    blk = n * nh + h
    nblk = pl.num_programs(0) * nh
    slot = jax.lax.rem(blk, 2)
    NG = G // R

    def dma(slot_, n_, h_, gr):
        y = ymin_ref[n_, (h_ * G + gr * R)]
        return pltpu.make_async_copy(
            img_ref.at[jax.lax.rem(n_, NI), :, pl.ds(y, KL), :],
            scr.at[slot_, gr], sems.at[slot_, gr])

    def start_block(slot_, n_, h_):
        for gr in range(NG):
            dma(slot_, n_, h_, gr).start()

    @pl.when(blk == 0)
    def _():
        start_block(slot, n, h)

    @pl.when(blk + 1 < nblk)
    def _():
        nxt = blk + 1
        start_block(1 - slot, nxt // nh, jax.lax.rem(nxt, nh))

    for gr in range(NG):
        dma(slot, n, h, gr).wait()
        out_ref[0, 0, gr] = scr[slot, gr, 0, 0]


def probe(R, KL):
    kernel = functools.partial(_kernel, R=R, KL=KL)
    NG = G // R

    def call(ymin, img):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, H // G, NG, L), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N, H // G),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((1, 1, NG, L),
                                       lambda n, h, *_: (n, h, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, NG, T, KL, L), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, NG)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(ymin, img)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(NI, T, HC, L).astype(np.float32))
    base = jnp.asarray(
        np.clip(rng.randint(0, HC - KL - 2, size=(N, H)), 0, HC - KL - 2)
        .astype(np.int32))

    def body(ymin):
        out = call(ymin, img)
        # chain: next ymin depends on this call's output (jitter 0/1 around
        # the base; stays in DMA range), so the scan cannot fold calls
        s = jnp.sum(out).astype(jnp.int32)
        return base + (s & 1)

    def run(k):
        @jax.jit
        def f(y):
            def step(c, _):
                return body(c), None
            c, _ = jax.lax.scan(step, y, None, length=k)
            return c.ravel()[0].astype(jnp.float32)
        out = f(base)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(base))
            best = min(best, time.perf_counter() - t0)
        return best

    k = 8
    while True:
        t1, t3 = run(k), run(3 * k)
        if t3 - t1 >= 1.0 or k > 4096:
            break
        k *= 2
    per_iter = (t3 - t1) / (2 * k)
    n_dma = N * (H // G) * (G // R)
    gb = n_dma * T * KL * L * 4 / 1e9
    print(f"R={R} KL={KL:2d}: {per_iter * 1e3:7.3f} ms/pass  "
          f"{n_dma:6d} DMAs -> {per_iter / n_dma * 1e9:6.1f} ns/DMA  "
          f"{gb / per_iter:6.1f} GB/s  (k={k})", flush=True)
    return per_iter


def main():
    # (R, KL): KL = rows of the merged window (base 24 = 8 bf16 row-pairs x
    # C=3; +3 per extra image row-pair the union needs)
    for R, KL in ((1, 24), (1, 32), (2, 27), (4, 30), (8, 36)):
        probe(R, KL)


if __name__ == "__main__":
    main()
