"""Compile+run smoke for the fused fwd+vjp warp kernel on real TPU at the
production KITTI shapes (scale-batched bf16 packed path). Prints max
disagreement of the fused grad path vs the two-pass kernel path.

The first fused-kernel draft wedged the Mosaic compile (no error, no
progress — misaligned sublane-slice stores); run this after any fused-kernel
change BEFORE burning a full bench cycle.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fsnet_tpu.ops.warp_fast as wf

NI, H, W, C = 8, 192, 640, 3
SCALES = 4

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(NI, H, W, C).astype(np.float32)).astype(
    jnp.bfloat16)
ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                     indexing="ij")
base = np.stack([xs, ys], -1)[None]
grid = jnp.asarray(
    (base + rng.rand(NI * SCALES, H, W, 2) * 0.02 - 0.01).astype(np.float32))


def loss(gr, fused):
    wf.FUSED_VJP = fused
    out = wf.grid_sample_band(img, gr, band=16)
    return jnp.sum(out.astype(jnp.float32) ** 2)


t0 = time.time()
g_fused = jax.jit(jax.grad(lambda gr: loss(gr, True)))(grid)
g_fused.block_until_ready()
s = float(jnp.abs(g_fused).max())  # device read = true barrier
print(f"fused grad compiled+ran in {time.time() - t0:.0f}s  max|g|={s:.4f}",
      flush=True)

t0 = time.time()
g_two = jax.jit(jax.grad(lambda gr: loss(gr, False)))(grid)
d = float(jnp.abs(g_fused - g_two).max())
print(f"two-pass ran in {time.time() - t0:.0f}s  max|fused-twopass|={d:.2e}",
      flush=True)
assert d < 1e-2 * max(s, 1.0), d
print("OK", flush=True)
