"""Time the production Pallas band-warp kernel on TPU (f32 + bf16, groups)."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from fsnet_tpu.ops.pallas.warp_kernel import grid_sample_band_pallas
from fsnet_tpu.ops.warp_fast import _indices_and_weights, grid_sample_band

N, H, W, C = 96, 192, 640, 3
BAND = 16
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
u = np.tile(np.linspace(-1, 1, W)[None, None, :], (N, H, 1))
v = np.tile(np.linspace(-1, 1, H)[None, :, None], (N, 1, W))
dx = 30 * np.sin(v * 3) * 2 / (W - 1); dy = 3 * np.cos(u * 4) * 2 / (H - 1)
grid = jnp.asarray(np.stack([u + dx, v + dy], -1).astype(np.float32))


def timeit_chain(name, fn, n=10):
    try:
        x = jax.block_until_ready(fn())
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        x = jax.block_until_ready(fn())
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return x


def run(dtype, group):
    im = img.astype(dtype)
    gr = grid.astype(dtype)

    def f():
        iw = _indices_and_weights(im.shape, gr, "bilinear", "border", True,
                                  BAND)
        return grid_sample_band_pallas(im, iw, BAND, iw["wx0"], iw["wx1"],
                                       iw["wy0"], iw["wy1"], group=group)
    return jax.jit(f)


for dtype, group in [(jnp.float32, 8), (jnp.float32, 16),
                     (jnp.bfloat16, 8), (jnp.bfloat16, 16)]:
    out = timeit_chain(f"pallas warp {dtype.__name__} G={group}",
                       run(dtype, group))
    if out is not None and dtype == jnp.float32 and group == 8:
        ref = jax.jit(lambda: grid_sample_band(img, grid, band=BAND))()
        print("  err vs einsum band:",
              float(jnp.max(jnp.abs(out - ref))), flush=True)
print("done", flush=True)
