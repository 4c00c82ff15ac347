"""Isolate band-warp costs on TPU: einsum orientations, fwd vs bwd, masks."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fsnet_tpu.ops.warp_fast import grid_sample_band

N, H, W, C = 96, 192, 640, 3
BAND = 16

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
# warp-like grid
u = np.tile(np.linspace(-1, 1, W)[None, None, :], (N, H, 1))
v = np.tile(np.linspace(-1, 1, H)[None, :, None], (N, 1, W))
dx = 30 * np.sin(v * 3) * 2 / (W - 1)
dy = 3 * np.cos(u * 4) * 2 / (H - 1)
grid0 = jnp.asarray(np.stack([u + dx, v + dy], -1).astype(np.float32))


def timeit_chain(name, body, x0, n=8):
    body_j = jax.jit(body)
    x = jax.block_until_ready(body_j(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        x = body_j(x)
    jax.block_until_ready(x)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)


# 1. current band warp fwd
def warp_fwd(g):
    out = grid_sample_band(img, g, band=BAND)
    return g + 1e-12 * jnp.mean(out)
timeit_chain("band warp fwd (current)", warp_fwd, grid0)

# 2. fwd+bwd
def warp_grad(g):
    gr = jax.grad(lambda gg: jnp.sum(grid_sample_band(img, gg, band=BAND)))(g)
    return g + 1e-12 * gr
timeit_chain("band warp fwd+bwd (current)", warp_grad, grid0)

# 3. nearest mask warp fwd
mask_img = jnp.ones((N, H, W, 1), jnp.float32)
def mask_warp(g):
    out = grid_sample_band(mask_img, g, mode="nearest", padding_mode="zeros",
                           band=BAND)
    return g + 1e-12 * jnp.mean(out)
timeit_chain("nearest mask warp fwd", mask_warp, grid0)

# --- orientation experiments on the stage-1 contraction ---------------------
from fsnet_tpu.ops.warp_fast import _gather_bands, _indices_and_weights, _xmat

iw = _indices_and_weights(img.shape, grid0, "bilinear", "border", True, BAND)
bands = _gather_bands(img, iw["ymin"], BAND)
bands_t = bands.transpose(0, 1, 2, 4, 3).reshape(N, H, BAND * C, W)

def stage1_current(g):
    iw2 = _indices_and_weights(img.shape, g, "bilinear", "border", True, BAND)
    Wmat = _xmat(iw2, W, iw2["wx0"], iw2["wx1"]).astype(jnp.float32)
    hz = jnp.einsum("bhkw,bhwo->bhko", bands_t, Wmat)
    return g + 1e-12 * jnp.mean(hz)
timeit_chain("stage1 einsum bhkw,bhwo->bhko", stage1_current, grid0)

def stage1_v6style(g):
    iw2 = _indices_and_weights(img.shape, g, "bilinear", "border", True, BAND)
    # onehot FIRST operand, output-major: out[b,h,o,k] = sum_w M[b,h,o,w] B[b,h,w? ...]
    Wmat = _xmat(iw2, W, iw2["wx0"], iw2["wx1"]).astype(jnp.float32)
    WmatT = jnp.swapaxes(Wmat, 2, 3)  # [B, Ho, Wo, W]
    bands_w_last = jnp.swapaxes(bands_t, 2, 3)  # [B, Ho, W, band*C]
    hz = jnp.einsum("bhow,bhwk->bhok", WmatT, bands_w_last)
    return g + 1e-12 * jnp.mean(hz)
timeit_chain("stage1 einsum bhow,bhwk->bhok", stage1_v6style, grid0)

# 4. exact-gather nearest warp (maybe faster for masks than band)
from fsnet_tpu.ops.warp import grid_sample as gs_exact
def mask_warp_exact(g):
    out = gs_exact(mask_img, g, mode="nearest", padding_mode="zeros")
    return g + 1e-12 * jnp.mean(out)
timeit_chain("nearest mask warp exact-gather", mask_warp_exact, grid0)

print("done", flush=True)
