"""Benchmark gather formulations for grid_sample on TPU to find the fast path."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, H, W, C = 96, 192, 640, 3
P = H * W

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
# warp-like indices: near-identity with smooth perturbation (sorted-ish)
base_y = np.tile(np.arange(H)[None, :, None], (N, 1, W)).astype(np.int32)
base_x = np.tile(np.arange(W)[None, None, :], (N, H, 1)).astype(np.int32)
iy = jnp.asarray(np.clip(base_y + rng.randint(-8, 8, base_y.shape), 0, H - 1))
ix = jnp.asarray(np.clip(base_x + rng.randint(-8, 8, base_x.shape), 0, W - 1))


def timeit_chain(name, body, x0, n=5):
    body_j = jax.jit(body)
    x = jax.block_until_ready(body_j(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        x = body_j(x)
    jax.block_until_ready(x)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)


# v1: take_along_axis over [N, P, C]
def v1(carry):
    flat = img.reshape(N, P, C)
    idx = (iy * W + ix).reshape(N, P, 1) + carry.astype(jnp.int32) * 0
    out = jnp.take_along_axis(flat, idx, axis=1)
    return carry + 1e-12 * jnp.mean(out)
timeit_chain("v1 take_along_axis [N,P,C] ax1", v1, jnp.zeros(()))

# v2: advanced indexing via vmap over batch
def v2(carry):
    def one(im, yy, xx):
        return im[yy, xx]
    out = jax.vmap(one)(img, iy + carry.astype(jnp.int32) * 0, ix)
    return carry + 1e-12 * jnp.mean(out)
timeit_chain("v2 vmap img[iy,ix]", v2, jnp.zeros(()))

# v3: channels-major [N, C, P], gather along last axis
img_cm = jnp.transpose(img, (0, 3, 1, 2)).reshape(N, C, P)
def v3(carry):
    idx = (iy * W + ix).reshape(N, 1, P) + carry.astype(jnp.int32) * 0
    out = jnp.take_along_axis(img_cm, jnp.broadcast_to(idx, (N, C, P)), axis=2)
    return carry + 1e-12 * jnp.mean(out)
timeit_chain("v3 take_along_axis [N,C,P] ax2", v3, jnp.zeros(()))

# v4: lax.gather with indices_are_sorted on flattened [N*P] index space
flat_all = img.reshape(N * P, C)
offsets = (np.arange(N) * P)[:, None, None]
def v4(carry):
    idx = ((iy * W + ix) + jnp.asarray(offsets)).reshape(-1) \
        + carry.astype(jnp.int32) * 0
    out = jnp.take(flat_all, idx, axis=0, indices_are_sorted=True)
    return carry + 1e-12 * jnp.mean(out)
timeit_chain("v4 take sorted [N*P,C] ax0", v4, jnp.zeros(()))

# v5: row gather then column gather (two stages, both along sublane axis)
def v5(carry):
    # stage 1: per output row, gather source rows -> but iy varies per pixel;
    # use per-pixel row gather: rows [N, P, W*C] would blow memory. Instead
    # gather within rows after gathering per-pixel rows is same cost. Skip to
    # direct one-shot gather of row-pairs: gather slice of 2 consecutive
    # pixels (x and x+1) in one go: reshape [N, H, W*C] gather along axis 1?
    # Here: gather along H with full row copy for a PER-ROW y (not per-pixel):
    # approximates cost of row-wise warp.
    row_y = iy[:, :, 0] + carry.astype(jnp.int32) * 0  # [N, H]
    rows = jnp.take_along_axis(
        img.reshape(N, H, W * C), row_y[:, :, None], axis=1)
    return carry + 1e-12 * jnp.mean(rows)
timeit_chain("v5 row-gather only [N,H,W*C]", v5, jnp.zeros(()))

# v6: one-hot matmul over W only (per-row horizontal warp cost estimate)
def v6(carry):
    xw = ix[:, :, :].astype(jnp.float32) + carry * 0
    onehot = jax.nn.one_hot(ix, W, dtype=jnp.float32)  # [N, H, W, W]
    out = jnp.einsum("nhwk,nhkc->nhwc", onehot, img)
    return carry + 1e-12 * jnp.mean(out) + 0 * jnp.mean(xw)
timeit_chain("v6 one-hot matmul over W", v6, jnp.zeros(()))

print("done", flush=True)
