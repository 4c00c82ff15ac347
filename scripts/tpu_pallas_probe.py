"""Probe Mosaic in-kernel sublane gather + prototype Pallas warp kernel."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit_chain(name, fn, n=8):
    try:
        x = jax.block_until_ready(fn())
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:250]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        x = jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return x

# ---- capability: take_along_axis along sublanes with per-sublane indices ---
W0, K0 = 512, 128
rng = np.random.RandomState(0)
src = jnp.asarray(rng.rand(W0, K0).astype(np.float32))
idxcol = jnp.asarray(rng.randint(0, W0, (W0, 1)).astype(np.int32))

def gather_kernel(src_ref, idx_ref, out_ref):
    idx2d = jnp.broadcast_to(idx_ref[:], (W0, K0))
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx2d, axis=0)

gather_call = jax.jit(lambda: pl.pallas_call(
    gather_kernel,
    out_shape=jax.ShapeDtypeStruct((W0, K0), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(src, idxcol))
out = timeit_chain("pallas take_along_axis sublane", gather_call)
if out is not None:
    ref = np.asarray(src)[np.asarray(idxcol)[:, 0]]
    print("gather correct:", bool(np.allclose(np.asarray(out), ref)),
          flush=True)

# ---- prototype warp kernel -------------------------------------------------
N, H, WI, C = 96, 192, 640, 3
BAND = 16
KL = BAND * C  # 48 lanes
img = jnp.asarray(rng.rand(N, H, WI, C).astype(np.float32))
u = np.tile(np.linspace(-1, 1, WI)[None, None, :], (N, H, 1))
v = np.tile(np.linspace(-1, 1, H)[None, :, None], (N, 1, WI))
dx = 30 * np.sin(v * 3) * 2 / (WI - 1); dy = 3 * np.cos(u * 4) * 2 / (H - 1)
grid = jnp.asarray(np.stack([u + dx, v + dy], -1).astype(np.float32))

from fsnet_tpu.ops.warp_fast import _bands_w_of, _indices_and_weights
iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True, BAND)
bands_w = jax.jit(lambda: _bands_w_of(img, iw, BAND))()  # [N, H, W, BAND*C]

ipack = jnp.stack([iw["x0c"], iw["x1c"], iw["d0"], iw["d1"]],
                  axis=-1).astype(jnp.int32)             # [N, H, Wo, 4]
fpack = jnp.stack([iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"]],
                  axis=-1).astype(jnp.float32)           # [N, H, Wo, 4]

# constant strided-reduction matrix: S[d*C + c, c] = 1
S_np = np.zeros((KL, C), np.float32)
for d in range(BAND):
    for c in range(C):
        S_np[d * C + c, c] = 1.0
S = jnp.asarray(S_np)


def warp_kernel(ipack_ref, fpack_ref, band_ref, S_ref, out_ref):
    band = band_ref[0, 0]                                # [W, KL]
    x0 = ipack_ref[0, 0, :, 0:1]                         # [Wo, 1]
    x1 = ipack_ref[0, 0, :, 1:2]
    d0 = ipack_ref[0, 0, :, 2:3]
    d1 = ipack_ref[0, 0, :, 3:4]
    wx0 = fpack_ref[0, 0, :, 0:1]
    wx1 = fpack_ref[0, 0, :, 1:2]
    wy0 = fpack_ref[0, 0, :, 2:3]
    wy1 = fpack_ref[0, 0, :, 3:4]

    g0 = jnp.take_along_axis(band, jnp.broadcast_to(x0, (WI, KL)), axis=0)
    g1 = jnp.take_along_axis(band, jnp.broadcast_to(x1, (WI, KL)), axis=0)
    hz = g0 * wx0 + g1 * wx1                             # [Wo, KL]

    lane = jax.lax.broadcasted_iota(jnp.int32, (WI, KL), 1)
    d_of_lane = lane // C
    wv = ((d_of_lane == d0) * wy0 + (d_of_lane == d1) * wy1)
    out_ref[0, 0] = jnp.dot(hz * wv, S_ref[:],
                            preferred_element_type=jnp.float32)  # [Wo, C]


warp_call = jax.jit(lambda: pl.pallas_call(
    warp_kernel,
    out_shape=jax.ShapeDtypeStruct((N, H, WI, C), jnp.float32),
    grid=(N, H),
    in_specs=[
        pl.BlockSpec((1, 1, WI, 4), lambda n, h: (n, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WI, 4), lambda n, h: (n, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WI, KL), lambda n, h: (n, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((KL, C), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, 1, WI, C), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM),
)(ipack, fpack, bands_w, S))

out = timeit_chain("pallas warp kernel (bands precomputed)", warp_call)
if out is not None:
    from fsnet_tpu.ops.warp_fast import grid_sample_band
    ref = jax.jit(lambda: grid_sample_band(img, grid, band=BAND))()
    err = float(jnp.max(jnp.abs(out - ref)))
    print("pallas warp max err vs band:", err, flush=True)

# end-to-end: bands gather + kernel
def full_warp():
    bw = _bands_w_of(img, iw, BAND)
    return pl.pallas_call(
        warp_kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, WI, C), jnp.float32),
        grid=(N, H),
        in_specs=[
            pl.BlockSpec((1, 1, WI, 4), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WI, 4), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WI, KL), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, C), lambda n, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, WI, C), lambda n, h: (n, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )(ipack, fpack, bw, S)

timeit_chain("pallas warp incl. band gather", jax.jit(full_warp))
print("done", flush=True)
