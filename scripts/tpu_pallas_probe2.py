"""Isolate dynamic_gather crash + time MXU-dot warp kernel fallback."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit_chain(name, fn, n=8):
    try:
        x = jax.block_until_ready(fn())
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        x = jax.block_until_ready(fn())
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return x

rng = np.random.RandomState(0)

# cap test A: axis-0 gather, indices passed in pre-materialized
M0, K0 = 512, 128
src = jnp.asarray(rng.rand(M0, K0).astype(np.float32))
idx_full = jnp.asarray(
    np.tile(rng.randint(0, M0, (M0, 1)), (1, K0)).astype(np.int32))

def k_a(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

call_a = jax.jit(lambda: pl.pallas_call(
    k_a, out_shape=jax.ShapeDtypeStruct((M0, K0), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(src, idx_full))
out = timeit_chain("dyngather axis0 idx-materialized", call_a)
if out is not None:
    ref = np.asarray(src)[np.asarray(idx_full)[:, 0]]
    print("  correct:", bool(np.allclose(np.asarray(out), ref)), flush=True)

# cap test B: axis-1 (lane) gather
idxL = jnp.asarray(
    np.tile(rng.randint(0, K0, (1, K0)), (M0, 1)).astype(np.int32))

def k_b(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

call_b = jax.jit(lambda: pl.pallas_call(
    k_b, out_shape=jax.ShapeDtypeStruct((M0, K0), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(src, idxL))
out = timeit_chain("dyngather axis1 idx-materialized", call_b)
if out is not None:
    ref = np.take_along_axis(np.asarray(src), np.asarray(idxL), axis=1)
    print("  correct:", bool(np.allclose(np.asarray(out), ref)), flush=True)

# ---- MXU-dot warp kernel (no gather): Wmat built in VMEM + pl.dot ----------
N, H, WI, C = 96, 192, 640, 3
BAND = 16
KL = BAND * C
img = jnp.asarray(rng.rand(N, H, WI, C).astype(np.float32))
u = np.tile(np.linspace(-1, 1, WI)[None, None, :], (N, H, 1))
v = np.tile(np.linspace(-1, 1, H)[None, :, None], (N, 1, WI))
dx = 30 * np.sin(v * 3) * 2 / (WI - 1); dy = 3 * np.cos(u * 4) * 2 / (H - 1)
grid = jnp.asarray(np.stack([u + dx, v + dy], -1).astype(np.float32))

from fsnet_tpu.ops.warp_fast import _gather_bands, _indices_and_weights
iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True, BAND)

# bands via transpose-free gather: imgT2 [N, W, H, C]; gather along H axis
imgT2 = jnp.transpose(img, (0, 2, 1, 3))  # [N, W, H, C]

def bands_w_fast():
    band_rows = (iw["ymin"][:, :, None]
                 + jnp.arange(BAND)[None, None, :])        # [N, Ho, band]
    idx = band_rows[:, :, None, :, None]                   # [N,Ho,1,band,1]
    out = jnp.take_along_axis(imgT2[:, None], idx, axis=3) # [N,Ho,W,band,C]
    return out.reshape(N, H, WI, KL)

bw = timeit_chain("bands_w transpose-free gather", jax.jit(bands_w_fast))

ipack = jnp.stack([iw["x0c"], iw["x1c"], iw["d0"], iw["d1"]],
                  axis=-1).astype(jnp.int32)
fpack = jnp.stack([iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"]],
                  axis=-1).astype(jnp.float32)

S_np = np.zeros((KL, C), np.float32)
for d in range(BAND):
    for c in range(C):
        S_np[d * C + c, c] = 1.0
S = jnp.asarray(S_np)


def warp_kernel_gather(ipack_ref, fpack_ref, band_ref, S_ref, out_ref):
    band = band_ref[0, 0]
    x0 = jnp.broadcast_to(ipack_ref[0, 0, :, 0:1], (WI, KL))
    x1 = jnp.broadcast_to(ipack_ref[0, 0, :, 1:2], (WI, KL))
    g0 = jnp.take_along_axis(band, x0, axis=0)
    g1 = jnp.take_along_axis(band, x1, axis=0)
    hz = g0 * fpack_ref[0, 0, :, 0:1] + g1 * fpack_ref[0, 0, :, 1:2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (WI, KL), 1)
    dl = lane // C
    wv = ((dl == ipack_ref[0, 0, :, 2:3]) * fpack_ref[0, 0, :, 2:3]
          + (dl == ipack_ref[0, 0, :, 3:4]) * fpack_ref[0, 0, :, 3:4])
    out_ref[0, 0] = jnp.dot(hz * wv, S_ref[:],
                            preferred_element_type=jnp.float32)


def warp_kernel_onehot(ipack_ref, fpack_ref, band_ref, S_ref, out_ref):
    band = band_ref[0, 0]                                  # [W, KL]
    rows = jax.lax.broadcasted_iota(jnp.int32, (WI, WI), 1)  # [Wo, W]
    oh = ((rows == ipack_ref[0, 0, :, 0:1]) * fpack_ref[0, 0, :, 0:1]
          + (rows == ipack_ref[0, 0, :, 1:2]) * fpack_ref[0, 0, :, 1:2])
    hz = jnp.dot(oh.astype(jnp.float32), band,
                 preferred_element_type=jnp.float32)       # [Wo, KL]
    lane = jax.lax.broadcasted_iota(jnp.int32, (WI, KL), 1)
    dl = lane // C
    wv = ((dl == ipack_ref[0, 0, :, 2:3]) * fpack_ref[0, 0, :, 2:3]
          + (dl == ipack_ref[0, 0, :, 3:4]) * fpack_ref[0, 0, :, 3:4])
    out_ref[0, 0] = jnp.dot(hz * wv, S_ref[:],
                            preferred_element_type=jnp.float32)


def make_call(kernel, bw_arr):
    return jax.jit(lambda: pl.pallas_call(
        kernel,
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
    )(ipack, fpack, bw_arr, S))


if bw is not None:
    out = timeit_chain("pallas warp (dyngather)", make_call(warp_kernel_gather, bw))
    if out is not None:
        from fsnet_tpu.ops.warp_fast import grid_sample_band
        ref = jax.jit(lambda: grid_sample_band(img, grid, band=BAND))()
        print("  err:", float(jnp.max(jnp.abs(out - ref))), flush=True)

    out = timeit_chain("pallas warp (onehot pl.dot)", make_call(warp_kernel_onehot, bw))
    if out is not None:
        from fsnet_tpu.ops.warp_fast import grid_sample_band
        ref = jax.jit(lambda: grid_sample_band(img, grid, band=BAND))()
        print("  err:", float(jnp.max(jnp.abs(out - ref))), flush=True)

print("done", flush=True)
