"""Bisect round 4: leading-dim pre-tiled design + isolate the crash class."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KL, W, LANE = 48, 640, 128
T = W // LANE
rng = np.random.RandomState(0)
VM = pl.BlockSpec(memory_space=pltpu.VMEM)

band_tiled = jnp.asarray(rng.rand(T, KL, LANE).astype(np.float32))
idx_tiled = jnp.asarray(rng.randint(0, LANE, (T, 1, LANE)).astype(np.int32))
tsel_tiled = jnp.asarray(rng.randint(0, T, (T, 1, LANE)).astype(np.int32))


def try_call(name, fn):
    try:
        jax.block_until_ready(fn())
        print(f"{name:44s} OK", flush=True)
        return True
    except Exception as e:
        print(f"{name:44s} FAIL: {str(e)[:100]}", flush=True)
        return False


# i: gather from leading-dim-indexed tiles (no lane slices anywhere)
def ki(b_ref, i_ref, o_ref):
    for u in range(T):
        acc = jnp.zeros((KL, LANE), jnp.float32)
        idx_u = jnp.broadcast_to(i_ref[u], (KL, LANE))
        for t in range(T):
            acc = acc + jnp.take_along_axis(b_ref[t], idx_u, axis=1)
        o_ref[u] = acc
try_call("i leading-dim tiles gather", lambda: pl.pallas_call(
    ki, out_shape=jax.ShapeDtypeStruct((T, KL, LANE), jnp.float32),
    in_specs=[VM, VM], out_specs=VM)(band_tiled, idx_tiled))

# ii: + mask select with precomputed tsel
def kii(b_ref, i_ref, s_ref, o_ref):
    for u in range(T):
        acc = jnp.zeros((KL, LANE), jnp.float32)
        idx_u = jnp.broadcast_to(i_ref[u], (KL, LANE))
        sel_u = jnp.broadcast_to(s_ref[u], (KL, LANE))
        for t in range(T):
            g = jnp.take_along_axis(b_ref[t], idx_u, axis=1)
            acc = acc + g * (sel_u == t).astype(jnp.float32)
        o_ref[u] = acc
ok = try_call("ii + tsel mask", lambda: pl.pallas_call(
    kii, out_shape=jax.ShapeDtypeStruct((T, KL, LANE), jnp.float32),
    in_specs=[VM, VM, VM], out_specs=VM)(band_tiled, idx_tiled, tsel_tiled))
if ok:
    out = pl.pallas_call(
        kii, out_shape=jax.ShapeDtypeStruct((T, KL, LANE), jnp.float32),
        in_specs=[VM, VM, VM], out_specs=VM)(band_tiled, idx_tiled, tsel_tiled)
    bt, it, st = (np.asarray(band_tiled), np.asarray(idx_tiled),
                  np.asarray(tsel_tiled))
    ref = np.zeros((T, KL, LANE), np.float32)
    for u in range(T):
        for t in range(T):
            g = np.take_along_axis(bt[t], np.broadcast_to(it[u], (KL, LANE)),
                                   axis=1)
            ref[u] += g * (st[u] == t)
    print("  ii correct:", bool(np.allclose(np.asarray(out), ref)), flush=True)

# iii: isolate lane-slice READ at offset 128 feeding gather
band2d = jnp.asarray(rng.rand(KL, W).astype(np.float32))
i128 = jnp.asarray(rng.randint(0, LANE, (1, LANE)).astype(np.int32))
def kiii(b_ref, i_ref, o_ref):
    src = b_ref[:, LANE:2 * LANE]
    idx = jnp.broadcast_to(i_ref[:], (KL, LANE))
    o_ref[:] = jnp.take_along_axis(src, idx, axis=1)
try_call("iii gather from lane-slice@128", lambda: pl.pallas_call(
    kiii, out_shape=jax.ShapeDtypeStruct((KL, LANE), jnp.float32),
    in_specs=[VM, VM], out_specs=VM)(band2d, i128))

# iv: isolate % / // on int vectors
ivec = jnp.asarray(rng.randint(0, W, (1, W)).astype(np.int32))
def kiv(i_ref, o_ref):
    o_ref[:] = ((i_ref[:] % LANE) + (i_ref[:] // LANE)).astype(jnp.float32)
try_call("iv int mod/div", lambda: pl.pallas_call(
    kiv, out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
    in_specs=[VM], out_specs=VM)(ivec))

# v: isolate lane-slice WRITE
def kv(b_ref, o_ref):
    for u in range(T):
        o_ref[:, u * LANE:(u + 1) * LANE] = b_ref[:, 0:LANE] + float(u)
try_call("v lane-slice writes", lambda: pl.pallas_call(
    kv, out_shape=jax.ShapeDtypeStruct((KL, W), jnp.float32),
    in_specs=[VM], out_specs=VM)(band2d))
print("done", flush=True)
