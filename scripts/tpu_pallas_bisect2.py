"""Bisect round 2: grid-correct cases shaped like the production kernel."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KL, W, C, BAND, G = 48, 640, 3, 16, 2
LANE = 128
rng = np.random.RandomState(0)


def try_call(name, fn):
    try:
        jax.block_until_ready(fn())
        print(f"{name:44s} OK", flush=True)
        return True
    except Exception as e:
        print(f"{name:44s} FAIL: {str(e)[:100]}", flush=True)
        return False


band2d = jnp.asarray(rng.rand(KL, W).astype(np.float32))
ivec = jnp.asarray(rng.randint(0, W, (1, W)).astype(np.int32))
VM = pl.BlockSpec(memory_space=pltpu.VMEM)

# k7: single-tile gather [KL, 128] operand
band128 = jnp.asarray(rng.rand(KL, LANE).astype(np.float32))
i128 = jnp.asarray(rng.randint(0, LANE, (1, LANE)).astype(np.int32))
def k7(b_ref, i_ref, o_ref):
    idx = jnp.broadcast_to(i_ref[:], (KL, LANE))
    o_ref[:] = jnp.take_along_axis(b_ref[:], idx, axis=1)
try_call("k7 [48,128] gather", lambda: pl.pallas_call(
    k7, out_shape=jax.ShapeDtypeStruct((KL, LANE), jnp.float32),
    in_specs=[VM, VM], out_specs=VM)(band128, i128))

# k8: tile-decomposed gather over [48, 640] (2D, no grid)
def k8(b_ref, i_ref, o_ref):
    xidx = i_ref[:]
    tsel = xidx // LANE
    rem = xidx % LANE
    outs = []
    for u in range(W // LANE):
        sl = slice(u * LANE, (u + 1) * LANE)
        idx_u = jnp.broadcast_to(rem[:, sl], (KL, LANE))
        tsel_u = tsel[:, sl]
        acc = jnp.zeros((KL, LANE), jnp.float32)
        for t in range(W // LANE):
            src = b_ref[:, t * LANE:(t + 1) * LANE]
            gth = jnp.take_along_axis(src, idx_u, axis=1)
            acc = acc + jnp.where(tsel_u == t, gth, 0.0)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, axis=1)
ok8 = try_call("k8 tiled gather 2D", lambda: pl.pallas_call(
    k8, out_shape=jax.ShapeDtypeStruct((KL, W), jnp.float32),
    in_specs=[VM, VM], out_specs=VM)(band2d, ivec))
if ok8:
    out = pl.pallas_call(
        k8, out_shape=jax.ShapeDtypeStruct((KL, W), jnp.float32),
        in_specs=[VM, VM], out_specs=VM)(band2d, ivec)
    ref = np.asarray(band2d)[:, np.asarray(ivec)[0]]
    print("  k8 correct:", bool(np.allclose(np.asarray(out), ref)), flush=True)

# k9: 4D blocks with grid, body = copy only
N4, H4 = 4, 8
band4 = jnp.asarray(rng.rand(N4, H4, KL, W).astype(np.float32))
def k9(b_ref, o_ref):
    for g in range(G):
        o_ref[0, g] = b_ref[0, g, 0:C, :]
try_call("k9 4D grid copy", lambda: pl.pallas_call(
    k9, out_shape=jax.ShapeDtypeStruct((N4, H4, C, W), jnp.float32),
    grid=(N4, H4 // G),
    in_specs=[pl.BlockSpec((1, G, KL, W), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, G, C, W), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM))(band4))

# k10: 4D blocks + single-tile gather in body
ip4 = jnp.asarray(rng.randint(0, LANE, (N4, H4, 4, W)).astype(np.int32))
def k10(b_ref, i_ref, o_ref):
    for g in range(G):
        src = b_ref[0, g, :, 0:LANE]
        idx = jnp.broadcast_to(i_ref[0, g, 0:1, 0:LANE], (KL, LANE))
        gth = jnp.take_along_axis(src, idx, axis=1)
        o_ref[0, g] = gth[0:C, :]
try_call("k10 4D grid + tile gather", lambda: pl.pallas_call(
    k10, out_shape=jax.ShapeDtypeStruct((N4, H4, C, LANE), jnp.float32),
    grid=(N4, H4 // G),
    in_specs=[pl.BlockSpec((1, G, KL, W), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, G, 4, W), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, G, C, LANE), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM))(band4, ip4))

# k11: reshape(band, C, W) + sum inside 4D grid
def k11(b_ref, o_ref):
    for g in range(G):
        w = b_ref[0, g]
        o_ref[0, g] = jnp.sum(w.reshape(BAND, C, W), axis=0)
try_call("k11 4D grid + reshape-sum", lambda: pl.pallas_call(
    k11, out_shape=jax.ShapeDtypeStruct((N4, H4, C, W), jnp.float32),
    grid=(N4, H4 // G),
    in_specs=[pl.BlockSpec((1, G, KL, W), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, G, C, W), lambda n, h: (n, h, 0, 0),
                           memory_space=pltpu.VMEM))(band4))
print("done", flush=True)
