"""Bisect which kernel feature crashes the remote Mosaic compiler."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KL, W, C, BAND, G = 48, 640, 3, 16, 2
rng = np.random.RandomState(0)
band = jnp.asarray(rng.rand(KL, W).astype(np.float32))
idxW = jnp.asarray(np.tile(rng.randint(0, W, (1, W)), (KL, 1)).astype(np.int32))
vec = jnp.asarray(rng.rand(1, W).astype(np.float32))
ivec = jnp.asarray(rng.randint(0, W, (1, W)).astype(np.int32))


def try_kernel(name, kernel, out_shape, args, in_specs, out_specs):
    try:
        call = jax.jit(lambda: pl.pallas_call(
            kernel, out_shape=out_shape, in_specs=in_specs,
            out_specs=out_specs)(*args))
        jax.block_until_ready(call())
        print(f"{name:40s} OK", flush=True)
    except Exception as e:
        print(f"{name:40s} FAIL: {str(e)[:120]}", flush=True)


VM = pl.BlockSpec(memory_space=pltpu.VMEM)

# k1: plain lane gather with materialized idx (known good)
def k1(b_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(b_ref[:], i_ref[:], axis=1)
try_kernel("k1 lane gather materialized", k1,
           jax.ShapeDtypeStruct((KL, W), jnp.float32),
           (band, idxW), [VM, VM], VM)

# k2: gather with idx broadcast from [1, W] inside kernel
def k2(b_ref, i_ref, o_ref):
    idx = jnp.broadcast_to(i_ref[:], (KL, W))
    o_ref[:] = jnp.take_along_axis(b_ref[:], idx, axis=1)
try_kernel("k2 gather broadcast idx", k2,
           jax.ShapeDtypeStruct((KL, W), jnp.float32),
           (band, ivec), [VM, VM], VM)

# k3: iota // C compare weights
def k3(b_ref, i_ref, f_ref, o_ref):
    d = jax.lax.broadcasted_iota(jnp.int32, (KL, W), 0) // C
    wv = (d == i_ref[:]) * f_ref[:]
    o_ref[:] = b_ref[:] * wv
try_kernel("k3 iota//C weights", k3,
           jax.ShapeDtypeStruct((KL, W), jnp.float32),
           (band, ivec, vec), [VM, VM, VM], VM)

# k4: sublane-split reshape + sum
def k4(b_ref, o_ref):
    o_ref[:] = jnp.sum(b_ref[:].reshape(BAND, C, W), axis=0)
try_kernel("k4 reshape+sum sublanes", k4,
           jax.ShapeDtypeStruct((C, W), jnp.float32),
           (band,), [VM], VM)

# k5: 4D grid blocks + small-sublane out write
N4, H4 = 2, 4
band4 = jnp.asarray(rng.rand(N4, H4, KL, W).astype(np.float32))
def k5(b_ref, o_ref):
    for g in range(G):
        o_ref[0, g] = b_ref[0, g, 0:C, :]
try_kernel("k5 4D blocks + C-row write", k5,
           jax.ShapeDtypeStruct((N4, H4, C, W), jnp.float32),
           (band4,),
           [pl.BlockSpec((1, G, KL, W), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM)],
           pl.BlockSpec((1, G, C, W), lambda n, h: (n, h, 0, 0),
                        memory_space=pltpu.VMEM))

# k6: gather INSIDE 4D grid blocks
ip4 = jnp.asarray(rng.randint(0, W, (N4, H4, 4, W)).astype(np.int32))
def k6(b_ref, i_ref, o_ref):
    for g in range(G):
        bm = b_ref[0, g]
        idx = jnp.broadcast_to(i_ref[0, g, 0:1, :], (KL, W))
        gth = jnp.take_along_axis(bm, idx, axis=1)
        o_ref[0, g] = gth[0:C, :]
try_kernel("k6 gather in 4D blocks", k6,
           jax.ShapeDtypeStruct((N4, H4, C, W), jnp.float32),
           (band4, ip4),
           [pl.BlockSpec((1, G, KL, W), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 4, W), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM)],
           pl.BlockSpec((1, G, C, W), lambda n, h: (n, h, 0, 0),
                        memory_space=pltpu.VMEM))
print("done", flush=True)
