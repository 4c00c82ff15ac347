"""Bisect round 3: which op inside the tiled gather crashes."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KL, W, LANE = 48, 640, 128
T = W // LANE
rng = np.random.RandomState(0)
band2d = jnp.asarray(rng.rand(KL, W).astype(np.float32))
ivec = jnp.asarray(rng.randint(0, W, (1, W)).astype(np.int32))
VM = pl.BlockSpec(memory_space=pltpu.VMEM)


def try_call(name, kernel, check=False):
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((KL, W), jnp.float32),
            in_specs=[VM, VM], out_specs=VM)(band2d, ivec)
        out = jax.block_until_ready(out)
        msg = "OK"
        if check:
            ref = np.asarray(band2d)[:, np.asarray(ivec)[0]]
            msg += f" correct={bool(np.allclose(np.asarray(out), ref))}"
        print(f"{name:44s} {msg}", flush=True)
    except Exception as e:
        print(f"{name:44s} FAIL: {str(e)[:100]}", flush=True)


# A: gathers + plain sum (no tile select, wrong result but tests gather+acc)
def kA(b_ref, i_ref, o_ref):
    rem = i_ref[:] % LANE
    for u in range(T):
        sl = slice(u * LANE, (u + 1) * LANE)
        idx_u = jnp.broadcast_to(rem[:, sl], (KL, LANE))
        acc = jnp.zeros((KL, LANE), jnp.float32)
        for t in range(T):
            src = b_ref[:, t * LANE:(t + 1) * LANE]
            acc = acc + jnp.take_along_axis(src, idx_u, axis=1)
        o_ref[:, sl] = acc
try_call("A gathers+sum, slice-write", kA)

# B: + mask-multiply select
def kB(b_ref, i_ref, o_ref):
    tsel = i_ref[:] // LANE
    rem = i_ref[:] % LANE
    for u in range(T):
        sl = slice(u * LANE, (u + 1) * LANE)
        idx_u = jnp.broadcast_to(rem[:, sl], (KL, LANE))
        tsel_u = jnp.broadcast_to(tsel[:, sl], (KL, LANE))
        acc = jnp.zeros((KL, LANE), jnp.float32)
        for t in range(T):
            src = b_ref[:, t * LANE:(t + 1) * LANE]
            gth = jnp.take_along_axis(src, idx_u, axis=1)
            acc = acc + gth * (tsel_u == t).astype(jnp.float32)
        o_ref[:, sl] = acc
try_call("B + mask-multiply select", kB, check=True)

# C: jnp.where select (pre-broadcast cond)
def kC(b_ref, i_ref, o_ref):
    tsel = i_ref[:] // LANE
    rem = i_ref[:] % LANE
    for u in range(T):
        sl = slice(u * LANE, (u + 1) * LANE)
        idx_u = jnp.broadcast_to(rem[:, sl], (KL, LANE))
        tsel_u = jnp.broadcast_to(tsel[:, sl], (KL, LANE))
        acc = jnp.zeros((KL, LANE), jnp.float32)
        for t in range(T):
            src = b_ref[:, t * LANE:(t + 1) * LANE]
            gth = jnp.take_along_axis(src, idx_u, axis=1)
            acc = acc + jnp.where(tsel_u == t, gth, 0.0)
        o_ref[:, sl] = acc
try_call("C + where select (pre-broadcast)", kC, check=True)

# D: concat output instead of slice-write
def kD(b_ref, i_ref, o_ref):
    tsel = i_ref[:] // LANE
    rem = i_ref[:] % LANE
    outs = []
    for u in range(T):
        sl = slice(u * LANE, (u + 1) * LANE)
        idx_u = jnp.broadcast_to(rem[:, sl], (KL, LANE))
        tsel_u = jnp.broadcast_to(tsel[:, sl], (KL, LANE))
        acc = jnp.zeros((KL, LANE), jnp.float32)
        for t in range(T):
            src = b_ref[:, t * LANE:(t + 1) * LANE]
            gth = jnp.take_along_axis(src, idx_u, axis=1)
            acc = acc + gth * (tsel_u == t).astype(jnp.float32)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, axis=1)
try_call("D concat write", kD, check=True)
print("done", flush=True)
