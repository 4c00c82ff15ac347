"""Probe: dynamic leading-dim tile indexing inside the warp kernel.

Question: can the kernel replace its all-T source-tile sweep (2*T^2 gathers
per row group) with a small window b_ref[t0+k] where t0 comes from a
scalar-prefetch ref?  Mosaic constraints so far (bisect1-4): lane-dim dynamic
slices crash; leading-dim PRE-TILED operands work.  Here we test dynamic
leading-dim indexing.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KL, W, LANE = 48, 640, 128
T = W // LANE
rng = np.random.RandomState(0)
VM = pl.BlockSpec(memory_space=pltpu.VMEM)

band_tiled = jnp.asarray(rng.rand(T, KL, LANE).astype(np.float32))
idx_tiled = jnp.asarray(rng.randint(0, LANE, (T, 1, LANE)).astype(np.int32))
t0_host = rng.randint(0, T - 1, (T,)).astype(np.int32)
t0s = jnp.asarray(t0_host)


def try_call(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"{name:46s} OK", flush=True)
        return out
    except Exception as e:
        print(f"{name:46s} FAIL: {str(e)[:120]}", flush=True)
        return None


# a) dynamic leading-dim read from SMEM scalar (grid-independent)
def ka(t0_ref, b_ref, i_ref, o_ref):
    for u in range(T):
        t0 = t0_ref[u]
        idx_u = jnp.broadcast_to(i_ref[u], (KL, LANE))
        src = b_ref[t0]
        o_ref[u] = jnp.take_along_axis(src, idx_u, axis=1)


out = try_call("a dyn lead-dim read + gather", lambda: pl.pallas_call(
    ka,
    out_shape=jax.ShapeDtypeStruct((T, KL, LANE), jnp.float32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[VM, VM], out_specs=VM),
)(t0s, band_tiled, idx_tiled))
if out is not None:
    ref = np.stack([
        np.take_along_axis(np.asarray(band_tiled)[t0_host[u]],
                           np.broadcast_to(np.asarray(idx_tiled)[u],
                                           (KL, LANE)), axis=1)
        for u in range(T)])
    print("  a correct:", bool(np.allclose(np.asarray(out), ref)), flush=True)

# b) 2-tile window combine: g = sel*gather(b[t0]) + (1-sel)*gather(b[t0+1])
tsel = jnp.asarray(rng.randint(0, 2, (T, 1, LANE)).astype(np.int32))


def kb(t0_ref, b_ref, i_ref, s_ref, o_ref):
    for u in range(T):
        t0 = t0_ref[u]
        idx_u = jnp.broadcast_to(i_ref[u], (KL, LANE))
        sel_u = jnp.broadcast_to(s_ref[u], (KL, LANE))
        g0 = jnp.take_along_axis(b_ref[t0], idx_u, axis=1)
        g1 = jnp.take_along_axis(b_ref[t0 + 1], idx_u, axis=1)
        o_ref[u] = g0 * (sel_u == 0) + g1 * (sel_u == 1)


out = try_call("b 2-tile window combine", lambda: pl.pallas_call(
    kb,
    out_shape=jax.ShapeDtypeStruct((T, KL, LANE), jnp.float32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[VM, VM, VM], out_specs=VM),
)(t0s, band_tiled, idx_tiled, tsel))
if out is not None:
    bt, it, st = (np.asarray(band_tiled), np.asarray(idx_tiled),
                  np.asarray(tsel))
    ref = np.zeros((T, KL, LANE), np.float32)
    for u in range(T):
        g0 = np.take_along_axis(bt[t0_host[u]],
                                np.broadcast_to(it[u], (KL, LANE)), axis=1)
        g1 = np.take_along_axis(bt[t0_host[u] + 1],
                                np.broadcast_to(it[u], (KL, LANE)), axis=1)
        ref[u] = g0 * (st[u] == 0) + g1 * (st[u] == 1)
    print("  b correct:", bool(np.allclose(np.asarray(out), ref)), flush=True)

# c) timing: all-T sweep vs 2-tile window at realistic shapes
B, G, Ho = 12, 8, 192
NGRID = B * (Ho // G)


def bench(name, fn, *args):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    import time
    n = 20
    t = time.perf_counter()
    prev = o
    for _ in range(n):
        prev = f(*args)
    jax.block_until_ready(prev)
    dt = (time.perf_counter() - t) / n * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)


big_band = jnp.asarray(
    rng.rand(B, Ho // G, G, T, KL, LANE).astype(np.float32))
big_idx = jnp.asarray(
    rng.randint(0, LANE, (B, Ho // G, G, T, 1, LANE)).astype(np.int32))
big_sel2 = jnp.asarray(
    rng.randint(0, 2, (B, Ho // G, G, T, 1, LANE)).astype(np.int32))
big_selT = jnp.asarray(
    rng.randint(0, T, (B, Ho // G, G, T, 1, LANE)).astype(np.int32))
big_t0 = jnp.asarray(
    rng.randint(0, T - 1, (B * (Ho // G) * G * T,)).astype(np.int32))


def k_sweep(b_ref, i_ref, s_ref, o_ref, *, G, T):
    for g in range(G):
        for u in range(T):
            idx_u = jnp.broadcast_to(i_ref[0, 0, g, u], (KL, LANE))
            sel_u = jnp.broadcast_to(s_ref[0, 0, g, u], (KL, LANE))
            acc = jnp.zeros((KL, LANE), jnp.float32)
            for t in range(T):
                gt = jnp.take_along_axis(b_ref[0, 0, g, t], idx_u, axis=1)
                acc = acc + gt * (sel_u == t).astype(jnp.float32)
            o_ref[0, 0, g, u] = acc


def sweep(b, i, s):
    return pl.pallas_call(
        functools.partial(k_sweep, G=G, T=T),
        out_shape=jax.ShapeDtypeStruct((B, Ho // G, G, T, KL, LANE),
                                       jnp.float32),
        grid=(B, Ho // G),
        in_specs=[
            pl.BlockSpec((1, 1, G, T, KL, LANE), lambda n, h: (n, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, T, 1, LANE), lambda n, h: (n, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, T, 1, LANE), lambda n, h: (n, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, T, KL, LANE),
                               lambda n, h: (n, h, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM))(b, i, s)


def k_win(t0_ref, b_ref, i_ref, s_ref, o_ref, *, G, T):
    n = pl.program_id(0)
    h = pl.program_id(1)
    base = (n * (Ho // G) + h) * G * T
    for g in range(G):
        for u in range(T):
            t0 = t0_ref[base + g * T + u]
            idx_u = jnp.broadcast_to(i_ref[0, 0, g, u], (KL, LANE))
            sel_u = jnp.broadcast_to(s_ref[0, 0, g, u], (KL, LANE))
            g0 = jnp.take_along_axis(b_ref[0, 0, g, t0], idx_u, axis=1)
            g1 = jnp.take_along_axis(b_ref[0, 0, g, t0 + 1], idx_u, axis=1)
            o_ref[0, 0, g, u] = (g0 * (sel_u == 0).astype(jnp.float32)
                                 + g1 * (sel_u == 1).astype(jnp.float32))


def window(t0, b, i, s):
    return pl.pallas_call(
        functools.partial(k_win, G=G, T=T),
        out_shape=jax.ShapeDtypeStruct((B, Ho // G, G, T, KL, LANE),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, Ho // G),
            in_specs=[
                pl.BlockSpec((1, 1, G, T, KL, LANE),
                             lambda n, h, t0: (n, h, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, G, T, 1, LANE),
                             lambda n, h, t0: (n, h, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, G, T, 1, LANE),
                             lambda n, h, t0: (n, h, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, G, T, KL, LANE),
                                   lambda n, h, t0: (n, h, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)))(t0, b, i, s)


try:
    bench("c sweep (2T^2 gathers)", sweep, big_band, big_idx, big_selT)
except Exception as e:
    print("c sweep FAIL:", str(e)[:120], flush=True)
try:
    bench("c window (4 gathers/tile)", window, big_t0, big_band, big_idx,
          big_sel2)
except Exception as e:
    print("c window FAIL:", str(e)[:120], flush=True)
print("done", flush=True)
