"""Measure this chip's achievable peaks: HBM bandwidth, MXU bf16 TFLOP/s,
and VPU elementwise throughput. These are the denominators for the
speed-of-light attribution of the flagship train step (BASELINE.md roofline
section). Methodology per docs/performance.md: K-vs-3K differencing inside
one jitted lax.scan cancels the fixed per-call axon dispatch cost; a
device->host read is the timing barrier.

Usage: python scripts/tpu_roofline.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def timed_scan(body, x0, reps=4, min_delta_s=1.0):
    """Per-iteration seconds of body inside a jitted scan, differenced.

    Axon's per-dispatch overhead is tens of ms and VARIES by that much run
    to run, so the k-vs-3k delta must be >= ~1 s of real device work or the
    result is noise (the first attempt of this script measured *negative*
    HBM bandwidth with a 12-iteration delta). Adaptively doubles k until
    run(3k) - run(k) >= min_delta_s, then returns delta / (2k).
    """
    def run(k):
        @jax.jit
        def f(x):
            def step(c, _):
                return body(c), None
            c, _ = jax.lax.scan(step, x, None, length=k)
            # return a SCALAR: converting the full carry to numpy would ship
            # the whole tensor over the axon tunnel each rep (seconds of
            # variance — the first run of this script measured transfer
            # noise, not device work). The scan still runs every iteration:
            # the carry chain is sequential, XLA cannot slice through it.
            leaf = jax.tree_util.tree_leaves(c)[0]
            return leaf.ravel()[0].astype(jnp.float32)
        out = f(x0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x0)
            _ = float(out)  # 4-byte device->host read: true barrier
            best = min(best, time.perf_counter() - t0)
        return best

    k = 8
    while True:
        t_small, t_big = run(k), run(3 * k)
        delta = t_big - t_small
        if delta >= min_delta_s or k >= 4096:
            return delta / (2 * k)
        # scale k so the next delta lands ~2x past the floor
        est = max(delta, 1e-3) / (2 * k)
        k = min(4096, max(2 * k, int(2 * min_delta_s / est / 2) or 2 * k))


results = {}

# ---------------------------------------------------------------- HBM BW
# y = x + 1 on a large bf16 tensor: 1 read + 1 write per element.
for name, dtype, mb in [("bf16", jnp.bfloat16, 256), ("f32", jnp.float32, 256)]:
    n = mb * 2**20 // jnp.dtype(dtype).itemsize
    x = jnp.arange(n, dtype=jnp.float32).astype(dtype).reshape(-1, 1024)
    t = timed_scan(lambda v: v + jnp.asarray(1, dtype), x)
    bw = 2 * x.size * x.dtype.itemsize / t
    results[f"hbm_bw_{name}_GBs"] = bw / 1e9
    print(f"HBM add {name}: {t*1e3:.3f} ms/iter -> {bw/1e9:.0f} GB/s", flush=True)

# ------------------------------------------------------------- MXU peak
# big bf16 matmul, f32 accumulation (production config)
m = 4096
a = jnp.ones((m, m), jnp.bfloat16)
t = timed_scan(lambda v: jnp.dot(v, a, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16), a)
fl = 2 * m**3 / t
results["mxu_bf16_TFLOPs"] = fl / 1e12
print(f"MXU bf16 {m}^3: {t*1e3:.3f} ms/iter -> {fl/1e12:.1f} TFLOP/s", flush=True)

# small-N matmul as used by banded SSIM pooling ([H,H] band-3 @ [H, W*C])
for hh, wc in [(192, 640 * 3), (640, 192 * 3)]:
    pool = jnp.ones((hh, hh), jnp.bfloat16)
    xs = jnp.ones((96, hh, wc), jnp.bfloat16)
    t = timed_scan(
        lambda v: jnp.einsum("ij,njc->nic", pool, v,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16), xs)
    fl = 2 * 96 * hh * hh * wc / t
    print(f"pool-matmul [{hh},{hh}]@[96,{hh},{wc}]: {t*1e3:.3f} ms/iter "
          f"-> {fl/1e12:.1f} TFLOP/s (dense-equivalent)", flush=True)
    results[f"pool_matmul_{hh}_TFLOPs"] = fl / 1e12

# ------------------------------------------------------------- VPU rate
# dependent elementwise chain on an HBM-small / VMEM-resident tensor:
# measures f32 VPU op issue throughput (ops/s), the warp kernels' bound.
x = jnp.ones((8 * 128, 1024), jnp.float32)  # 4 MB: VMEM-resident inside scan


def poly_chain(v):
    for _ in range(64):
        v = v * 1.0000001 + 0.0000001
    return v


t = timed_scan(poly_chain, x)
ops = 64 * x.size / t  # fma = 1 VPU op
results["vpu_f32_fma_Topss"] = ops / 1e12
print(f"VPU f32 fma chain: {t*1e3:.3f} ms/iter -> {ops/1e12:.2f} Tfma/s "
      f"({2*ops/1e12:.2f} TFLOP/s)", flush=True)

# mixed compare/select chain (automask/min-reduction shape of work)
def cmp_chain(v):
    for _ in range(32):
        v = jnp.where(v > 0.5, v * 0.999, v + 0.001)
    return v


t = timed_scan(cmp_chain, x)
ops = 32 * x.size / t
results["vpu_f32_cmpsel_Topss"] = ops / 1e12
print(f"VPU cmp+sel chain: {t*1e3:.3f} ms/iter -> {ops/1e12:.2f} Tcmpsel/s",
      flush=True)

import json
print(json.dumps(results))
