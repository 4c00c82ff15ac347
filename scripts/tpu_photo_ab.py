"""Isolated photometric-loss A/B on real TPU at the flagship shape:
XLA route vs the fused Pallas kernel (fwd and fwd+bwd, several row-group
sizes). Chained-dispatch timing (tpu_microbench.py pattern) — per-call
tunnel overhead (~3 ms) is shared by all configs, so deltas adjudicate.

Round-4 context: the fused photo chain benched 237 imgs/s vs 275 for the
XLA route (full-step A/B) after the VMEM fix — ~7 ms of regression lives
somewhere in these kernels; this probe localizes it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fsnet_tpu.ops.pallas.photo_kernel as pk
from fsnet_tpu.models.heads.monodepth2_decoder import reprojection_loss
from fsnet_tpu.ops.photo_loss import reprojection_loss_fused
from fsnet_tpu.ops.ssim import ssim_target_stats

B, H, W, C = 12, 192, 640, 3
SF = 8
N = SF * B

print("backend:", jax.default_backend(), flush=True)
rng = np.random.RandomState(0)
pred0 = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32)).astype(
    jnp.bfloat16)
target = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(
    jnp.bfloat16)
t_stats = jax.tree.map(jax.device_put, ssim_target_stats(target))
target_tiled = jnp.broadcast_to(target[None], (SF,) + target.shape).reshape(
    N, H, W, C)
stats_tiled = tuple(
    jnp.broadcast_to(t[None], (SF,) + t.shape).reshape((N,) + t.shape[1:])
    for t in t_stats)


def timeit_chain(name, body, x0, n=10):
    body_j = jax.jit(body)
    x = body_j(x0)
    float(jnp.mean(x[:2, :2, :2].astype(jnp.float32)))  # device read barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            x = body_j(x)
        float(jnp.mean(x[:2, :2, :2].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    print(f"{name:46s} {best:8.2f} ms/iter", flush=True)
    return best


def xla_fwd(x):
    out = reprojection_loss(x, target_tiled, target_stats=stats_tiled)
    return x + 1e-12 * jnp.mean(out).astype(x.dtype)


def xla_grad(x):
    g = jax.grad(lambda a: jnp.sum(
        reprojection_loss(a, target_tiled,
                          target_stats=stats_tiled).astype(jnp.float32)))(x)
    return x + 1e-12 * g


def fused_fwd(x):
    out = reprojection_loss_fused(x, target, *t_stats)
    return x + 1e-12 * jnp.mean(out.astype(jnp.float32)).astype(x.dtype)


def fused_grad(x):
    g = jax.grad(lambda a: jnp.sum(
        reprojection_loss_fused(a, target, *t_stats).astype(jnp.float32)))(x)
    return x + 1e-12 * g


timeit_chain("xla reprojection_loss fwd", xla_fwd, pred0)
timeit_chain("xla reprojection_loss fwd+bwd", xla_grad, pred0)
for g in (32, 16, 8):
    pk.GROUP_OVERRIDE = g
    timeit_chain(f"fused photo fwd           (group={g})", fused_fwd, pred0)
    timeit_chain(f"fused photo fwd+bwd       (group={g})", fused_grad, pred0)
pk.GROUP_OVERRIDE = 0
print("done", flush=True)
