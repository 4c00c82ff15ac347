"""Decoder cost attribution on TPU: times the packed trunk's unit ops at the
hot stage shapes with the differencing harness (K=10 vs K=40 chained scans,
report (t40-t10)/30 — axon charges ~3 ms fixed per scan iteration).

Answers: of the ~22 ms packed-decoder fwd+bwd, how much is conv matmuls vs
BN (moments + normalize) vs upsample/concat shuffles — i.e. whether a fused
Pallas conv (kills the cols + y-plane HBM materialization) or a BN fusion is
the right next kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fsnet_tpu.ops import fast_conv as fc

DT = jnp.bfloat16


def timed(name, f, *args, grad=False):
    if grad:
        def loss(a0, *rest):
            return jnp.sum(f(a0, *rest).astype(jnp.float32) ** 2)
        g = jax.grad(loss)

        def op(a0, *rest):
            return g(a0, *rest)
    else:
        op = f

    def runner(k):
        def run(a0, *rest):
            def body(c, _):
                out = op(a0 + c.astype(a0.dtype) * 0, *rest)
                tree = jax.tree_util.tree_leaves(out)
                s = sum(jnp.sum(t.astype(jnp.float32)) for t in tree)
                return c + s * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        j = jax.jit(run)
        float(j(*args))                       # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t10, t40 = runner(10), runner(40)
    ms = (t40 - t10) / 30 * 1e3
    print(f"{name:52s} {ms:8.3f} ms", flush=True)
    return ms


def convbn(xp, k, b, scale, bias, C, Co, pad_mode="zeros", bn=True,
           relu=True):
    out = fc.conv3x3_packed(xp, k, b, C=C, pad_mode=pad_mode)
    if bn:
        mean, var = fc.batch_moments_packed(out, Co)
        out = fc.batchnorm_packed(out, Co, mean, var, scale, bias)
    if relu:
        out = jax.nn.relu(out)
    return out


rng = np.random.RandomState(0)


def mk(shape):
    return jnp.asarray(rng.randn(*shape), DT)


print(f"backend={jax.default_backend()}", flush=True)

# ---- stage i=0 conv1: 16->16 @ 192x640, P=8  (the fattest conv)
B, H, NB, C, Co, P = 12, 192, 80, 16, 16, 8
xp = mk((B, H, NB, P * C))
k, b = mk((3, 3, C, Co)), mk((Co,))
scale, bias = mk((Co,)), mk((Co,))

for tag, kw in [
    ("i0 conv1 16->16 @192x640 conv only fwd", dict(bn=False, relu=False)),
    ("i0 conv1 conv+bn+relu fwd", dict()),
]:
    timed(tag, lambda x, kk, bb, s, bi: convbn(x, kk, bb, s, bi, C, Co, **kw),
          xp, k, b, scale, bias)
for tag, kw in [
    ("i0 conv1 conv only fwd+bwd", dict(bn=False, relu=False)),
    ("i0 conv1 conv+bn+relu fwd+bwd", dict()),
]:
    timed(tag, lambda x, kk, bb, s, bi: convbn(x, kk, bb, s, bi, C, Co, **kw),
          xp, k, b, scale, bias, grad=True)

# summul A/B on the same conv
fc.SUMMUL = True
timed("i0 conv1 conv only fwd+bwd SUMMUL",
      lambda x, kk, bb, s, bi: convbn(x, kk, bb, s, bi, C, Co, bn=False,
                                      relu=False),
      xp, k, b, scale, bias, grad=True)
fc.SUMMUL = False

# BN alone at the same shape
def bn_only(x):
    mean, var = fc.batch_moments_packed(x, Co)
    return jax.nn.relu(fc.batchnorm_packed(x, Co, mean, var, scale, bias))

timed("i0 bn+relu alone fwd", bn_only, xp)
timed("i0 bn+relu alone fwd+bwd", bn_only, xp, grad=True)

# upsample + 2-part conv at stage i=1: conv1 32->32 @96x320 with skip C=64
B1, H1, NB1, C1, Co1, P1 = 12, 96, 80, 32, 32, 4
x1 = mk((B1, H1, NB1, P1 * C1))
skip = mk((B1, H1, 320, 64))          # NHWC skip (P=1 packed form)
k2, b2 = mk((3, 3, C1 + 64, Co1)), mk((Co1,))

def twopart(x, s, kk, bb):
    return fc.conv3x3_packed((x, fc.pack_width(s, 1)), kk, bb, C=(C1, 64),
                             pad_mode="replicate")

timed("i1 conv1 2-part (32+64)->32 @96x320 fwd+bwd", twopart, x1, skip, k2,
      b2, grad=True)

def upsamp(x):
    return fc.upsample2x_packed(x, C1)

timed("i1 upsample2x packed fwd+bwd", upsamp, x1, grad=True)

# dispconv: replicate-pad 16->16 @192x640 (same as i0 conv1 but replicate)
timed("dispconv replicate 16->16 @192x640 fwd+bwd",
      lambda x, kk, bb, s, bi: convbn(x, kk, bb, s, bi, C, Co,
                                      pad_mode="replicate", bn=False,
                                      relu=False),
      xp, k, b, scale, bias, grad=True)
