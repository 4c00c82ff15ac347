"""Prototype: small-channel 3x3 conv as W-phase-packed im2col matmul.

XLA's native conv at C<=32 on v5e runs ~1.6 TFLOPS (tpu_model_bench.py).
This reformulates conv3x3 (stride 1, NHWC) as one matmul with N = P*Co = 128
by computing P consecutive output columns per matmul row-block:
cols [B, H, W/P, 3*(P+2)*C] (strided slices, no gather) @ Wmat [K, P*Co].
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, H, W = 12, 192, 640
K_REP = 10


def timed(name, f, *args):
    def run(*a):
        def body(c, _):
            out = f(a[0] + c.astype(a[0].dtype) * 0, *a[1:])
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_REP)
        return c

    g = jax.jit(run)
    float(g(*args))
    t0 = time.perf_counter()
    float(g(*args))
    ms = (time.perf_counter() - t0) / K_REP * 1e3
    print(f"{name:44s} {ms:8.2f} ms/iter")


def conv_ref(x, w):
    """Plain XLA conv, NHWC x [B,H,W,C], w [3,3,C,Co], SAME zero pad."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _build_wmat(w, P):
    """w [3,3,C,Co] -> Wmat [3*(P+2)*C, P*Co] block-Toeplitz with zeros."""
    kH, kW, C, Co = w.shape
    span = P + kW - 1
    Wmat = np.zeros((kH, span, C, P, Co), w.dtype)
    w_np = np.asarray(w)
    for p in range(P):
        Wmat[:, p:p + kW, :, p, :] = w_np
    return jnp.asarray(Wmat.reshape(kH * span * C, P * Co))


def conv_im2col(x, wmat, P, Co):
    """3x3 stride-1 SAME conv via W-phase im2col matmul."""
    Bb, Hh, Ww, C = x.shape
    span = P + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # cols[b, h, wb, dy, j, c] = xp[b, h+dy, wb*P + j, c]
    rows = []
    for dy in range(3):
        xr = xp[:, dy:dy + Hh]
        for j in range(span):
            n = Ww // P
            rows.append(jax.lax.slice_in_dim(
                xr, j, j + (n - 1) * P + 1, P, axis=2))
    cols = jnp.stack(rows, axis=3)          # [B, H, W/P, 3*span, C]
    cols = cols.reshape(Bb, Hh, Ww // P, 3 * span * C)
    out = jnp.dot(cols, wmat, preferred_element_type=jnp.float32)
    return out.reshape(Bb, Hh, Ww, Co).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    for C, Co, scale in [(16, 16, 1), (32, 16, 2), (96, 32, 2), (64, 32, 4),
                         (128, 64, 4)]:
        h, w_ = H // scale, W // scale
        x = jnp.asarray(rng.rand(B, h, w_, C).astype(np.float32)).astype(
            jnp.bfloat16)
        wt = jnp.asarray((rng.rand(3, 3, C, Co) - 0.5).astype(np.float32)
                         ).astype(jnp.bfloat16)
        P = max(128 // Co, 1)
        wmat = _build_wmat(wt, P)

        ref = conv_ref(x, wt)
        new = conv_im2col(x, wmat, P, Co)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - new.astype(jnp.float32))))
        den = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        print(f"C={C:3d}->Co={Co:3d} @{h}x{w_}  P={P}  relerr={err/den:.2e}")
        timed(f"  native conv", partial(conv_ref, w=wt), x)
        timed(f"  im2col matmul", lambda xx, wm=wmat, P=P, Co=Co:
              conv_im2col(xx, wm, P, Co), x)

        # fwd+bwd
        def loss_ref(xx, wt=wt):
            return jnp.sum(conv_ref(xx, wt).astype(jnp.float32)) * 1e-9

        def loss_new(xx, wm=wmat, P=P, Co=Co):
            return jnp.sum(conv_im2col(xx, wm, P, Co).astype(
                jnp.float32)) * 1e-9
        timed("  native fwd+bwd", lambda xx: jax.grad(loss_ref)(xx), x)
        timed("  im2col fwd+bwd", lambda xx: jax.grad(loss_new)(xx), x)


if __name__ == "__main__":
    main()
