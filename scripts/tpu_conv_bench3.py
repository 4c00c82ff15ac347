"""v3: verify the small-C lane-padding hypothesis + fully-packed conv.

(a) elementwise x*2+1 on [12,192,640,16] vs [12,192,80,128] (same bytes)
(b) conv3x3 where input AND output stay width-packed [B,H,W/P,P*C=128]:
    cols = concat(neighbor channel slices) -> one matmul. No unpack.
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


def _build_wmat(w, P):
    kH, kW, C, Co = w.shape
    span = P + kW - 1
    Wmat = np.zeros((kH, span, C, P, Co), np.float32)
    w_np = np.asarray(w).astype(np.float32)
    for p in range(P):
        Wmat[:, p:p + kW, :, p, :] = w_np
    return jnp.asarray(Wmat.reshape(kH, span * C, P * Co)).astype(w.dtype)


def conv_packed(xp, wmat, P, C):
    """xp [B, H, NB, P*C] (width-packed NHWC) -> [B, H, NB, P*Co].

    cols for window [-1, P+1): last C channels of the left block + this
    block + first C channels of the right block, then 3 dy matmuls."""
    Bb, Hh, NB, PC = xp.shape
    zeros = jnp.zeros_like(xp[:, :, :1, -C:])
    l = jnp.concatenate([zeros, xp[:, :, :-1, -C:]], axis=2)
    r = jnp.concatenate([xp[:, :, 1:, :C], zeros], axis=2)
    cols = jnp.concatenate([l, xp, r], axis=3)       # [B,H,NB,(P+2)C]
    colsp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = None
    for dy in range(3):
        part = jnp.dot(colsp[:, dy:dy + Hh], wmat[dy],
                       preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out.astype(xp.dtype)


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)

    x16 = jnp.asarray(rng.rand(B, H, W, 16).astype(np.float32)).astype(
        jnp.bfloat16)
    x128 = jnp.asarray(rng.rand(B, H, W // 8, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    timed("elementwise [.,640,16]", lambda x: x * 2 + 1, x16)
    timed("elementwise [.,80,128]", lambda x: x * 2 + 1, x128)

    for C, Co, scale in [(16, 16, 1), (32, 32, 2), (64, 64, 4)]:
        h, w_ = H // scale, W // scale
        P = 128 // C
        x = jnp.asarray(rng.rand(B, h, w_, C).astype(np.float32)).astype(
            jnp.bfloat16)
        wt = jnp.asarray((rng.rand(3, 3, C, Co) - 0.5).astype(np.float32)
                         ).astype(jnp.bfloat16)
        wmat = _build_wmat(wt, P)
        xp = x.reshape(B, h, w_ // P, P * C)

        ref = conv_ref(x, wt)
        new = conv_packed(xp, wmat, P, C).reshape(B, h, w_, Co)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - new.astype(jnp.float32))))
        den = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        print(f"C={C:3d}->Co={Co:3d} @{h}x{w_} packed relerr={err/den:.2e}")
        timed("  native conv", partial(conv_ref, w=wt), x)
        timed("  packed conv", lambda xx, wm=wmat, P=P, C=C:
              conv_packed(xx, wm, P, C), xp)

        def loss_ref(xx, wt=wt):
            y = conv_ref(xx, wt).astype(jnp.float32)
            return jnp.sum(y * y) * 1e-9

        def loss_pk(xx, wm=wmat, P=P, C=C):
            y = conv_packed(xx, wm, P, C).astype(jnp.float32)
            return jnp.sum(y * y) * 1e-9
        timed("  native fwd+bwd(x)", lambda xx: jax.grad(loss_ref)(xx), x)
        timed("  packed fwd+bwd(x)", lambda xx: jax.grad(loss_pk)(xx), xp)


if __name__ == "__main__":
    main()
