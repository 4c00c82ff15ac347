"""v2: im2col small-C conv with unit-stride column construction.

cols j in [-1, P]: j=-1/P come from neighbor W-blocks (pad-shift along the
block axis), j in [0,P) is a free reshape — no strided slices.
Honest grads: loss = sum(conv(x)^2) so the forward can't be DCE'd.
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
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _build_wmat(w, P):
    """w [3,3,C,Co] -> Wmat [3, (P+2)*C, P*Co] (per-dy blocks)."""
    kH, kW, C, Co = w.shape
    span = P + kW - 1
    Wmat = np.zeros((kH, span, C, P, Co), np.float32)
    w_np = np.asarray(w).astype(np.float32)
    for p in range(P):
        Wmat[:, p:p + kW, :, p, :] = w_np
    return jnp.asarray(Wmat.reshape(kH, span * C, P * Co)).astype(w.dtype)


def _cols_w(x, P):
    """[B, H, W, C] -> [B, H, W/P, (P+2)*C] via pad-shift along W blocks."""
    Bb, Hh, Ww, C = x.shape
    xw = x.reshape(Bb, Hh, Ww // P, P, C)
    last = xw[:, :, :, P - 1:P]                     # [B,H,NB,1,C]
    first = xw[:, :, :, 0:1]
    zeros = jnp.zeros_like(last[:, :, :1])
    l = jnp.concatenate([zeros, last[:, :, :-1]], axis=2)
    r = jnp.concatenate([first[:, :, 1:], zeros], axis=2)
    cols = jnp.concatenate([l, xw, r], axis=3)      # [B,H,NB,P+2,C]
    return cols.reshape(Bb, Hh, Ww // P, (P + 2) * C)


def conv_im2col_v2(x, wmat, P, Co):
    """3 matmuls (one per dy), each on H-shifted unit-stride cols."""
    Bb, Hh, Ww, C = x.shape
    cols = _cols_w(x, P)                            # [B,H,NB,(P+2)C]
    colsp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = None
    for dy in range(3):
        part = jnp.dot(colsp[:, dy:dy + Hh], wmat[dy],
                       preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out.reshape(Bb, Hh, Ww, Co).astype(x.dtype)


def conv_im2col_v2cat(x, wmat, P, Co):
    """Single matmul over K = 3*(P+2)*C (dy copies concatenated)."""
    Bb, Hh, Ww, C = x.shape
    cols = _cols_w(x, P)
    colsp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0), (0, 0)))
    cat = jnp.concatenate([colsp[:, dy:dy + Hh] for dy in range(3)], axis=3)
    wcat = wmat.reshape(-1, wmat.shape[-1])
    out = jnp.dot(cat, wcat, preferred_element_type=jnp.float32)
    return out.reshape(Bb, Hh, Ww, Co).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    for C, Co, scale in [(16, 16, 1), (32, 16, 2), (96, 32, 2)]:
        h, w_ = H // scale, W // scale
        x = jnp.asarray(rng.rand(B, h, w_, C).astype(np.float32)).astype(
            jnp.bfloat16)
        wt = jnp.asarray((rng.rand(3, 3, C, Co) - 0.5).astype(np.float32)
                         ).astype(jnp.bfloat16)
        P = max(128 // Co, 1)
        wmat = _build_wmat(wt, P)

        ref = conv_ref(x, wt)
        for name, fn in [("v2 3-matmul", conv_im2col_v2),
                         ("v2 1-matmul", conv_im2col_v2cat)]:
            new = fn(x, wmat, P, Co)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - new.astype(jnp.float32))))
            den = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
            print(f"C={C:3d}->Co={Co:3d} @{h}x{w_} {name} relerr={err/den:.2e}")

        timed("  cols only", lambda xx, P=P: _cols_w(xx, P), x)
        timed("  native conv", partial(conv_ref, w=wt), x)
        timed("  v2 3-matmul", lambda xx, wm=wmat, P=P, Co=Co:
              conv_im2col_v2(xx, wm, P, Co), x)
        timed("  v2 1-matmul", lambda xx, wm=wmat, P=P, Co=Co:
              conv_im2col_v2cat(xx, wm, P, Co), x)

        def loss_ref(xx, wt=wt):
            y = conv_ref(xx, wt).astype(jnp.float32)
            return jnp.sum(y * y) * 1e-9

        def loss_v2(xx, wm=wmat, P=P, Co=Co):
            y = conv_im2col_v2(xx, wm, P, Co).astype(jnp.float32)
            return jnp.sum(y * y) * 1e-9
        timed("  native fwd+bwd(x)", lambda xx: jax.grad(loss_ref)(xx), x)
        timed("  v2     fwd+bwd(x)", lambda xx: jax.grad(loss_v2)(xx), x)


if __name__ == "__main__":
    main()
