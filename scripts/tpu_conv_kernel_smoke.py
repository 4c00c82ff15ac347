"""Hardware exactness check of the fused Pallas packed conv vs the XLA
block-Toeplitz path, at the decoder's production shapes (interpret mode
cannot catch Mosaic miscompiles)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fsnet_tpu.ops import fast_conv as fc

print("backend:", jax.default_backend(), flush=True)
rng = np.random.RandomState(0)


def check(tag, B, H, W, Cs, Co, pad_mode, dtype, P_ins):
    parts, ws = [], []
    for c, pi in zip(Cs, P_ins):
        x = jnp.asarray(rng.randn(B, H, W, c), dtype)
        parts.append(fc.pack_width(x, pi))
    w = jnp.asarray(rng.randn(3, 3, sum(Cs), Co) * 0.1, dtype)
    b = jnp.asarray(rng.randn(Co) * 0.1, dtype)

    def loss_of(f):
        def fn(ps, w_, b_):
            return jnp.sum(f(ps, w_, b_).astype(jnp.float32) ** 2)
        return fn

    f_ref = loss_of(lambda ps, w_, b_: fc._conv3x3_forward(
        list(ps), list(Cs), w_, b_, pad_mode))
    f_pal = loss_of(lambda ps, w_, b_: fc._conv3x3_pallas_cvjp(
        tuple(ps), w_, b_, tuple(Cs), pad_mode))

    o_ref = jax.jit(f_ref)(tuple(parts), w, b)
    o_pal = jax.jit(f_pal)(tuple(parts), w, b)
    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(tuple(parts), w, b)
    g_pal = jax.jit(jax.grad(f_pal, argnums=(0, 1, 2)))(tuple(parts), w, b)

    def rel(a, b_):
        a = np.asarray(a, np.float64).ravel()
        b_ = np.asarray(b_, np.float64).ravel()
        return np.abs(a - b_).max() / (np.abs(b_).max() + 1e-9)

    errs = [rel(float(o_pal), float(o_ref))]
    for ga, gb in zip(jax.tree_util.tree_leaves(g_pal),
                      jax.tree_util.tree_leaves(g_ref)):
        errs.append(rel(ga, gb))
    print(f"{tag:44s} loss rel {errs[0]:.2e}  max grad rel "
          f"{max(errs[1:]):.2e}", flush=True)


for dt, tol in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    check(f"i0 conv1 16->16 @192x640 repl {tol}", 4, 192, 640, (16,), 16,
          "replicate", dt, (8,))
    check(f"i0 conv0 32->16 @96x320 zeros {tol}", 4, 96, 320, (32,), 16,
          "zeros", dt, (4,))
    check(f"i1 conv1 (32+64)->32 @96x320 repl {tol}", 4, 96, 320, (32, 64),
          32, "replicate", dt, (4, 1))
    # Dispconv-class shape (Co=16 -> P=8, PC=512) with NB=192/8=24 aligned:
    # same physical kernel shape as the scale-2 dispconv crash memref
    # (12x50x24x512) but with the logical NB a whole sublane tile.
    check(f"dispconv-class 64->16 @48x192 repl {tol}", 12, 48, 192, (64,),
          16, "replicate", dt, (2,))

# The real scale-2/3 dispconvs (W=160/80, Co=16 -> NB=20/10) must be gated
# OFF: unaligned NB sublane-pads the HBM memref and the row DMA cannot
# slice it (Mosaic alignment error).
for W_bad in (160, 80):
    part = jnp.zeros((12, 48, W_bad // 2, 128), jnp.bfloat16)
    assert not fc._pallas_conv_supported([part], [64], 16), W_bad
print("gate: unaligned-NB dispconvs fall back to XLA", flush=True)
print("OK", flush=True)
