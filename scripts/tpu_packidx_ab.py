"""PACK_IDX hardware validation + full-step A/B.

1. Exactness: fused (out, va, vb) with PACK_IDX on vs off at production
   packed-bf16 shapes, border AND zeros padding, on real TPU (Mosaic
   miscompile check — interpret mode can't catch those).
2. Full-step A/B, best-of-4 windows (BASELINE.md methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
import fsnet_tpu.ops.pallas.warp_kernel as wk
import fsnet_tpu.ops.warp_fast as wf
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

print("backend:", jax.default_backend(), flush=True)

# --- 1: exactness ------------------------------------------------------------
rng = np.random.RandomState(0)
B, H, W, C = 4, 64, 640, 3
img = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
gx = rng.uniform(-1.1, 1.1, (B, H, W)).astype(np.float32)
gy = rng.uniform(-1.1, 1.1, (B, H, W)).astype(np.float32)
grid = jnp.asarray(np.stack([gx, gy], -1))

for pad in ("border", "zeros"):
    outs = {}
    for flag in (True, False):
        wk.PACK_IDX = flag
        fwd = jax.jit(lambda i, g: wf._fwd(i, g, "bilinear", pad, True, 8))
        out, (_, _, va, vb) = fwd(img, grid)
        outs[flag] = jax.device_get((out, va, vb))
    d = [float(np.abs(np.asarray(a, np.float32)
                      - np.asarray(b, np.float32)).max())
         for a, b in zip(outs[True], outs[False])]
    print(f"pad={pad}: max |packed - legacy| out/va/vb = {d}", flush=True)
    assert max(d) == 0.0, d

# --- 2: full-step A/B --------------------------------------------------------
Bb, Hb, Wb = 12, 192, 640
STEPS, WINDOWS = 20, 4
model = ge._flagship_model(Hb, Wb)
batch = jax.device_put(ge._synthetic_batch(Bb, Hb, Wb))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
krng = jax.random.PRNGKey(1)


def timed(tag):
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    state = state0
    state, metrics, _ = step(state, batch, krng)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics, _ = step(state, batch, krng)
        loss = float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1000
    print(f"{tag:40s} {ms:7.1f} ms/step  {Bb * 1000 / ms:6.1f} imgs/s "
          f"loss={loss:.5f}", flush=True)
    return ms


for rep in range(2):
    wk.PACK_IDX = False
    timed(f"legacy rows (PACK_IDX=0) rep{rep}")
    wk.PACK_IDX = True
    timed(f"packed index word rep{rep}")
