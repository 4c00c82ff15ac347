"""In-process A/B of the warp band size on the full train step (bf16,
flagship KITTI recipe). The Pallas warp kernels' VPU work scales with the
band*C sublane rows per gather operand, so a smaller band cuts the dominant
warp cost — accuracy impact is measured separately by
``scripts/convergence_probe.py`` (band<N>:bf16 configs).

Usage: python scripts/tpu_band_bench.py [steps_per_window] [windows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

B, H, W = 12, 192, 640
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
WINDOWS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

batch = None
rng = jax.random.PRNGKey(1)


def timed(tag, band):
    global batch
    model = ge._flagship_model(H, W, warp_band=band)
    if batch is None:
        batch = jax.device_put(ge._synthetic_batch(B, H, W))
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                            steps_per_epoch=100)
    state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    state = state0
    state, metrics, _ = step(state, batch, rng)
    float(metrics["loss"])  # sync incl. compile
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics, _ = step(state, batch, rng)
        loss = float(metrics["loss"])  # true barrier
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1000
    print(f"{tag:24s} {ms:7.1f} ms/step  {B * 1000 / ms:6.1f} imgs/s "
          f"loss={loss:.5f}", flush=True)
    return ms


for band in (16, 12, 8, 16):   # repeat 16 as drift check
    timed(f"band={band}", band)
