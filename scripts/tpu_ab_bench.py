"""In-process A/B step bench: times full-train-step variants back-to-back in
ONE process with best-of-N windows, so axon tunnel variance (which sank the
single-window cross-process comparisons, BASELINE.md) cancels.

Each variant flips module-level toggles and re-traces the jitted step.

Usage: python scripts/tpu_ab_bench.py [steps_per_window] [windows]
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

model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
rng = jax.random.PRNGKey(1)


def timed(tag):
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
    print(f"{tag:36s} {ms:7.1f} ms/step  {B * 1000 / ms:6.1f} imgs/s "
          f"loss={loss:.5f}", flush=True)
    return ms


import fsnet_tpu.ops.fast_conv as fc
import fsnet_tpu.ops.pallas.warp_kernel as wk
import fsnet_tpu.ops.warp_fast as wf

VARIANTS = [
    ("pallas conv (default)", dict(pallas=True)),
    ("XLA one-matmul planes", dict(pallas=False)),
    ("XLA summul (3-matmul dy sum)", dict(pallas=False, summul=True)),
    ("pallas conv again (drift check)", dict(pallas=True)),
]

for tag, cfg in VARIANTS:
    fc.PALLAS_CONV = cfg.get("pallas", True)
    fc.SUMMUL = cfg.get("summul", False)
    fc.PACKED_VJP = cfg.get("vjp", False)
    wk.DYN_WS = cfg.get("dynws", True)
    wf.FUSED_VJP = cfg.get("fused", True)
    wk.FOLD_WIN = cfg.get("fold", False)
    timed(tag)
