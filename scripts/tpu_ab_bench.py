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

VARIANT_SETS = {
    "border": [
        ("border-fast fpack4 (default)", dict(borderfast=True)),
        ("fpack8 all-ones masks", dict(borderfast=False)),
        ("border-fast again (drift check)", dict(borderfast=True)),
    ],
    "stack": [
        ("stacked-window gather", dict(stackwin=True)),
        ("per-tile gathers (default)", dict(stackwin=False)),
        ("stacked-window again (drift check)", dict(stackwin=True)),
    ],
}
VARIANTS = VARIANT_SETS[os.environ.get("FSNET_AB_SET", "border")]

for tag, cfg in VARIANTS:
    fc.PALLAS_CONV = cfg.get("pallas", True)
    fc.SUMMUL = cfg.get("summul", False)
    fc.PACKED_VJP = cfg.get("vjp", False)
    wk.DYN_WS = cfg.get("dynws", True)
    wf.FUSED_VJP = cfg.get("fused", True)
    wk.FOLD_WIN = cfg.get("fold", False)
    wk.BORDER_FAST = cfg.get("borderfast", True)
    wk.STACK_WIN = cfg.get("stackwin", False)
    timed(tag)
