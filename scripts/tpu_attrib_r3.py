"""Round-3 step attribution on the honest-motion batch: current defaults,
fused-photo off (XLA fallback), prep-kernel off, warp->identity; then a
profiler trace of the default step. One TPU claim; best-of-W windows with a
device->host loss read as the barrier (BASELINE.md methodology)."""
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

print("backend:", jax.default_backend(), flush=True)
model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
rng = jax.random.PRNGKey(1)


def timed(tag):
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    state, metrics, _ = step(state0, batch, rng)
    float(metrics["loss"])  # sync incl. compile
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics, _ = step(state, batch, rng)
        loss = float(metrics["loss"])  # true barrier
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1000
    print(f"{tag:40s} {ms:7.1f} ms/step  {B * 1000 / ms:6.1f} imgs/s "
          f"loss={loss:.5f}", flush=True)
    return ms


timed("baseline (current defaults)")

import fsnet_tpu.ops.photo_loss as plm
plm.PHOTO_KERNEL = False
timed("fused photo kernel OFF (XLA fallback)")
plm.PHOTO_KERNEL = True

import fsnet_tpu.ops.warp_depth as wd




import fsnet_tpu.ops.warp_depth as wd2
wd2.WARP_DEPTH = False
timed("depth-direct warp route OFF (grid route)")
wd2.WARP_DEPTH = True

# profiler trace of the default step
step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
state, metrics, _ = step(state0, batch, rng)
float(metrics["loss"])
os.makedirs("/tmp/r3_trace", exist_ok=True)
with jax.profiler.trace("/tmp/r3_trace"):
    for _ in range(6):
        state, metrics, _ = step(state, batch, rng)
    float(metrics["loss"])
print("trace written to /tmp/r3_trace", flush=True)
