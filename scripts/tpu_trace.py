"""Capture a jax.profiler device trace of the flagship bench step.

Usage: python scripts/tpu_trace.py [outdir=/tmp/fsnet_trace]
Then:  python scripts/parse_xplane.py /tmp/fsnet_trace
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsnet_trace"
B, H, W = 12, 192, 640

model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))
rng = jax.random.PRNGKey(1)
step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)

for _ in range(5):
    state, metrics, _ = step(state, batch, rng)
    float(metrics["loss"])

jax.profiler.start_trace(OUT)
for _ in range(4):
    state, metrics, _ = step(state, batch, rng)
float(metrics["loss"])
jax.profiler.stop_trace()
print("trace ->", OUT)

# also dump the optimized TPU HLO for fusion forensics
try:
    import inspect
    lowered = jax.jit(step, donate_argnums=()).lower(state, batch, rng)
    txt = lowered.compile().as_text()
    with open(os.path.join(OUT, "optimized_hlo.txt"), "w") as f:
        f.write(txt)
    print("hlo ->", os.path.join(OUT, "optimized_hlo.txt"), len(txt))
except Exception as e:
    print("hlo dump failed:", e)
