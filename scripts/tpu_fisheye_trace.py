"""Capture a jax.profiler device trace of the fisheye bench step.

Usage: python scripts/tpu_fisheye_trace.py [outdir=/tmp/fsnet_fisheye_trace]
Then:  python scripts/parse_xplane.py <outdir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsnet_fisheye_trace"
sys.argv = sys.argv[:1]   # tpu_fisheye_bench reads argv at import

import tpu_fisheye_bench as fb  # noqa: E402
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

model = fb._model()
batch = jax.device_put(fb._batch())
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
