"""Probe: verify the TPU train step really executes (per-step times + losses)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

BATCH, HEIGHT, WIDTH = 12, 192, 640

model = ge._flagship_model(HEIGHT, WIDTH)
batch = jax.device_put(ge._synthetic_batch(BATCH, HEIGHT, WIDTH))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=1000)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))
print("devices:", jax.devices())
print("param count:", sum(x.size for x in jax.tree.leaves(state.params)))

import os
compute_dtype = jnp.bfloat16 if os.environ.get("FSNET_BF16") else None
print("compute_dtype:", compute_dtype)
step = make_train_step(donate=False, compute_dtype=compute_dtype)
rng = jax.random.PRNGKey(1)

for i in range(8):
    t0 = time.perf_counter()
    state, metrics, _ = step(state, batch, rng)
    loss = float(jax.block_until_ready(metrics["loss"]))
    dt = (time.perf_counter() - t0) * 1000
    print(f"step {i}: loss={loss:.6f}  {dt:.1f} ms")

# timed loop identical to bench.py
t0 = time.perf_counter()
N = 50
for _ in range(N):
    state, metrics, _ = step(state, batch, rng)
jax.block_until_ready(metrics["loss"])
el = time.perf_counter() - t0
print(f"bench-style: {N} steps in {el:.3f}s -> {BATCH*N/el:.1f} imgs/s")
