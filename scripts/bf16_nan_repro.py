"""Reproduce (on CPU) the bf16 NaN the convergence probe found at step 0 with
realistic z-translations (tz ~ +-0.7 m): isolates which loss term goes NaN.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "convergence_probe",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "convergence_probe.py"))
cp = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(cp)

from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

rng = np.random.RandomState(0)
batch, gt = cp.make_batch(rng, 2)

model = cp.flagship("band")
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=4)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))

for dt in (None, jnp.bfloat16):
    step = make_train_step(donate=False, compute_dtype=dt)
    _, metrics, _ = step(state, batch, jax.random.PRNGKey(1))
    print(f"compute_dtype={dt}:")
    for k, v in sorted(metrics.items()):
        try:
            print(f"   {k:30s} {float(v):.6f}")
        except TypeError:
            pass
