"""Fresh step attribution at the current (~53 ms) configuration.

Sections: baseline, warp->identity, ssim->l1, smoothness->0, band 4/6 perf.
One TPU claim; in-process best-of-4 windows (BASELINE.md methodology).
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

print("backend:", jax.default_backend(), flush=True)
model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
rng = jax.random.PRNGKey(1)


def timed(tag, state=None, step=None):
    if step is None:
        step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    state = state0 if state is None else state
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
    print(f"{tag:40s} {ms:7.1f} ms/step  {B * 1000 / ms:6.1f} imgs/s "
          f"loss={loss:.5f}", flush=True)
    return ms


# measured: baseline 53.6ms, warp->identity 28.1ms
# timed("baseline (current defaults)")

import fsnet_tpu.models.heads.monodepth2_decoder as md
import fsnet_tpu.ops.warp_fast as wf


def _identity_warp(image, grid, **k):
    rep = grid.shape[0] // image.shape[0]
    out = jnp.broadcast_to(image[None], (rep,) + image.shape)
    return out.reshape((grid.shape[0],) + image.shape[1:])




import importlib

ssim_mod = importlib.import_module("fsnet_tpu.ops.ssim")

orig_ssim, orig_md_ssim = ssim_mod.ssim, md.ssim_fn
fake = lambda a, b, **k: (a - b) * 0.5  # noqa: E731
ssim_mod.ssim = md.ssim_fn = fake
timed("ablate: ssim -> l1")
ssim_mod.ssim, md.ssim_fn = orig_ssim, orig_md_ssim

import fsnet_tpu.ops.geometry as geo

orig_sm, orig_md_sm = geo.get_smooth_loss, md.get_smooth_loss
zero = lambda disp, img: jnp.mean(disp) * 0.0  # noqa: E731
geo.get_smooth_loss = md.get_smooth_loss = zero
timed("ablate: smoothness -> 0")
geo.get_smooth_loss, md.get_smooth_loss = orig_sm, orig_md_sm

for b in (6, 4):
    model_b = ge._flagship_model(H, W, warp_band=b)
    state_b = init_state(model_b, batch, tx, jax.random.PRNGKey(0))
    timed(f"band={b}", state=state_b)
