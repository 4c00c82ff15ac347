"""One-claim TPU session for the round-2 adjudications, in priority order:

1. border-fast A/B (keep/revert FSNET_BORDER_FAST default)
2. stacked-window A/B (keep/revert FSNET_STACK_WIN default)
3. bench.py-equivalent number with the winning toggles
4. step ablation (warp->identity / ssim->l1 / smoothness->0) for attribution

Everything runs in ONE process so a single successful TPU claim yields all
the data (the axon tunnel has been flaky; claims are the scarce resource).
Methodology: in-process A/B, best-of-4 windows (BASELINE.md).
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
    print(f"{tag:40s} {ms:7.1f} ms/step  {B * 1000 / ms:6.1f} imgs/s "
          f"loss={loss:.5f}", flush=True)
    return ms


import fsnet_tpu.ops.pallas.warp_kernel as wk

# --- 1+2: border-fast / stacked-window / bf16-out A/B ------------------------
results = {}
for tag, bf, sw, bo in [
    ("fpack8 masks, per-tile (round-1 cfg)", False, False, True),
    ("border-fast fpack4", True, False, True),
    ("border-fast + stacked-window", True, True, True),
    ("stacked-window only", False, True, True),
    ("border-fast, f32 stores (no BF16_OUT)", True, False, False),
    ("border-fast fpack4 (drift check)", True, False, True),
]:
    wk.BORDER_FAST, wk.STACK_WIN, wk.BF16_OUT = bf, sw, bo
    results[(bf, sw, bo)] = min(timed(tag),
                                results.get((bf, sw, bo), float("inf")))

best_cfg = min(results, key=results.get)
print(f"\nbest toggles: BORDER_FAST={best_cfg[0]} STACK_WIN={best_cfg[1]} "
      f"BF16_OUT={best_cfg[2]}", flush=True)
wk.BORDER_FAST, wk.STACK_WIN, wk.BF16_OUT = best_cfg

# --- 3: headline number with winning toggles ---------------------------------
ms = timed("WINNER (bench.py-equivalent)")
print(f'BENCH {{"imgs_per_sec": {B * 1000 / ms:.1f}, '
      f'"vs_a100_est": {B * 1000 / ms / 150.0:.3f}}}', flush=True)

# --- 4: ablation attribution --------------------------------------------------
import fsnet_tpu.models.heads.monodepth2_decoder as md
import fsnet_tpu.ops.warp_fast as wf


def _identity_warp(image, grid, **k):
    rep = grid.shape[0] // image.shape[0]
    out = jnp.broadcast_to(image[None], (rep,) + image.shape)
    return out.reshape((grid.shape[0],) + image.shape[1:])


orig = (wf.grid_sample, md.grid_sample)
wf.grid_sample = md.grid_sample = _identity_warp
timed("ablate: warp -> identity")
wf.grid_sample, md.grid_sample = orig

import fsnet_tpu.ops.ssim as ssim_mod

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

# --- 5: band-size sweep (perf only; band<8 accuracy needs the convergence
# probe before any default change — band-4 packed fields fit ONE vreg) ------
for b in (4, 6):
    model_b = ge._flagship_model(H, W, warp_band=b)
    state_b = init_state(model_b, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    state_b, metrics, _ = step(state_b, batch, rng)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state_b, metrics, _ = step(state_b, batch, rng)
        loss = float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1000
    print(f"band={b:2d}                                  {ms:7.1f} ms/step  "
          f"{B * 1000 / ms:6.1f} imgs/s loss={loss:.5f}", flush=True)

# --- 5a: SSIM stencil-vs-matmul pooling A/B ----------------------------------
# NOTE: fsnet_tpu.ops re-exports the ssim FUNCTION under the submodule name;
# `import fsnet_tpu.ops.ssim as m` would bind the function and the toggle
# write would silently no-op. Resolve the real module.
import importlib

ssim_m = importlib.import_module("fsnet_tpu.ops.ssim")

ssim_m.SSIM_STENCIL = False
timed("ssim: banded-matmul pooling")
ssim_m.SSIM_STENCIL = True
timed("ssim: shifted-adds stencil pooling")

# --- 5c: tiled-layout photometric loss A/B (md imported in section 4) --------
md.TILED_LOSS = True
timed("tiled loss (no NHWC relayout)")
md.TILED_LOSS = False
timed("nhwc loss (baseline)")

# --- 5b: space-to-depth stem A/B ---------------------------------------------
import fsnet_tpu.models.backbones.resnet as rn

rn.S2D_STEM = False
timed("stem: native 7x7/s2 (S2D off)")
rn.S2D_STEM = True
timed("stem: space-to-depth 4x4/s1")

# --- 6: is the fused-kernel output moveaxis free? ----------------------------
# The kernels emit [B, Ho, T, C, L]; consumers get NHWC via moveaxis+reshape
# (~660 MB bf16 x 3 outputs). If XLA does NOT fuse that transpose, a
# channel-major out_specs refactor is worth ~1.6 ms/step. Differencing
# harness: (t(K=40) - t(K=10)) / 30 cancels the ~3 ms/iter axon fixed cost.
x = jax.random.normal(jax.random.PRNGKey(0), (96, 192, 5, 3, 128),
                      jnp.bfloat16)


def _tr_probe(k):
    def body(c, _):
        y = jnp.moveaxis(c, 3, 4).reshape(96, 192, 640, 3)
        # a consumer that forces materialization-or-fusion decisions
        s = jnp.abs(y - 0.5).mean(axis=-1).sum()
        return c + (s * 1e-12).astype(c.dtype), None
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
    r = f(x)
    float(r[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    r = f(x)
    float(r[0, 0, 0, 0, 0])
    return time.perf_counter() - t0


t10, t40 = _tr_probe(10), _tr_probe(40)
print(f"moveaxis+abs-mean consumer: {(t40 - t10) / 30 * 1000:.2f} ms/iter "
      f"(660 MB bf16 transpose + reduce)", flush=True)

print("SESSION COMPLETE", flush=True)
