"""Ablation timing: full bf16 train step with loss pieces replaced by cheap
stand-ins, to attribute step time (warp / ssim / smoothness / rest)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

B, H, W = 12, 192, 640
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
    t0 = time.perf_counter()
    for _ in range(8):
        state, metrics, _ = step(state, batch, rng)
    loss = float(metrics["loss"])  # true barrier
    dt = (time.perf_counter() - t0) / 8 * 1000
    print(f"{tag:28s} {dt:8.1f} ms  loss={loss:.5f}", flush=True)


SKIP_MID = bool(os.environ.get("FSNET_ABLATE_MODEL_ONLY"))

import fsnet_tpu.ops.warp_fast as wf
orig_gs = wf.grid_sample


def _identity_warp(image, grid, **k):
    # grids may be scale-batched (grid B = k * image B)
    rep = grid.shape[0] // image.shape[0]
    out = jnp.broadcast_to(image[None], (rep,) + image.shape)
    return out.reshape((grid.shape[0],) + image.shape[1:])


wf.grid_sample = _identity_warp
import fsnet_tpu.models.heads.monodepth2_decoder as md
orig_md_gs = md.grid_sample
md.grid_sample = wf.grid_sample
SKIP_MID or timed("warp -> identity")
wf.grid_sample = orig_gs
md.grid_sample = orig_md_gs

import importlib
ssim_mod = importlib.import_module("fsnet_tpu.ops.ssim")
orig_ssim = ssim_mod.ssim
fake_ssim = lambda a, b, **k: (a - b) * 0.5
ssim_mod.ssim = fake_ssim
md.ssim_fn = fake_ssim
SKIP_MID or timed("ssim -> l1")
ssim_mod.ssim = orig_ssim
md.ssim_fn = orig_ssim

import fsnet_tpu.ops.geometry as geo
orig_smooth = geo.get_smooth_loss
fake_smooth = lambda disp, img: jnp.mean(disp) * 0.0
geo.get_smooth_loss = fake_smooth
md.get_smooth_loss = fake_smooth
SKIP_MID or timed("smoothness -> 0")
geo.get_smooth_loss = orig_smooth
md.get_smooth_loss = orig_smooth

print("done", flush=True)


def _ablate_loss_only():
    """Replace the entire head loss with a cheap scalar over the depth maps:
    measures backbone+decoders fwd/bwd + optimizer, without the loss region."""
    import fsnet_tpu.models.heads.monodepth2_decoder as md2

    orig_loss = md2.MonoDepth2Decoder.loss

    def tiny_loss(self, output_dict, input_dict, noise_rng=None):
        total = 0.0
        for s in self.scales:
            total = total + jnp.mean(output_dict[("depth", s, s)])
        return {"loss": total * 1e-3, "loss_dict": {}, "hm": {}}

    md2.MonoDepth2Decoder.loss = tiny_loss
    timed("loss -> mean(depth)")
    md2.MonoDepth2Decoder.loss = orig_loss


if os.environ.get("FSNET_ABLATE_MODEL"):
    _ablate_loss_only()
