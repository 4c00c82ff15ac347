"""Fisheye step attribution: where do the ~107 ms go? (round-4 VERDICT
item 4 — get the fisheye recipe from ~150 to >= 200 imgs/s or prove the
bound).

Ablation ladder (each row replaces one more block with a stand-in; the
deltas attribute the step):
  full step                  -> baseline
  overlapped_mask=False      -> cost of the nearest mask warp pass
  warps -> identity          -> cost of Mei prep + band-warp sweeps
  loss -> mean(depth)        -> cost of photometric assembly (SSIM/L1/min)
  remainder                  -> backbone + decoder fwd/bwd + adam

Usage: python scripts/tpu_fisheye_attrib.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tpu_fisheye_bench as fb
from fsnet_tpu.models import MonoDepthWPose
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

batch = jax.device_put(fb._batch())
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
rng = jax.random.PRNGKey(1)


def model(**head_overrides):
    head_cfg = dict(
        name="fsnet_tpu.models.heads.fisheye_decoder.FishEyeDecoder",
        scales=(0, 1, 2, 3), height=fb.H, width=fb.W, min_depth=0.1,
        max_depth=80.0, is_log_image=False, overlapped_mask=True,
        depth_decoder_cfg=dict(
            name=("fsnet_tpu.models.heads.depth_decoder."
                  "MultiChannelDepthDecoder"),
            num_output_channels=16, scales=(0, 1, 2, 3),
            min_depth=0.1, max_depth=80.0))
    head_cfg.update(head_overrides)
    return MonoDepthWPose(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet", depth=18,
            out_indices=(-1, 0, 1, 2, 3), norm_eval=False),
        head_cfg=head_cfg,
        train_cfg=dict(frame_ids=(0, 1, -1)),
        test_cfg=dict())


def timed(tag, m):
    state = init_state(m, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    state, metrics, _ = step(state, batch, rng)
    float(metrics["loss"])  # sync incl. compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            state, metrics, _ = step(state, batch, rng)
        loss = float(metrics["loss"])  # true barrier
        best = min(best, (time.perf_counter() - t0) / 8 * 1000)
    print(f"{tag:28s} {best:8.1f} ms  loss={loss:.5f}", flush=True)
    return best


t_full = timed("full step", model())
t_nomask = timed("overlapped_mask=False", model(overlapped_mask=False))

# identity warps: patch the decoder's _warp_all to broadcast sources
import fsnet_tpu.models.heads.fisheye_decoder as fd

orig_warp_all = fd.FishEyeDecoder._warp_all


def _identity_warp_all(self, input_dict, output_dict):
    from fsnet_tpu.models.blocks import interpolate_bilinear
    scales, frames = tuple(self.scales), tuple(self.frame_ids[1:])
    S, F = len(scales), len(frames)
    H, W = self.height, self.width
    output_dict.pop("pose_is_const", None)
    norms_full = jnp.stack([
        interpolate_bilinear(output_dict[("depth", s, s)], H, W,
                             align_corners=True) for s in scales], axis=0)
    B = norms_full.shape[1]
    sources = jnp.stack([
        input_dict[("original_image", f)] for f in frames], axis=0)
    preds = jnp.broadcast_to(
        sources[None] * (1.0 + 1e-6 * norms_full[:, None, ..., :1] * 0),
        (S, F, B, H, W, sources.shape[-1]))
    return preds, None, norms_full


fd.FishEyeDecoder._warp_all = _identity_warp_all
t_nowarp = timed("warps -> identity", model(overlapped_mask=False))
fd.FishEyeDecoder._warp_all = orig_warp_all

# loss -> mean(depth): model-only cost
import fsnet_tpu.models.heads.monodepth2_decoder as md2

orig_loss = md2.MonoDepth2Decoder.loss


def tiny_loss(self, output_dict, input_dict, noise_rng=None):
    total = 0.0
    for s in self.scales:
        total = total + jnp.mean(output_dict[("depth", s, s)])
    return {"loss": total * 1e-3, "loss_dict": {}, "hm": {}}


md2.MonoDepth2Decoder.loss = tiny_loss
t_model = timed("loss -> mean(depth)", model())
md2.MonoDepth2Decoder.loss = orig_loss

print(f"\nattribution (bs{fb.B} @ {fb.H}x{fb.W}):")
print(f"  mask warp pass        {t_full - t_nomask:7.1f} ms")
print(f"  Mei prep + band warps {t_nomask - t_nowarp:7.1f} ms")
print(f"  photometric assembly  {t_nowarp - t_model:7.1f} ms")
print(f"  model fwd/bwd + adam  {t_model:7.1f} ms")
print(f"  full step             {t_full:7.1f} ms "
      f"= {fb.B * 1000 / t_full:.1f} imgs/s")
