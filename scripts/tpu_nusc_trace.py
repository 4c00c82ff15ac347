"""Capture a jax.profiler device trace of the NuScenes-recipe train step
(bs8 @ 288x512, ResNet-34, base_fx — round-4 VERDICT item 8: the 232.6
imgs/s number was recorded without a step breakdown).

Usage: python scripts/tpu_nusc_trace.py [outdir=/tmp/fsnet_nusc_trace]
Then:  python scripts/parse_xplane.py <outdir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fsnet_tpu.models import MonoDepthWPose
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsnet_nusc_trace"
B, H, W = 8, 288, 512

model = MonoDepthWPose(
    depth_backbone_cfg=dict(
        name="fsnet_tpu.models.backbones.resnet.resnet",
        depth=34, num_stages=4, out_indices=(-1, 0, 1, 2, 3),
        norm_eval=False, dilations=(1, 1, 1, 1)),
    head_cfg=dict(
        name="fsnet_tpu.models.heads.monodepth2_decoder.MonoDepth2Decoder",
        scales=(0, 1, 2, 3), height=H, width=W,
        min_depth=0.5, max_depth=100.0, is_log_image=False,
        overlapped_mask=True,
        depth_decoder_cfg=dict(
            name="fsnet_tpu.models.heads.depth_decoder."
                 "MultiChannelDepthDecoder",
            num_output_channels=16, use_skips=True, scales=(0, 1, 2, 3),
            min_depth=0.5, max_depth=100.0, base_fx=369.0)),
    train_cfg=dict(frame_ids=(0, 1, -1)), test_cfg=dict())
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                        steps_per_epoch=100)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))
rng = jax.random.PRNGKey(1)
step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)

import time
for _ in range(5):
    state, metrics, _ = step(state, batch, rng)
    float(metrics["loss"])
# steady-state rate alongside the trace
t0 = time.perf_counter()
for _ in range(20):
    state, metrics, _ = step(state, batch, rng)
float(metrics["loss"])
dt = time.perf_counter() - t0
print(f"nusc bs{B} @ {H}x{W} r34: {B * 20 / dt:.1f} imgs/s "
      f"({dt / 20 * 1e3:.1f} ms/step)", flush=True)

jax.profiler.start_trace(OUT)
for _ in range(4):
    state, metrics, _ = step(state, batch, rng)
float(metrics["loss"])
jax.profiler.stop_trace()
print("trace ->", OUT)
