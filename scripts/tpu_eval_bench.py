"""Inference FPS (eval step) + NuScenes-recipe training throughput.

Records the two secondary BASELINE dimensions next to bench.py's flagship
number: jitted eval FPS at bs1/bs12 @192x640 (ResNet-18 flagship) and the
NuScenes-shaped recipe (bs8 @ 288x512, ResNet-34 backbone).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fsnet_tpu.models import MonoDepthWPose
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step, make_eval_step


def eval_fps():
    H, W = 192, 640
    model = ge._flagship_model(H, W)
    for B in (1, 12):
        batch = jax.device_put(ge._synthetic_batch(B, H, W))
        tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                                steps_per_epoch=10)
        state = init_state(model, batch, tx, jax.random.PRNGKey(0),
                           is_training=False)
        step = make_eval_step()
        out = step(state, batch)
        float(jnp.sum(out["depth"]))
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(state, batch)
        float(jnp.sum(out["depth"]))
        dt = time.perf_counter() - t0
        print(f"eval bs{B:2d} @192x640: {B * n / dt:8.1f} imgs/s "
              f"({dt / n * 1e3:.2f} ms/step)", flush=True)


def nusc_train():
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
                name="fsnet_tpu.models.heads.depth_decoder.MultiChannelDepthDecoder",
                num_output_channels=16, use_skips=True, scales=(0, 1, 2, 3),
                min_depth=0.5, max_depth=100.0, base_fx=369.0)),
        train_cfg=dict(frame_ids=(0, 1, -1)), test_cfg=dict())
    batch = jax.device_put(ge._synthetic_batch(B, H, W))
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                            steps_per_epoch=100)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    state, m, _ = step(state, batch, rng)
    float(m["loss"])
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m, _ = step(state, batch, rng)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"nusc train bs{B} @288x512 r34: {B * n / dt:8.1f} imgs/s "
          f"({dt / n * 1e3:.1f} ms/step) loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    # `eval` arg: eval FPS only (the round-5 bs1 variance study runs this
    # in >=3 separate sessions — each process is a fresh TPU claim — and
    # records mean +- spread in BASELINE.md, VERDICT r4 item 7)
    if "eval" in sys.argv[1:]:
        eval_fps()
    elif "nusc" in sys.argv[1:]:
        nusc_train()
    else:
        eval_fps()
        nusc_train()
