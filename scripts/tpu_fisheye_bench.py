"""Fisheye-recipe train throughput on real TPU: the reference's
``configs/kitti360_fisheye_example`` shape (bs 16 @ 384x384, Mei camera,
FishEyeDecoder) on a synthetic batch with a REAL backtracked ray map.

Usage: python scripts/tpu_fisheye_bench.py [batch] [steps] [windows]
Results go to BASELINE.md by hand (VERDICT round-1 item 6: the fisheye path
had never been benched on TPU).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fsnet_tpu.ops.fisheye import MeiCameraProjection
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step
from fsnet_tpu.utils.keys import encode_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
WINDOWS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
H, W = 384, 384
XI, K1, K2 = 2.2, 0.2, 0.1  # Mei mirror + radial distortion (KITTI-360-like)


def _batch():
    P_np = np.zeros((3, 4), np.float32)
    P_np[0, 0] = P_np[1, 1] = 1.3 * W
    P_np[0, 2], P_np[1, 2], P_np[2, 2] = W / 2.0, H / 2.0, 1.0
    rng = np.random.RandomState(0)
    P = np.tile(P_np[None], (B, 1, 1))
    # realistic KITTI-360 side-camera motion (honest-bench mandate,
    # BASELINE.md fisheye band probe): vehicle forward = camera x, so the
    # dominant translation is +-0.7 m along x with +-0.3 deg rotations —
    # toy displacements keep the dynamic gather windows coherent and
    # flatter the number
    from scipy.spatial.transform import Rotation
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    for b in range(B):
        pose[b, :3, :3] = Rotation.from_euler(
            "xyz", rng.uniform(-0.3, 0.3, 3), degrees=True).as_matrix()
        pose[b, :3, 3] = [rng.uniform(0.55, 0.8), rng.uniform(-0.02, 0.02),
                          rng.uniform(-0.05, 0.05)]
    mei = MeiCameraProjection()
    X, Y, Z, mask = mei.get_ray_map(
        H, W, P_np, {"mirror_parameters": {"xi": XI},
                     "distortion_parameters": {"k1": K1, "k2": K2}})
    rays = np.stack([X[0], Y[0], Z[0], mask[0]], axis=-1)
    img = lambda: rng.rand(B, H, W, 3).astype(np.float32)  # noqa: E731
    data = {
        ("image", 0): img(), ("image", 1): img(), ("image", -1): img(),
        ("original_image", 0): img(), ("original_image", 1): img(),
        ("original_image", -1): img(),
        ("relative_pose", 1): pose, ("relative_pose", -1): pose.copy(),
        "P2": P.astype(np.float32),
        "fisheye_rays": np.tile(rays[None], (B, 1, 1, 1)).astype(np.float32),
        "fisheye_params": np.tile(np.array([[XI, K1, K2]], np.float32),
                                  (B, 1)),
        "patched_mask": np.ones((B, H, W), np.float32),
    }
    return encode_batch(data)


def _model():
    from fsnet_tpu.models import MonoDepthWPose

    return MonoDepthWPose(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet", depth=18,
            out_indices=(-1, 0, 1, 2, 3), norm_eval=False),
        head_cfg=dict(
            name="fsnet_tpu.models.heads.fisheye_decoder.FishEyeDecoder",
            scales=(0, 1, 2, 3), height=H, width=W, min_depth=0.1,
            max_depth=80.0, is_log_image=False, overlapped_mask=True,
            depth_decoder_cfg=dict(
                name=("fsnet_tpu.models.heads.depth_decoder."
                      "MultiChannelDepthDecoder"),
                num_output_channels=16, scales=(0, 1, 2, 3),
                min_depth=0.1, max_depth=80.0)),
        train_cfg=dict(frame_ids=(0, 1, -1)),
        test_cfg=dict())


def main():
    from fsnet_tpu.ops.warp_mei import warp_mei_supported

    model = _model()
    print("norm-direct Mei path:",
          warp_mei_supported((2 * B, H, W, 3), 16), flush=True)
    batch = jax.device_put(_batch())
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                            steps_per_epoch=100)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)

    t0 = time.time()
    state, metrics, _ = step(state, batch, rng)
    loss = float(metrics["loss"])
    print(f"compiled in {time.time() - t0:.0f}s, loss={loss:.5f}",
          flush=True)
    assert np.isfinite(loss)

    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics, _ = step(state, batch, rng)
        loss = float(metrics["loss"])  # device read: true barrier
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1000
    print(f"fisheye bs{B} @ {H}x{W}: {ms:.1f} ms/step  "
          f"{B * 1000 / ms:.1f} imgs/s  loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main()
