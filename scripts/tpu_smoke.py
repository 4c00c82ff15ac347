"""Real-TPU kernel gate: compile + run ONE train step at every recipe shape
with all Pallas kernels at their shipped defaults, then assert loss parity
against the pure-XLA route from the same initial state.

Round-3 post-mortem (VERDICT r3 item 2): interpret-mode tests are green for
kernels that do not COMPILE on the target — 832c882 alone found three Mosaic
lowering bugs the interpret suite hid, and the round-3 bench regression was a
scoped-VMEM stack OOM no CPU test can see. This script is the mandatory gate
before any kernel change ships default-on (see .claude/skills/verify/SKILL.md);
the reference's CI equivalent builds its CUDA op on a CUDA runner before
pytest (/root/reference/.gitlab-ci.yml:1-16).

Checks, per recipe shape (KITTI 12@192x640, NuScenes 8@288x512, fisheye
16@384x384 — SURVEY.md §6):
  1. the default-route step compiles and runs with a finite loss;
  2. the kernel routes actually dispatched (supported-predicates true), so
     the gate cannot silently pass with kernels off;
  3. a fresh step with every kernel toggled off (full XLA route) from the
     SAME state agrees on the loss to |rel| < 2e-2 (band-warp einsum noise
     ~2e-3 + f32-vs-bf16 pooling differences; both routes bf16 training).

Usage: python scripts/tpu_smoke.py [kitti|nusc|fisheye ...]  (default: all)
Runtime: ~2 compiles per shape, 5-15 min total on a warm cache.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REL_TOL = 2e-2


def _toggle_kernels(on: bool) -> None:
    """Flip every Pallas dispatch predicate in-process. Each jitted step is
    built fresh after a flip (new make_train_step => new trace), so the
    toggles are honored — never flip between calls of ONE jitted fn.

    ``on=True`` restores the SHIPPED defaults — which the gate exists to
    certify — not all-kernels-on: the fused photometric kernel defaults OFF
    (measured negative result, BASELINE.md round 4; its 64 MB-scope backward
    is also a >28 min Mosaic compile at the fisheye shape)."""
    import fsnet_tpu.ops.fast_conv as fc
    import fsnet_tpu.ops.photo_loss as ploss
    import fsnet_tpu.ops.warp_depth as wd
    import fsnet_tpu.ops.warp_fast as wf
    import fsnet_tpu.ops.warp_mei as wm

    ploss.PHOTO_KERNEL = False  # shipped default (FSNET_PHOTO_KERNEL=0)
    wd.WARP_DEPTH = on
    wm.WARP_MEI = on
    wf.DMA_GATHER = on
    fc.PALLAS_CONV = on


def _fisheye_model_batch(B, H, W):
    from fsnet_tpu.models import MonoDepthWPose
    from fsnet_tpu.ops.fisheye import MeiCameraProjection
    from fsnet_tpu.utils.keys import encode_batch

    XI, K1, K2 = 2.2, 0.2, 0.1
    model = MonoDepthWPose(
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

    P_np = np.zeros((3, 4), np.float32)
    P_np[0, 0] = P_np[1, 1] = 1.3 * W
    P_np[0, 2], P_np[1, 2], P_np[2, 2] = W / 2.0, H / 2.0, 1.0
    rng = np.random.RandomState(0)
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
    batch = encode_batch({
        ("image", 0): img(), ("image", 1): img(), ("image", -1): img(),
        ("original_image", 0): img(), ("original_image", 1): img(),
        ("original_image", -1): img(),
        ("relative_pose", 1): pose, ("relative_pose", -1): pose.copy(),
        "P2": np.tile(P_np[None], (B, 1, 1)).astype(np.float32),
        "fisheye_rays": np.tile(rays[None], (B, 1, 1, 1)).astype(np.float32),
        "fisheye_params": np.tile(np.array([[XI, K1, K2]], np.float32),
                                  (B, 1)),
        "patched_mask": np.ones((B, H, W), np.float32),
    })
    return model, batch


def _pinhole_model_batch(B, H, W):
    import __graft_entry__ as ge

    return ge._flagship_model(H, W), ge._synthetic_batch(B, H, W)


RECIPES = {
    # name: (B, H, W, builder) — the three reference recipe shapes
    # (SURVEY.md §6: KITTI bs12@192x640, NuScenes bs8@288x512,
    # KITTI-360 fisheye bs16@384x384)
    "kitti": (12, 192, 640, _pinhole_model_batch),
    "nusc": (8, 288, 512, _pinhole_model_batch),
    "fisheye": (16, 384, 384, _fisheye_model_batch),
}


def _assert_kernels_dispatch(name, B, H, W):
    """The gate is meaningless if the kernels silently fell back to XLA:
    assert the SHIPPED default kernel routes dispatch at this shape (the
    warp/prep kernel families; the fused photometric kernel is default-off
    — a measured negative result, BASELINE.md round 4)."""
    from fsnet_tpu.ops.warp_depth import warp_depth_supported

    F = 2
    if name == "fisheye":
        from fsnet_tpu.ops.warp_mei import warp_mei_supported

        assert warp_mei_supported((F * B, H, W, 3), 16), (
            f"{name}: norm-direct Mei warp does not dispatch")
    else:
        assert warp_depth_supported((F * B, H, W, 3), 4), (
            f"{name}: depth-direct warp chain does not dispatch at "
            f"{(F * B, H, W, 3)} — gate would not exercise it")


def run_one(name):
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state, make_train_step

    B, H, W, builder = RECIPES[name]
    model, batch = builder(B, H, W)
    batch = jax.device_put(batch)
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                            steps_per_epoch=100)
    state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    def one_step(tag):
        step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
        t0 = time.time()
        _, metrics, _ = step(state0, batch, rng)
        loss = float(metrics["loss"])  # device read = real barrier
        print(f"  {name}/{tag}: compiled+ran in {time.time() - t0:.0f}s "
              f"loss={loss:.6f}", flush=True)
        assert np.isfinite(loss), f"{name}/{tag}: non-finite loss {loss}"
        return loss

    _toggle_kernels(True)
    _assert_kernels_dispatch(name, B, H, W)
    loss_k = one_step("kernels")
    _toggle_kernels(False)
    try:
        loss_x = one_step("xla")
    finally:
        _toggle_kernels(True)

    rel = abs(loss_k - loss_x) / max(abs(loss_x), 1e-12)
    status = "ok" if rel < REL_TOL else "FAIL"
    print(f"  {name}: kernel {loss_k:.6f} vs xla {loss_x:.6f} "
          f"rel {rel:.2e} {status}", flush=True)
    assert rel < REL_TOL, (name, loss_k, loss_x, rel)


def main():
    names = sys.argv[1:] or list(RECIPES)
    for name in names:
        print(f"[tpu_smoke] {name} ...", flush=True)
        run_one(name)
    print(f"[tpu_smoke] ALL OK ({', '.join(names)})", flush=True)


if __name__ == "__main__":
    main()
