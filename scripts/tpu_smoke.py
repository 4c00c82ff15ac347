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
  3. an f32 step at ``jax_default_matmul_precision=highest`` per route
     (kernel vs XLA) from the SAME state agrees on the loss to
     |rel| < REL32_TOL. At this precision both routes are near-exact
     (the einsum band warp's ~2e-3 bf16-matmul sample noise — which flips
     min-reprojection argmin ties and swamps any route comparison at
     production bf16 — disappears), so the tolerance is TIGHT;
  4. BACKWARD gate (round-4 VERDICT item 3): the f32 compiles also ship
     the raw parameter gradients (``make_train_step(with_grads=True)``) —
     global and per-leaf rel-L2 between the kernel and XLA routes must
     stay under tight f32 tolerances, and the two routes' adam updates
     must not flip direction on more than a noise-level fraction of
     elements. This closes the hole where a Mosaic miscompile produces
     finite-but-WRONG gradients: loss is a forward quantity and the old
     gate could not see it. Design note: a first bf16-vs-bf16 version of
     this gate measured global grad rel-L2 0.236 / 13% adam sign flips
     between two CORRECT routes (tie flips + BN-cancelled conv-bias
     leaves whose true gradient is exactly 0) — production-dtype gradient
     comparison has no detection power, which is why the backward gate
     runs at f32/highest.
  5. the production bf16 kernel-route loss agrees with the bf16 XLA-route
     loss to |rel| < REL_TOL (measured 2e-5 at the KITTI shape) — route
     parity at the production dtype. The bf16-vs-f32 LOSS ratio is
     reported but NOT gated: bf16 SSIM inflates the loss on low-variance
     windows (the E[x^2]-mu^2 cancellation noise ~1e-3*E[x^2] is
     comparable to C2=9e-4, so flat-window SSIM values are depressed;
     measured +57% total loss on the smooth synthetic bench scenes, while
     route parity holds at 2e-5 and the 5-seed convergence studies show
     shipped bf16 training matching/beating the f32 oracle — BASELINE.md
     "Round 5: backward smoke gate").

Usage: python scripts/tpu_smoke.py [kitti|nusc|fisheye ...]  (default: all)
Runtime: ~4 compiles per shape, 20-45 min total on a warm cache.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

#: bf16 production loss vs f32 XLA loss (bf16 rounding through the step).
REL_TOL = 2e-2
#: f32/highest kernel-route loss vs f32/highest XLA-route loss.
REL32_TOL = float(os.environ.get("FSNET_SMOKE_REL32", "1e-3"))
#: GLOBAL rel-L2 gradient disagreement budget between the Pallas-kernel
#: and pure-XLA routes at f32/highest, over the concatenated gradient
#: vector. Measured route noise: BASELINE.md "Round 5: backward gate".
GRAD_GLOBAL_TOL = float(os.environ.get("FSNET_SMOKE_GRAD_TOL", "3e-2"))
#: Per-leaf HARD bound for non-negligible leaves: catches a miscompile
#: localized to one parameter's backward (rel ~ sqrt(2) for decorrelated,
#: 1.0 for zeroed gradients).
GRAD_LEAF_HARD = float(os.environ.get("FSNET_SMOKE_GRAD_HARD", "0.5"))
#: Leaves whose gradient L2 is below GRAD_FLOOR x the global gradient RMS
#: are reported but not hard-gated: BN-cancelled conv biases carry a TRUE
#: gradient of exactly zero (the loss is invariant to them), so their
#: computed values are pure cancellation residue in any dtype and their
#: rel-L2 is meaningless noise-vs-noise.
GRAD_FLOOR = 1e-2
#: Updated-parameter agreement: adam's first-step update magnitude is
#: exactly lr elementwise, so two routes with correct gradients flip
#: direction only where |g| sits below the route noise; miscompiled
#: backwards flip signs en masse. Gate the FRACTION of elements whose
#: update differs by more than half an lr.
UPD_FRAC_TOL = float(os.environ.get("FSNET_SMOKE_UPD_FRAC", "0.02"))


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

    def img():
        # spatially-correlated textures, as in the pinhole batch: white
        # noise maximizes bf16-vs-f32 gradient divergence (every pixel is
        # a min-reprojection knife edge), which drowned the packed-path
        # backward sanity check in legitimate noise (measured rel 0.95)
        from scipy.ndimage import zoom

        lo = rng.rand(B, H // 16, W // 16, 3)
        up = zoom(lo, (1, 16, 16, 1), order=3, grid_mode=True,
                  mode="nearest")
        return np.clip(up, 0.0, 1.0).astype(np.float32)
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


LR = 1e-4


def run_one(name):
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state, make_train_step

    B, H, W, builder = RECIPES[name]
    model, batch = builder(B, H, W)
    batch = jax.device_put(batch)
    tx, _ = build_optimizer(dict(name="adam", lr=LR), None,
                            steps_per_epoch=100)
    state0 = init_state(model, batch, tx, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    def one_step(tag, dtype, with_grads):
        step = make_train_step(donate=False, compute_dtype=dtype,
                               with_grads=with_grads)
        t0 = time.time()
        new_state, metrics, _ = step(state0, batch, rng)
        loss = float(metrics["loss"])  # device read = real barrier
        print(f"  {name}/{tag}: compiled+ran in {time.time() - t0:.0f}s "
              f"loss={loss:.6f}", flush=True)
        assert np.isfinite(loss), f"{name}/{tag}: non-finite loss {loss}"
        if not with_grads:
            return loss, None, None
        grads = jax.device_get(metrics["_grads"])
        params = jax.device_get(new_state.params)
        return loss, grads, params

    # 1/2) production bf16 kernel route: the compile + finite-loss
    # certificate for what actually ships (round-3 post-mortem). Grads are
    # kept for a LOOSE packed-path sanity check: at f32 the kernel route
    # dispatches the UNPACKED kernels, so the tight f32 backward gate
    # below does not execute the bf16 row-pair-packed kernel family —
    # comparing bf16-kernel grads against f32-kernel grads at a loose
    # tolerance catches a catastrophic packed-backward miscompile (zeroed/
    # garbage gradients), which is the realistic Mosaic failure mode.
    _toggle_kernels(True)
    _assert_kernels_dispatch(name, B, H, W)
    loss_bf, grads_bf, _ = one_step("kernels-bf16", jnp.bfloat16, True)
    _toggle_kernels(False)
    loss_bx, _, _ = one_step("xla-bf16", jnp.bfloat16, False)
    _toggle_kernels(True)

    # 3/4) f32/highest route comparison: near-exact on both sides, so the
    # loss AND backward tolerances are tight (module docstring)
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        loss_k, grads_k, params_k = one_step("kernels-f32", None, True)
        _toggle_kernels(False)
        loss_x, grads_x, params_x = one_step("xla-f32", None, True)
    finally:
        _toggle_kernels(True)
        jax.config.update("jax_default_matmul_precision", None)

    rel32 = abs(loss_k - loss_x) / max(abs(loss_x), 1e-12)
    rel_bf = abs(loss_bf - loss_bx) / max(abs(loss_bx), 1e-12)
    status = "ok" if rel32 < REL32_TOL and rel_bf < REL_TOL else "FAIL"
    print(f"  {name}: f32 kernel {loss_k:.6f} vs xla {loss_x:.6f} "
          f"rel {rel32:.2e}; bf16 kernel {loss_bf:.6f} vs xla "
          f"{loss_bx:.6f} rel {rel_bf:.2e} {status}; bf16/f32 loss ratio "
          f"{loss_bf / max(loss_x, 1e-12):.3f} (not gated — bf16 SSIM "
          f"flat-window inflation, see docstring)", flush=True)
    assert rel32 < REL32_TOL, (name, loss_k, loss_x, rel32)
    assert rel_bf < REL_TOL, (name, loss_bf, loss_bx, rel_bf)
    _backward_gate(name, grads_k, grads_x, params_k, params_x)
    # loose packed-path backward sanity (see the bf16 step comment):
    # correct bf16 grads measured at global rel 0.59 vs f32 at the KITTI
    # shape (the bf16 SSIM flat-window noise — the same effect behind the
    # 1.57x loss ratio — injects a real gradient-noise component; cosine
    # similarity ~0.83, strongly correlated). A zeroed packed backward
    # lands at 1.0 and a decorrelated one at ~sqrt(2); gate between.
    g_bf = np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in jax.tree.leaves(grads_bf)])
    g_32 = np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in jax.tree.leaves(grads_k)])
    rel_pk = float(np.linalg.norm(g_bf - g_32) / np.linalg.norm(g_32))
    cos_pk = float(np.dot(g_bf, g_32)
                   / max(np.linalg.norm(g_bf) * np.linalg.norm(g_32),
                         1e-30))
    print(f"  {name}: packed-path bf16-vs-f32 grad rel-L2 {rel_pk:.3f} "
          f"cos {cos_pk:.3f} (loose gate: cos > 0.25)", flush=True)
    assert cos_pk > 0.25, (
        f"{name}: bf16 packed-kernel gradients decorrelated from the f32 "
        f"kernel route (cos {cos_pk:.3f}, rel {rel_pk:.3f}) — packed "
        f"backward suspect (zeroed/garbage backwards land at cos ~ 0)")


def _backward_gate(name, grads_k, grads_x, params_k, params_x):
    """Assert the kernel route's BACKWARD agrees with the XLA route.

    (a) GLOBAL rel-L2 of the concatenated gradient vector < GRAD_GLOBAL_TOL
        (a miscompiled warp/conv backward corrupts the whole upstream
        subtree, which dominates the aggregate);
    (b) per-leaf rel-L2 < GRAD_LEAF_HARD for every leaf carrying
        non-negligible gradient mass (catches a localized miscompile, e.g.
        one conv's dw kernel zeroed/decorrelated);
    (c) the two routes' adam updates flip direction on < UPD_FRAC_TOL of
        elements (first-step adam moves every element by exactly +-lr, so
        a wrong-but-finite backward shows up as mass sign flips)."""
    leaves_k, treedef = jax.tree.flatten(grads_k)
    leaves_x = treedef.flatten_up_to(grads_x)
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(grads_k)[0]]
    # global gradient RMS sets the negligible-leaf floor
    tot_sq = sum(float(np.sum(np.square(np.asarray(g, np.float64))))
                 for g in leaves_x)
    tot_n = sum(g.size for g in leaves_x)
    g_rms = np.sqrt(tot_sq / max(tot_n, 1))
    diff_sq = 0.0
    rows = []
    for path, gk, gx in zip(paths, leaves_k, leaves_x):
        gk = np.asarray(gk, np.float64)
        gx = np.asarray(gx, np.float64)
        nx = np.sqrt(np.mean(np.square(gx)))
        d = np.sum(np.square(gk - gx))
        diff_sq += float(d)
        rel = np.sqrt(d / gx.size) / max(nx, 1e-30)
        rows.append((rel, path, nx, nx >= GRAD_FLOOR * g_rms))
    g_rel = np.sqrt(diff_sq / tot_sq)
    rows.sort(reverse=True)
    top = [(rel, p, nx, gated) for rel, p, nx, gated in rows[:8]]
    for rel, p, nx, gated in top:
        print(f"    grad rel-L2 {rel:8.4f}  rms {nx:.2e} "
              f"{'' if gated else '(negligible)'} {p}", flush=True)
    # updated-parameter contract (VERDICT r4 item 3): fraction of elements
    # whose adam update differs by > lr/2 between routes
    pk = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree.leaves(params_k)])
    px = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree.leaves(params_x)])
    frac = float(np.mean(np.abs(pk - px) > 0.5 * LR))
    print(f"  {name}: backward — global grad rel-L2 {g_rel:.4f}, "
          f"update sign-flip frac {frac:.4f}", flush=True)
    assert g_rel < GRAD_GLOBAL_TOL, (
        f"{name}: GLOBAL backward mismatch: rel-L2 {g_rel:.3f} >= "
        f"{GRAD_GLOBAL_TOL}")
    for rel, path, nx, gated in rows:
        assert not (gated and rel >= GRAD_LEAF_HARD), (
            f"{name}: backward mismatch at {path}: rel-L2 {rel:.3f} "
            f"(leaf rms {nx:.2e}, global rms {g_rms:.2e})")
    assert frac < UPD_FRAC_TOL, (
        f"{name}: {frac:.2%} of param updates differ by > lr/2 between "
        f"the kernel and XLA routes")


def main():
    names = sys.argv[1:] or list(RECIPES)
    for name in names:
        print(f"[tpu_smoke] {name} ...", flush=True)
        run_one(name)
    print(f"[tpu_smoke] ALL OK ({', '.join(names)})", flush=True)


if __name__ == "__main__":
    main()
