"""Torch-oracle parity for the FISHEYE (Mei) loss path: run the reference's
own ``FishEyeDecoder`` (``/root/reference/monodepth/networks/models/heads/
monodepth2_decoder.py:350-413``) + ``MeiCameraProjection`` backtracking
(``mei_fisheye_utils.py:122-187``, numba stubbed to pure python) on a fixed
synthetic batch and assert the fsnet_tpu ``FishEyeDecoder`` matches loss and
gradients w.r.t. the norm maps and poses.

The reference's cached rays keep the *distorted*-plane X/Y (its docstring
step 2 — rescale by r0/r1 — is absent from the code), so the oracle
comparison feeds our head ray maps built with ``ref_compat_xy=True``;
production uses the corrected (round-trip-consistent) rays. See
``fsnet_tpu/ops/fisheye.py:backtrack_ray_map``.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "monodepth")),
    reason="reference checkout not present")

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_reference_parity import (  # noqa: E402
    _install_stubs, _pose, _smooth_map, _rel_l2)

B, H, W = 2, 96, 96
SCALES = (0, 1, 2, 3)
FRAMES = (0, 1, -1)

# KITTI-360 fisheye image_02 Mei intrinsics scaled from 1400x1400 to 96x96
XI, K1, K2 = 2.1709, 1.6798, 0.1571
GAMMA = 1336.0 * W / 1400.0


@pytest.fixture(scope="module")
def ref_fisheye_cls():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    mp.setattr(torch, "randn", lambda *shape, **k: torch.zeros(*shape))
    from monodepth.networks.models.heads.monodepth2_decoder import (  # noqa
        FishEyeDecoder as RefFishEye,
    )
    yield RefFishEye
    mp.undo()


def _calib_dict():
    return {
        "mirror_parameters": {"xi": XI},
        "distortion_parameters": {"k1": K1, "k2": K2},
    }


def _fixed_case():
    rng = np.random.RandomState(13)
    images = {f: rng.rand(B, H, W, 3).astype(np.float32) for f in FRAMES}
    P2 = np.zeros((B, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = GAMMA
    P2[:, 0, 2] = 0.5 * W
    P2[:, 1, 2] = 0.5 * H
    P2[:, 2, 2] = 1.0
    # norm maps (the fisheye "depth" channel is the ray norm)
    norms = [_smooth_map(rng, B, H >> s, W >> s, 4.0, 40.0)[..., None]
             for s in SCALES]
    disps = [_smooth_map(rng, B, H >> s, W >> s, 0.05, 0.9)[..., None]
             for s in SCALES]
    poses = {f: np.stack([_pose(rng) for _ in range(B)]) for f in FRAMES[1:]}
    return P2, images, norms, disps, poses


def _ref_fisheye_loss(RefFishEye, overlapped_mask):
    P2, images, norms, disps, poses = _fixed_case()
    dec = RefFishEye(scales=list(SCALES), height=H, width=W,
                     frame_ids=list(FRAMES),
                     depth_decoder_cfg=dict(name="torch.nn.Identity"),
                     overlapped_mask=overlapped_mask, is_log_image=False)
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))  # noqa: E731
    nchw = lambda x: t(x).permute(0, 3, 1, 2).contiguous()   # noqa: E731

    inputs = {("original_image", f): nchw(images[f]) for f in FRAMES}
    inputs["P2"] = t(P2)
    inputs["calib_meta"] = [_calib_dict() for _ in range(B)]
    t_norms = [nchw(d).requires_grad_() for d in norms]
    t_disps = [nchw(d).requires_grad_() for d in disps]
    t_poses = {f: t(poses[f].astype(np.float32)).requires_grad_()
               for f in FRAMES[1:]}
    outputs = {}
    for si, s in enumerate(SCALES):
        outputs[("depth", s, s)] = t_norms[si]
        outputs[("disp", s)] = t_disps[si]
    for f in FRAMES[1:]:
        outputs[("cam_T_cam", f)] = t_poses[f]

    out = dec.loss(outputs, inputs)
    out["loss"].backward()
    return (float(out["loss"].detach()),
            {s: float(out["loss_dict"][f"loss/{s}"].detach())
             for s in SCALES},
            [d.grad.permute(0, 2, 3, 1).numpy() for d in t_norms],
            {f: t_poses[f].grad.numpy() for f in FRAMES[1:]})


def _jax_fisheye_loss(overlapped_mask):
    from fsnet_tpu.models.heads.fisheye_decoder import FishEyeDecoder
    from fsnet_tpu.ops.fisheye import backtrack_ray_map

    P2, images, norms, disps, poses = _fixed_case()
    head = FishEyeDecoder(
        scales=SCALES, height=H, width=W, frame_ids=FRAMES,
        depth_decoder_cfg=dict(
            name="fsnet_tpu.models.heads.depth_decoder.MultiChannelDepthDecoder",
            num_output_channels=4, scales=SCALES,
            min_depth=0.5, max_depth=100.0),
        overlapped_mask=overlapped_mask, is_log_image=False,
        warp_impl="gather")

    X, Y, Z, M = backtrack_ray_map(H, W, P2[0], XI, K1, K2,
                                   ref_compat_xy=True)
    rays = np.stack([X[0], Y[0], Z[0], M[0]], axis=-1)  # [H, W, 4]
    input_dict = {("original_image", f): jnp.asarray(images[f])
                  for f in FRAMES}
    input_dict["P2"] = jnp.asarray(P2)
    input_dict["fisheye_rays"] = jnp.asarray(
        np.broadcast_to(rays[None], (B, H, W, 4)))
    input_dict["fisheye_params"] = jnp.asarray(
        np.tile(np.asarray([[XI, K1, K2]], np.float32), (B, 1)))

    def loss_fn(t_norms, t_poses):
        output_dict = {}
        for si, s in enumerate(SCALES):
            output_dict[("depth", s, s)] = t_norms[si]
            output_dict[("disp", s)] = jnp.asarray(disps[si])
        for f in FRAMES[1:]:
            output_dict[("cam_T_cam", f)] = t_poses[f]
        out = head.apply({}, output_dict, dict(input_dict),
                         method=head.loss, noise_rng=None)
        return out["loss"], out["loss_dict"]

    j_norms = [jnp.asarray(d) for d in norms]
    j_poses = {f: jnp.asarray(poses[f].astype(np.float32))
               for f in FRAMES[1:]}
    (loss, loss_dict), grads = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    )(j_norms, j_poses)
    return (float(loss),
            {s: float(loss_dict[f"loss/{s}"]) for s in SCALES},
            [np.asarray(g) for g in grads[0]],
            {f: np.asarray(grads[1][f]) for f in FRAMES[1:]})


@pytest.mark.parametrize("overlapped_mask", [True, False])
def test_fisheye_loss_and_grads_match_reference(ref_fisheye_cls,
                                                overlapped_mask):
    """f32 production dtype: the whole fisheye chain (host ray backtracking
    -> lift -> SE(3) -> Mei forward projection -> border warp -> min
    reprojection/automask/smoothness) agrees with the reference. Ray maps
    come from independent solvers (per-pixel python Newton/bisection vs our
    vectorized numpy) at tol 1e-6, so tolerances are slightly looser than
    the pinhole suite's."""
    ref = _ref_fisheye_loss(ref_fisheye_cls, overlapped_mask)
    ours = _jax_fisheye_loss(overlapped_mask)

    assert abs(ours[0] - ref[0]) < 5e-4 * max(abs(ref[0]), 1e-3), \
        (ours[0], ref[0])
    for s in SCALES:
        assert abs(ours[1][s] - ref[1][s]) < 1e-3 * max(abs(ref[1][s]), 1e-3)
    for g_ours, g_ref in zip(ours[2], ref[2]):
        assert _rel_l2(g_ours, g_ref) < 5e-2
    for f in FRAMES[1:]:
        assert _rel_l2(ours[3][f], ref[3][f]) < 5e-2


def test_ref_compat_rays_match_reference_cache(ref_fisheye_cls):
    """backtrack_ray_map(ref_compat_xy=True) reproduces the reference's
    cached (X, Y, Z, mask) maps; the production variant differs from the
    reference exactly by the r0/r1 radial undistortion of X/Y (the
    documented deviation)."""
    from monodepth.networks.utils.mei_fisheye_utils import (
        MeiCameraProjection as RefMei)
    from fsnet_tpu.ops.fisheye import backtrack_ray_map

    P2 = np.zeros((1, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = GAMMA
    P2[:, 0, 2] = 0.5 * W
    P2[:, 1, 2] = 0.5 * H

    norm = torch.ones(1, 1, H, W)
    pts_ref, mask_ref = RefMei().image2cam(norm, torch.from_numpy(P2),
                                           [_calib_dict()])
    X, Y, Z, M = backtrack_ray_map(H, W, P2[0], XI, K1, K2,
                                   ref_compat_xy=True)
    ours = np.stack([X[0], Y[0], Z[0]], axis=-1)
    ref = pts_ref[0].permute(1, 2, 0, 3).numpy()[0] \
        if pts_ref.dim() == 5 else pts_ref[0].numpy()
    # reference image2cam returns [B, 1, H, W, 3] (norm kept a channel dim)
    ref = np.asarray(pts_ref[0]).reshape(H, W, 3) \
        if ref.shape != ours.shape else ref
    # tol 1e-6 solvers with different stopping rules (per-pixel early-exit
    # Newton vs fixed-iteration vectorized): boundary pixels land ~6e-5 apart
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    np.testing.assert_allclose(M[0], np.asarray(mask_ref[0]).reshape(H, W),
                               atol=0)

    Xp, Yp, Zp, Mp = backtrack_ray_map(H, W, P2[0], XI, K1, K2)
    valid = M[0] > 0
    assert np.allclose(Zp[0][valid], Z[0][valid], atol=1e-6)  # Z unchanged
    # X/Y differ off-center by the radial undistortion factor
    center = np.hypot(*np.meshgrid(np.arange(W) - W / 2,
                                   np.arange(H) - H / 2)) < W / 8
    off = valid & ~center
    if off.any():
        assert not np.allclose(Xp[0][off], X[0][off], atol=1e-4)
