"""Mei fisheye camera model tests: forward/inverse consistency + the fisheye
loss head on synthetic batches."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsnet_tpu.ops.fisheye import (
    MeiCameraProjection, backtrack_ray_map, cam2image, image2cam_fixed_iter,
)

XI, K1, K2 = 2.2, 0.05, -0.01  # KITTI-360-ish fisheye parameters
H, W = 40, 48


def _P():
    P = np.zeros((3, 4), np.float32)
    P[0, 0] = P[1, 1] = 1.3 * W
    P[0, 2] = W / 2.0
    P[1, 2] = H / 2.0
    P[2, 2] = 1.0
    return P


def _calib():
    return {"mirror_parameters": {"xi": XI},
            "distortion_parameters": {"k1": K1, "k2": K2}}


def test_inverse_forward_roundtrip():
    """Lift each pixel to 3D via the precomputed ray map, project back via the
    forward model: must recover the pixel coordinates."""
    P = _P()
    X, Y, Z, mask = backtrack_ray_map(H, W, P, XI, K1, K2)
    valid = mask[0] > 0
    assert valid.sum() > 0.5 * H * W  # most pixels valid for these params

    norm = 7.5  # arbitrary positive range
    points = np.stack([X[0] * norm, Y[0] * norm, Z[0] * norm], axis=-1)
    projected = np.asarray(cam2image(jnp.asarray(points), jnp.asarray(P),
                                     XI, K1, K2))
    uu, vv = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    np.testing.assert_allclose(projected[valid][:, 0], uu[valid], atol=0.05)
    np.testing.assert_allclose(projected[valid][:, 1], vv[valid], atol=0.05)
    np.testing.assert_allclose(projected[valid][:, 2], norm, atol=1e-3)


def test_ray_unit_norm():
    """(X, Y, Z) rays must be unit vectors (norm * ray has length norm)."""
    X, Y, Z, mask = backtrack_ray_map(H, W, _P(), XI, K1, K2)
    valid = mask[0] > 0
    lengths = np.sqrt(X[0] ** 2 + Y[0] ** 2 + Z[0] ** 2)[valid]
    np.testing.assert_allclose(lengths, 1.0, atol=1e-4)


def test_jax_fixed_iter_matches_host():
    P = _P()
    Xh, Yh, Zh, maskh = backtrack_ray_map(H, W, P, XI, K1, K2)
    norm = jnp.ones((1, H, W, 1))
    points, mask = image2cam_fixed_iter(norm, jnp.asarray(P)[None], XI, K1, K2)
    pts = np.asarray(points[0])
    both = (maskh[0] > 0) & (np.asarray(mask[0]) > 0)
    assert both.sum() > 0.4 * H * W
    np.testing.assert_allclose(pts[both][:, 0], Xh[0][both], atol=1e-3)
    np.testing.assert_allclose(pts[both][:, 2], Zh[0][both], atol=1e-3)


def test_mei_projection_cache():
    mei = MeiCameraProjection()
    P = _P()
    mei.get_ray_map(H, W, P, _calib())
    assert len(mei.cache) == 1
    mei.get_ray_map(H, W, P, _calib())
    assert len(mei.cache) == 1  # cache hit


@pytest.mark.heavy
def test_fisheye_decoder_loss():
    from fsnet_tpu.models.heads.fisheye_decoder import FishEyeDecoder
    from fsnet_tpu.utils.keys import encode_batch

    B = 2
    H, W = 64, 96  # decoder needs /32-divisible shapes
    P_np = np.zeros((3, 4), np.float32)
    P_np[0, 0] = P_np[1, 1] = 1.3 * W
    P_np[0, 2], P_np[1, 2], P_np[2, 2] = W / 2.0, H / 2.0, 1.0

    rng = np.random.RandomState(0)
    P = np.tile(P_np[None], (B, 1, 1))
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    pose[:, 0, 3] = 0.1

    mei = MeiCameraProjection()
    X, Y, Z, mask = mei.get_ray_map(H, W, P_np, _calib())
    rays = np.stack([X[0], Y[0], Z[0], mask[0]], axis=-1)

    img = lambda: rng.rand(B, H, W, 3).astype(np.float32)  # noqa: E731
    data = {
        ("image", 0): img(), ("image", 1): img(), ("image", -1): img(),
        ("original_image", 0): img(), ("original_image", 1): img(),
        ("original_image", -1): img(),
        ("relative_pose", 1): pose, ("relative_pose", -1): pose.copy(),
        "P2": P.astype(np.float32),
        "fisheye_rays": np.tile(rays[None], (B, 1, 1, 1)).astype(np.float32),
        "fisheye_params": np.tile(
            np.array([[XI, K1, K2]], np.float32), (B, 1)),
        "patched_mask": np.ones((B, H, W), np.float32),
    }
    batch = encode_batch(data)

    from fsnet_tpu.models import MonoDepthWPose
    model = MonoDepthWPose(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet", depth=18,
            out_indices=(-1, 0, 1, 2, 3), norm_eval=False),
        head_cfg=dict(
            name="fsnet_tpu.models.heads.fisheye_decoder.FishEyeDecoder",
            scales=(0, 1, 2, 3), height=H, width=W, min_depth=0.1,
            max_depth=30.0, is_log_image=False, overlapped_mask=True,
            depth_decoder_cfg=dict(
                name="fsnet_tpu.models.heads.depth_decoder.MultiChannelDepthDecoder",
                num_output_channels=16, scales=(0, 1, 2, 3),
                min_depth=0.1, max_depth=30.0)),
        train_cfg=dict(frame_ids=(0, 1, -1)),
        test_cfg=dict(),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        batch, {"is_training": True})
    out, _ = model.apply(variables, batch, {"is_training": True},
                         rngs={"loss_noise": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))

    pred = model.apply(variables, batch, {"is_training": False})
    assert pred["depth"].shape == (B, H, W, 1)
    assert pred["norm"].shape == (B, H, W, 1)
