"""Post-optimization (SLIC + per-segment scale solve) tests."""
import numpy as np

import jax.numpy as jnp

from fsnet_tpu.ops.postopt import (
    depth_image_to_point_cloud_array, post_optimization, rgb2lab, slic_assign,
    select_best_vo_points,
)


def test_rgb2lab_reference_values():
    # white -> L=100, a=b=0; black -> 0,0,0 (CIELAB definition)
    lab = np.asarray(rgb2lab(jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.02)
    # pure red (sRGB) -> approx (53.24, 80.09, 67.20)
    lab_red = np.asarray(rgb2lab(jnp.asarray([[1.0, 0.0, 0.0]])))[0]
    np.testing.assert_allclose(lab_red, [53.24, 80.09, 67.20], atol=0.1)


def test_slic_segments_cover_image():
    rng = np.random.RandomState(0)
    H, W = 32, 48
    img = rng.rand(H, W, 3).astype(np.float32)
    depth = rng.uniform(5, 50, (H, W)).astype(np.float32)
    uvz = np.asarray(depth_image_to_point_cloud_array(depth))
    assignment, centers_uv, centers_z = slic_assign(
        rgb2lab(jnp.asarray(img)), jnp.asarray(uvz), 4, 6)
    a = np.asarray(assignment)
    assert a.shape == (H, W)
    assert a.min() >= 0 and a.max() < 24
    assert len(np.unique(a)) > 10  # most segments used


def test_select_best_vo_points():
    log_pred = jnp.log(jnp.full((10, 10), 10.0))
    vo = np.full((10, 10), 120.0)  # invalid (>80)
    vo[2, 2] = 10.0
    vo[3, 3] = 50.0
    mask = np.asarray(select_best_vo_points(log_pred, jnp.log(jnp.asarray(vo)),
                                            max_points=5))
    assert mask[2, 2] and mask[3, 3]
    assert mask.sum() == 2  # only the two valid points


def test_post_optimization_scales_towards_vo():
    """Prediction off by 2x globally; VO says the truth -> refined depth must
    move towards VO scale."""
    rng = np.random.RandomState(1)
    H, W = 40, 60
    img = rng.rand(H, W, 3).astype(np.float32)
    true_depth = rng.uniform(5, 60, (H, W)).astype(np.float32)
    pred = true_depth * 2.0
    vo = np.full((H, W), 120.0, np.float32)  # mostly invalid
    ys, xs = np.mgrid[0:H:4, 0:W:4]
    vo[ys, xs] = np.clip(true_depth[ys, xs], 3.1, 79.0)

    uvz = np.asarray(depth_image_to_point_cloud_array(pred))
    refined = np.asarray(post_optimization(
        img, uvz, pred, vo, h_seg=4, w_seg=6, iter_num=3,
        lambda0=0.54 / 24, lambda1=1.0, lambda2=0.4, max_points=200))

    err_before = np.abs(np.log(pred) - np.log(true_depth)).mean()
    err_after = np.abs(np.log(refined) - np.log(true_depth)).mean()
    assert err_after < err_before * 0.6
