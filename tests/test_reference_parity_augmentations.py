"""Oracle parity for the DETERMINISTIC augmentation transforms against the
reference's own ``vision_base/data/augmentations/augmentations.py`` —
the camera-matrix (P) rewrite rules and effective-size bookkeeping ARE the
compatibility spec for every downstream consumer (eval unpadding, fx-aware
depth scaling). RandomMirror runs at mirror_prob=1.0 so its branch is
deterministic (image flip + P rewrite + SE(3) pose flip).

The reference module needs two shims: ``np.int`` (removed in numpy 2) and
the easydict stub shared with the loss-parity suite.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "vision_base")),
    reason="reference checkout not present")

from test_reference_parity import _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def ref_aug():
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if not hasattr(np, "int"):
        np.int = int  # the reference predates numpy 2.0
    import vision_base.data.augmentations.augmentations as A
    yield A
    if np.int is int:
        del np.int


def _case():
    rng = np.random.RandomState(3)
    img = rng.rand(75, 242, 3).astype(np.float32) * 255
    P = np.array([[721.5, 0.0, 120.0, 44.8],
                  [0.0, 721.5, 38.0, 0.2],
                  [0.0, 0.0, 1.0, 0.005]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    from scipy.spatial.transform import Rotation
    pose[:3, :3] = Rotation.from_euler("xyz", [2.0, -3.0, 1.0],
                                       degrees=True).as_matrix()
    pose[:3, 3] = [0.3, -0.1, 0.8]
    return img, P, pose


def _data(img, P, pose):
    return {("image", 0): img.copy(), "P2": P.copy(),
            ("relative_pose", 1): pose.copy()}


KEYS = dict(image_keys=[("image", 0)], calib_keys=["P2"])


@pytest.mark.parametrize("size,aspect,pad", [
    ((192, 640), True, True),    # KITTI recipe: aspect + pad
    ((192, 640), True, False),   # aspect + crop
    ((100, 300), False, True),   # plain stretch
])
def test_resize_matches_reference(ref_aug, size, aspect, pad):
    import fsnet_tpu.data.augmentations as M

    img, P, pose = _case()
    ref = ref_aug.Resize(size=size, preserve_aspect_ratio=aspect,
                         force_pad=pad, **KEYS)(_data(img, P, pose))
    ours = M.Resize(size=size, preserve_aspect_ratio=aspect,
                    force_pad=pad, **KEYS)(_data(img, P, pose))
    np.testing.assert_allclose(ours[("image", 0)], ref[("image", 0)],
                               atol=1e-4)
    np.testing.assert_allclose(ours["P2"], ref["P2"], atol=1e-5)
    np.testing.assert_array_equal(
        ours[("image_resize", "effective_size")],
        ref[("image_resize", "effective_size")])
    np.testing.assert_array_equal(
        ours[("image_resize", "original_shape")],
        ref[("image_resize", "original_shape")])


def test_crop_top_matches_reference(ref_aug):
    import fsnet_tpu.data.augmentations as M

    img, P, pose = _case()
    for kw in (dict(crop_top_index=11), dict(output_height=50)):
        ref = ref_aug.CropTop(**kw, **KEYS)(_data(img, P, pose))
        ours = M.CropTop(**kw, **KEYS)(_data(img, P, pose))
        np.testing.assert_array_equal(ours[("image", 0)], ref[("image", 0)])
        np.testing.assert_allclose(ours["P2"], ref["P2"], atol=1e-6)


def test_pad2shape_matches_reference(ref_aug):
    import fsnet_tpu.data.augmentations as M

    img, P, pose = _case()
    ref = ref_aug.Pad2Shape(target_shape=(96, 256), **KEYS)(
        _data(img, P, pose))
    ours = M.Pad2Shape(target_shape=(96, 256), **KEYS)(_data(img, P, pose))
    np.testing.assert_array_equal(ours[("image", 0)], ref[("image", 0)])


def test_normalize_matches_reference(ref_aug):
    import fsnet_tpu.data.augmentations as M

    img, P, pose = _case()
    mean = [0.485, 0.456, 0.406]
    stds = [0.229, 0.224, 0.225]
    ref = ref_aug.Normalize(mean=np.array(mean), stds=np.array(stds),
                            image_keys=[("image", 0)])(_data(img, P, pose))
    ours = M.Normalize(mean=mean, stds=stds, image_keys=[("image", 0)])(
        _data(img, P, pose))
    np.testing.assert_allclose(ours[("image", 0)], ref[("image", 0)],
                               atol=1e-4)


def test_random_mirror_p1_matches_reference(ref_aug):
    """mirror_prob=1 makes the branch deterministic: image flip + P rewrite
    (cx' = W - cx - 1, tx' = -tx) + SE(3) relative-pose axis flip."""
    import fsnet_tpu.data.augmentations as M

    img, P, pose = _case()
    kw = dict(mirror_prob=1.0, pose_axis_pairs=[(("relative_pose", 1), 0)],
              is_switch_left_right=False, **KEYS)
    ref = ref_aug.RandomMirror(**kw)(_data(img, P, pose))
    ours = M.RandomMirror(**kw)(_data(img, P, pose))
    np.testing.assert_array_equal(ours[("image", 0)], ref[("image", 0)])
    np.testing.assert_allclose(ours["P2"], ref["P2"], atol=1e-6)
    np.testing.assert_allclose(ours[("relative_pose", 1)],
                               ref[("relative_pose", 1)], atol=1e-6)
