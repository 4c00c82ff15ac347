"""On-disk fixture tests for the real KITTI raw dataset classes: calib
parsing, the imu->velo->cam pose chain, static filtering, and the full
__getitem__ -> augmentation -> sample-dict contract
(reference ``monodepth/data/datasets/mono_dataset.py:108-345``)."""
import os

import numpy as np
import pytest
import scipy.io as sio
from PIL import Image

import fsnet_tpu.utils.config  # noqa: F401 - installs the easydict shim
from easydict import EasyDict as edict  # noqa: E402

from fsnet_tpu.utils.builder import build

H0, W0 = 272, 320        # raw size: > 2x RandomWarpAffine shift_border=128
CROP_H, CROP_W = 32, 64  # augmentation output

DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"


def _write_calib(date_dir):
    P2 = " ".join(str(v) for v in
                  [100.0, 0.0, 40.0, 0.0, 0.0, 100.0, 20.0, 0.0,
                   0.0, 0.0, 1.0, 0.0])
    P3 = " ".join(str(v) for v in
                  [100.0, 0.0, 40.0, -38.6, 0.0, 100.0, 20.0, 0.0,
                   0.0, 0.0, 1.0, 0.0])
    with open(os.path.join(date_dir, "calib_cam_to_cam.txt"), "w") as f:
        f.write("calib_time: 01-Jan-2020 00:00:00\n")
        f.write(f"P_rect_02: {P2}\n")
        f.write(f"P_rect_03: {P3}\n")
    # velo->cam: KITTI-style axis permutation (cam z = velo x)
    with open(os.path.join(date_dir, "calib_velo_to_cam.txt"), "w") as f:
        f.write("calib_time: 01-Jan-2020 00:00:00\n")
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0.01 -0.05 -0.29\n")
    with open(os.path.join(date_dir, "calib_imu_to_velo.txt"), "w") as f:
        f.write("calib_time: 01-Jan-2020 00:00:00\n")
        f.write("R: 1 0 0 0 1 0 0 0 1\n")
        f.write("T: -0.8 0.3 0.8\n")


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw")
    date_dir = root / "2011_09_26"
    drive_dir = root / DRIVE
    rng = np.random.RandomState(0)
    for cam in ("image_02", "image_03"):
        d = drive_dir / cam / "data"
        d.mkdir(parents=True)
        for i in range(5):
            Image.fromarray(
                rng.randint(0, 255, (H0, W0, 3), dtype=np.uint8)).save(
                    d / ("%010d.png" % i))
    # imu->world poses: 1 m forward per frame, except frame 3 == frame 2
    # (a static pair the filter must drop)
    poses = np.stack([np.eye(4) for _ in range(5)])
    for i in range(5):
        poses[i, 0, 3] = float(i)
    poses[3] = poses[2]
    oxts = drive_dir / "oxts"
    oxts.mkdir(parents=True)
    sio.savemat(str(oxts / "pose.mat"), {"pose_mat": poses})
    _write_calib(str(date_dir))

    split = root / "split.txt"
    split.write_text(f"{DRIVE} 1 l\n{DRIVE} 2 r\n{DRIVE} 3 l\n")
    return root, split


def _aug_cfg(train):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "configs_common_for_test",
        os.path.join(os.path.dirname(__file__), "..", "configs", "common.py"))
    common = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = common
    spec.loader.exec_module(common)
    return common.wpose_augmentation(
        edict(rgb_shape=(CROP_H, CROP_W, 3)), [0, 1, -1], train=train)


def test_train_dataset_end_to_end(kitti_tree):
    root, split = kitti_tree
    ds = build(
        name="fsnet_tpu.data.datasets.mono_dataset.KittiDepthMonoDataset",
        raw_path=str(root), split_file=str(split), frame_idxs=[0, 1, -1],
        augmentation=_aug_cfg(train=False))

    # static filtering: indexes 2 and 3 touch the static 2<->3 pair
    assert len(ds) == 1

    data = ds[0]
    # the val graph (configs/common.py) processes frame 0 only
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    assert data[("original_image", 1)].shape == (H0, W0, 3)
    assert data["P2"].shape == (3, 4)
    # Resize (preserve_aspect_ratio=False) rescaled fx by the W ratio
    assert abs(data["P2"][0, 0] - 100.0 * CROP_W / W0) < 1e-4

    # pose chain: +-1 m forward translation, rotation-free, through the
    # (rotating) velo/cam extrinsics — norm is preserved
    for f in (1, -1):
        T = data[("relative_pose", f)]
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
        assert abs(np.linalg.norm(T[:3, 3]) - 1.0) < 1e-5
    # left camera, forward imu motion -> cam z translation (axis permuted)
    assert abs(abs(data[("relative_pose", 1)][2, 3]) - 1.0) < 1e-5


def test_train_dataset_unfiltered_and_sides(kitti_tree):
    root, split = kitti_tree
    ds = build(
        name="fsnet_tpu.data.datasets.mono_dataset.KittiDepthMonoDataset",
        raw_path=str(root), split_file=str(split), frame_idxs=[0, 1, -1],
        is_filter_static=False, augmentation=_aug_cfg(train=False))
    assert len(ds) == 3
    # right-camera sample uses P3 (fx equal, baseline in P[0, 3])
    sample_r = ds[1]
    assert sample_r["P2"][0, 3] != 0.0


def test_eigen_test_dataset(kitti_tree):
    root, split = kitti_tree
    ds = build(
        name=("fsnet_tpu.data.datasets.mono_dataset."
              "KittiDepthMonoEigenTestDataset"),
        raw_path=str(root), split_file=str(split),
        augmentation=_aug_cfg(train=False))
    assert len(ds) == 3
    data = ds[0]
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    assert ("image", -1) in data
    T = data[("relative_pose", -1)]
    assert abs(np.linalg.norm(T[:3, 3]) - 1.0) < 1e-5
    # effective-size bookkeeping for the eval unpad path
    assert ("image_resize", "effective_size") in data


def test_train_augmentation_graph_runs(kitti_tree):
    root, split = kitti_tree
    ds = build(
        name="fsnet_tpu.data.datasets.mono_dataset.KittiDepthMonoDataset",
        raw_path=str(root), split_file=str(split), frame_idxs=[0, 1, -1],
        is_filter_static=False, augmentation=_aug_cfg(train=True))
    data = ds[2]
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    assert np.isfinite(data[("relative_pose", 1)]).all()
