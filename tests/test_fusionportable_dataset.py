"""On-disk fixture tests for the FusionPortable dataset: OpenCV-yaml calib
(opencv-matrix constructor), TUM odometry parsing, the imu->cam pose chain,
the minimal PCD reader, and static filtering (reference
``monodepth/data/datasets/fusionportable_dataset.py:100-188``)."""
import os

import numpy as np
import pytest
from PIL import Image

from fsnet_tpu.utils.builder import build
from fsnet_tpu.data.datasets.fusionportable_dataset import read_pcd_file

from test_kitti_dataset import CROP_H, CROP_W, H0, W0, _aug_cfg


def _cam_yaml(path):
    P = [100.0, 0.0, 40.0, 0.0, 0.0, 100.0, 20.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    K = [100.0, 0.0, 40.0, 0.0, 100.0, 20.0, 0.0, 0.0, 1.0]
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        f.write("image_height: %d\nimage_width: %d\n" % (H0, W0))
        f.write("distortion_model: plumb_bob\n")
        for name, rows, cols, data in [
                ("camera_matrix", 3, 3, K),
                ("rectification_matrix", 3, 3,
                 [1, 0, 0, 0, 1, 0, 0, 0, 1]),
                ("distortion_coefficients", 1, 5, [0, 0, 0, 0, 0]),
                ("projection_matrix", 3, 4, P)]:
            f.write(f"{name}: !!opencv-matrix\n")
            f.write(f"   rows: {rows}\n   cols: {cols}\n   dt: d\n")
            f.write(f"   data: {list(map(float, data))}\n")
        f.write("quaternion_sensor_bodyimu: !!opencv-matrix\n")
        f.write("   rows: 1\n   cols: 4\n   dt: d\n")
        f.write("   data: [1., 0., 0., 0.]\n")   # qw qx qy qz = identity
        f.write("translation_sensor_bodyimu: !!opencv-matrix\n")
        f.write("   rows: 1\n   cols: 3\n   dt: d\n")
        f.write("   data: [0.1, -0.2, 0.3]\n")


def _ouster_yaml(path):
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        for key4, key3 in [("quaternion_sensor_bodyimu",
                            "translation_sensor_bodyimu"),
                           ("quaternion_sensor_frame_cam00",
                            "translation_sensor_frame_cam00")]:
            f.write(f"{key4}: !!opencv-matrix\n")
            f.write("   rows: 1\n   cols: 4\n   dt: d\n")
            f.write("   data: [1., 0., 0., 0.]\n")
            f.write(f"{key3}: !!opencv-matrix\n")
            f.write("   rows: 1\n   cols: 3\n   dt: d\n")
            f.write("   data: [0., 0., 0.]\n")


@pytest.fixture(scope="module")
def fusionportable_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("fusionportable")
    calib = root / "calib"
    calib.mkdir()
    _cam_yaml(str(calib / "frame_cam00.yaml"))
    _cam_yaml(str(calib / "frame_cam01.yaml"))
    _ouster_yaml(str(calib / "ouster00.yaml"))

    rng = np.random.RandomState(4)
    for cam in ("frame_cam00", "frame_cam01"):
        d = root / cam / "image" / "data"
        d.mkdir(parents=True)
        for i in range(5):
            Image.fromarray(
                rng.randint(0, 255, (H0, W0, 3), dtype=np.uint8)).save(
                    d / ("%06d.png" % i))

    # TUM odometry: 1 m forward per frame; frames 3 == 2 (static pair)
    xs = [0.0, 1.0, 2.0, 3.0, 3.0]
    with (root / "odom.txt").open("w") as f:
        for i, x in enumerate(xs):
            f.write(f"{i}.0 {x} 0 0 0 0 0 1\n")

    split = root / "split.txt"
    split.write_text("1\n2\n3\n")
    return root, split


def test_fusionportable_dataset(fusionportable_tree):
    root, split = fusionportable_tree
    ds = build(
        name=("fsnet_tpu.data.datasets.fusionportable_dataset."
              "FusionportableMonoDataset"),
        base_path=str(root), split_file=str(split), odom_file="odom.txt",
        frame_idxs=[0, 1, -1], use_right_image=False,
        augmentation=_aug_cfg(train=False))
    assert len(ds) == 2  # index 3 dropped (static 3<->4 odom pair)

    data = ds[0]
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    for f in (1, -1):
        T = data[("relative_pose", f)]
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
        assert abs(np.linalg.norm(T[:3, 3]) - 1.0) < 1e-5
    assert abs(data["P2"][0, 0] - 100.0 * CROP_W / W0) < 1e-4


def test_pcd_reader_ascii_and_binary(tmp_path):
    pts = np.array([[1.0, 2.0, 3.0], [-4.0, 5.5, 0.25]], np.float32)
    ascii_p = tmp_path / "a.pcd"
    with ascii_p.open("w") as f:
        f.write("VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n")
        for p in pts:
            f.write(" ".join(str(v) for v in p) + "\n")
    np.testing.assert_allclose(read_pcd_file(str(ascii_p)), pts, atol=1e-6)

    bin_p = tmp_path / "b.pcd"
    with bin_p.open("wb") as f:
        f.write(b"VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                b"COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA binary\n")
        f.write(pts.astype(np.float32).tobytes())
    np.testing.assert_allclose(read_pcd_file(str(bin_p)), pts, atol=1e-6)
