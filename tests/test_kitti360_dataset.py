"""On-disk fixture tests for the KITTI-360 perspective dataset: perspective /
cam-to-pose calib parsing, key-pose relative poses through the inverse
extrinsic chain, and the static + >3 m jump filtering
(reference ``monodepth/data/datasets/kitti360_dataset.py:85-220``)."""
import os

import numpy as np
import pytest
from PIL import Image

from fsnet_tpu.utils.builder import build

from test_kitti_dataset import CROP_H, CROP_W, H0, W0, _aug_cfg

SEQ = "2013_05_28_drive_0000_sync"


@pytest.fixture(scope="module")
def kitti360_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti360")
    calib = root / "calibration"
    calib.mkdir()
    P = " ".join(str(v) for v in
                 [120.0, 0.0, 48.0, 0.0, 0.0, 120.0, 24.0, 0.0,
                  0.0, 0.0, 1.0, 0.0])
    with (calib / "perspective.txt").open("w") as f:
        f.write(f"P_rect_00: {P}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_01: {P}\n")
        f.write("R_rect_01: 1 0 0 0 1 0 0 0 1\n")
    # cam->pose: axis permutation (cam z = baselink x) + small offset
    ext = "0 0 1 0.5 -1 0 0 0.1 0 -1 0 -0.2"
    with (calib / "calib_cam_to_pose.txt").open("w") as f:
        f.write(f"image_00: {ext}\n")
        f.write(f"image_01: {ext}\n")

    # poses.txt: frame id + 3x4 baselink->world; 1 m steps, with a static
    # pair (rows 3==4) and a 5 m jump (row 5) for the two filter arms
    pose_dir = root / "data_poses" / SEQ
    pose_dir.mkdir(parents=True)
    xs = [0.0, 1.0, 2.0, 3.0, 3.0, 9.0, 10.0]
    with (pose_dir / "poses.txt").open("w") as f:
        for i, x in enumerate(xs):
            f.write(f"{i} 1 0 0 {x} 0 1 0 0 0 0 1 0\n")

    rng = np.random.RandomState(1)
    for cam in ("image_00", "image_01"):
        d = root / "data_2d_raw" / SEQ / cam / "data_rect"
        d.mkdir(parents=True)
        for i in range(7):
            Image.fromarray(
                rng.randint(0, 255, (H0, W0, 3), dtype=np.uint8)).save(
                    d / ("%010d.png" % i))

    # meta lines: seq,pose_idx,img_idx,former,latter
    meta = root / "meta.txt"
    meta.write_text(
        f"{SEQ},1,1,0,2\n"    # valid: +-1 m neighbours
        f"{SEQ},3,3,2,4\n"    # static: pose 3 == pose 4
        f"{SEQ},5,5,4,6\n"    # jump: pose 4 -> 5 is 6 m
    )
    return root, meta


def test_kitti360_filter_and_sample(kitti360_tree):
    root, meta = kitti360_tree
    ds = build(
        name="fsnet_tpu.data.datasets.kitti360_dataset.KITTI360MonoDataset",
        raw_path=str(root), split_file=str(meta), frame_ids=[0, 1, -1],
        use_right_image=False, augmentation=_aug_cfg(train=False))
    assert len(ds) == 1  # static and jump samples dropped

    data = ds[0]
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    for f in (1, -1):
        T = data[("relative_pose", f)]
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
        # 1 m baselink-x translation maps to the cam frame, norm preserved
        assert abs(np.linalg.norm(T[:3, 3]) - 1.0) < 1e-5
        # cam->pose permutation sends baselink x to cam z
        assert abs(abs(T[2, 3]) - 1.0) < 1e-5
    # P2 keeps intrinsics only (no baseline column)
    assert data["original_P2"][0, 3] == 0.0


def test_kitti360_unfiltered(kitti360_tree):
    root, meta = kitti360_tree
    ds = build(
        name="fsnet_tpu.data.datasets.kitti360_dataset.KITTI360MonoDataset",
        raw_path=str(root), split_file=str(meta), frame_ids=[0, 1, -1],
        is_filter_static=False, use_right_image=False,
        augmentation=_aug_cfg(train=False))
    assert len(ds) == 3
    data = ds[2]
    assert np.isfinite(data[("relative_pose", 1)]).all()


@pytest.fixture(scope="module")
def fisheye_tree(kitti360_tree):
    """Extend the KITTI-360 tree with fisheye rgb images + Mei yaml calib."""
    root, meta = kitti360_tree
    calib = root / "calibration"
    for cam in ("image_02", "image_03"):
        with (calib / f"{cam}.yaml").open("w") as f:
            f.write("%YAML:1.0\n")  # non-yaml first line, skipped by reader
            f.write("image_width: %d\n" % W0)
            f.write("image_height: %d\n" % H0)
            f.write("mirror_parameters:\n   xi: 1.0\n")
            f.write("distortion_parameters:\n   k1: 0.0\n   k2: 0.0\n")
            f.write("projection_parameters:\n")
            f.write("   gamma1: %f\n   gamma2: %f\n" % (W0 / 2, W0 / 2))
            f.write("   u0: %f\n   v0: %f\n" % (W0 / 2, H0 / 2))
    rng = np.random.RandomState(2)
    for cam in ("image_02", "image_03"):
        d = root / "data_2d_raw" / SEQ / cam / "data_rgb"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(7):
            Image.fromarray(
                rng.randint(0, 255, (H0, W0, 3), dtype=np.uint8)).save(
                    d / ("%010d.png" % i))
    return root, meta


def test_fisheye_dataset_sample(fisheye_tree):
    root, meta = fisheye_tree
    ds = build(
        name="fsnet_tpu.data.datasets.fisheye_dataset.KITTI360FisheyeDataset",
        raw_path=str(root), split_file=str(meta), frame_ids=[0, 1, -1],
        use_right_image=False, augmentation=_aug_cfg(train=False))
    assert len(ds) == 1

    data = ds[0]
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    # Mei P from gamma/u0/v0, rescaled by the Resize P rewrite
    assert abs(data["P2"][0, 0] - (W0 / 2) * CROP_W / W0) < 1e-4
    assert data["calib_meta"]["mirror_parameters"]["xi"] == 1.0
    np.testing.assert_allclose(
        data["fisheye_params"], np.array([1.0, 0.0, 0.0]), atol=1e-6)
    # post-transform ray map matches the final crop; rays normalized where
    # valid, with some valid pixels near the center
    rays = data["fisheye_rays"]
    assert rays.shape == (CROP_H, CROP_W, 4)
    valid = rays[..., 3] > 0.5
    assert valid.any()
    norms = np.linalg.norm(rays[..., :3], axis=-1)[valid]
    # all but boundary pixels are unit rays (the backtracking solve can sit
    # on the valid-region rim for a single pixel of the mask)
    assert (np.abs(norms - 1.0) < 1e-3).mean() > 0.99


def test_concat_real_datasets_through_loader(kitti360_tree, tmp_path_factory):
    """ConcatDataset over the real KITTI-360 fixture dataset (both filter
    modes -> different lengths) driven through the threaded dataloader +
    shared-key collate: the full host feed path on real dataset classes."""
    from fsnet_tpu.data.dataloader import build_dataloader
    from fsnet_tpu.data.datasets.dataset_utils import ConcatDataset

    root, meta = kitti360_tree
    common = dict(raw_path=str(root), split_file=str(meta),
                  frame_ids=[0, 1, -1], use_right_image=False,
                  augmentation=_aug_cfg(train=False))
    ds = ConcatDataset(
        cfg_list=[
            dict(name=("fsnet_tpu.data.datasets.kitti360_dataset."
                       "KITTI360MonoDataset")),
            dict(name=("fsnet_tpu.data.datasets.kitti360_dataset."
                       "KITTI360MonoDataset"), is_filter_static=False),
        ],
        **common)
    assert len(ds) == 4  # 1 filtered + 3 unfiltered

    loader = build_dataloader(ds, num_workers=0, batch_size=2)
    batch = next(iter(loader))
    # batches carry the pytree-stable encoded keys ('image', 0) -> 'image/0'
    assert batch["image/0"].shape == (2, CROP_H, CROP_W, 3)
    assert batch["relative_pose/1"].shape == (2, 4, 4)
    assert np.isfinite(np.asarray(batch["relative_pose/1"])).all()
