"""meta_data generation tooling (reference ships notebooks,
``/root/reference/meta_data/kitti360_trainsub/read_kitti360.ipynb`` etc.;
ported to ``scripts/generate_meta_data.py``)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import generate_meta_data as gmd  # noqa: E402


def _fake_kitti360(root, sequences, n_frames=6):
    for seq in sequences:
        pose_dir = os.path.join(root, "data_poses", seq)
        img_dir = os.path.join(root, "data_2d_raw", seq, "image_00",
                               "data_rect")
        os.makedirs(pose_dir)
        os.makedirs(img_dir)
        with open(os.path.join(pose_dir, "cam0_to_world.txt"), "w") as f:
            for k in range(0, n_frames * 2, 2):  # keyframes 0, 2, 4, ...
                vals = " ".join("0.0" for _ in range(16))
                f.write(f"{k} {vals}\n")
                open(os.path.join(img_dir, f"{k:010d}.png"), "wb").close()


def test_kitti360_split(tmp_path):
    seqs = [f"2013_05_28_drive_{i:04d}_sync" for i in range(5)]
    _fake_kitti360(str(tmp_path / "kitti360"), seqs)
    out = tmp_path / "out"
    gmd.gen_kitti360(str(tmp_path / "kitti360"), str(out))

    train = (out / "kitti360_train.txt").read_text().strip().splitlines()
    val = (out / "kitti360_val.txt").read_text().strip().splitlines()
    # 5 sequences -> 4 train + 1 val; 6 keyframes -> 4 interior triplets each
    assert len(train) == 4 * 4 and len(val) == 4
    seq, i, key, prev, nxt = train[0].split(",")
    assert seq in seqs
    assert int(nxt) - int(key) == 2 and int(key) - int(prev) == 2

    # deterministic: same seed -> same split membership
    out2 = tmp_path / "out2"
    gmd.gen_kitti360(str(tmp_path / "kitti360"), str(out2))
    assert (out2 / "kitti360_val.txt").read_text() == "\n".join(val) + "\n"


def test_kitti360_skips_missing_images(tmp_path):
    seqs = ["2013_05_28_drive_0000_sync"]
    root = str(tmp_path / "kitti360")
    _fake_kitti360(root, seqs)
    # remove one keyframe image: triplets containing it must drop out
    os.remove(os.path.join(root, "data_2d_raw", seqs[0], "image_00",
                           "data_rect", f"{4:010d}.png"))
    out = tmp_path / "out"
    gmd.gen_kitti360(root, str(out), split_ratio=1.0)
    lines = (out / "kitti360_train.txt").read_text().strip().splitlines()
    assert len(lines) == 1  # only the (8, 6, 10) triplet survives
    _, _, key, prev, nxt = lines[0].split(",")
    assert "4" not in (key, prev, nxt)


def test_fisheye_mask(tmp_path):
    import yaml

    calib = dict(
        image_width=64, image_height=64,
        mirror_parameters=dict(xi=2.3),
        distortion_parameters=dict(k1=0.01, k2=-0.002),
        projection_parameters=dict(
            gamma1=20.0, gamma2=20.0, u0=32.0, v0=32.0),
    )
    calib_path = tmp_path / "image_02.yaml"
    calib_path.write_text("%YAML:1.0\n" + yaml.safe_dump(calib))
    out = tmp_path / "fisheye_mask.png"
    gmd.gen_fisheye_mask(str(calib_path), 64, 64, str(out))

    import cv2

    mask = cv2.imread(str(out), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (64, 64)
    # center of a Mei fisheye is always backtrackable; far corners are not
    assert mask[32, 32] == 255
    assert 0.05 < (mask > 0).mean() < 1.0


def test_nusc_json_schema_roundtrip(tmp_path):
    """A generator-shaped JSON feeds NusceneJsonDataset end-to-end."""
    import cv2

    img_dir = tmp_path / "samples" / "CAM_FRONT"
    img_dir.mkdir(parents=True)
    paths = []
    for i in range(3):
        p = img_dir / f"img{i}.jpg"
        cv2.imwrite(str(p), np.zeros((32, 48, 3), np.uint8))
        paths.append(str(p))

    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.5
    sample = {
        "frame0": paths[0], "frame1": paths[1], "frame-1": paths[2],
        "P2": np.diag([100.0, 100.0, 1.0]).reshape(-1).tolist(),
        "pose01": pose.reshape(-1).tolist(),
        "pose0-1": pose.reshape(-1).tolist(),
        "camera_type_indexes": 0, "camera_type": "CAM_FRONT",
    }
    json_path = tmp_path / "fast.json"
    json_path.write_text(json.dumps(dict(cfg={}, samples=[sample])))

    from fsnet_tpu.data.datasets.nuscene_dataset import NusceneJsonDataset

    ds = NusceneJsonDataset(
        json_path=str(json_path),
        augmentation=dict(name="fsnet_tpu.data.augmentations.EmptyAug"))
    assert len(ds) == 1
    data = ds[0]
    assert data[("image", 0)].shape == (32, 48, 3)
    np.testing.assert_allclose(data[("relative_pose", 1)], pose)
    assert data["P2"].shape == (3, 4)
    assert data["P2"][0, 0] == 100.0


def test_import_eigen(tmp_path, capsys):
    src = tmp_path / "checkout" / "meta_data"
    (src / "eigen").mkdir(parents=True)
    (src / "eigen" / "test_files.txt").write_text(
        "\n".join(f"line{i}" for i in range(697)) + "\n")
    out_root = tmp_path / "meta_out"
    gmd.import_eigen(str(src / ".."), str(out_root))
    # src/../eigen doesn't exist at top level -> falls through to meta_data?
    gmd.import_eigen(str(src), str(out_root))
    installed = out_root / "eigen" / "test_files.txt"
    assert installed.is_file()
    assert len(installed.read_text().strip().splitlines()) == 697
