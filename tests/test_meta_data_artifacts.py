"""Shipped meta_data artifacts (fixed research split tables + fisheye mask).

The reference ships these directly (``/root/reference/meta_data/
eigen_zhou/train_files.txt`` etc.); they are constant data artifacts
(Eigen NIPS'14 test list, Zhou CVPR'17 filtered train list, KITTI-360 /
NuScenes sub-splits) required for every shipped config to train from a
fresh clone + dataset root. This suite pins their presence and format.
"""
import os

import numpy as np

META = os.path.join(os.path.dirname(__file__), "..", "meta_data")


def _lines(*parts):
    with open(os.path.join(META, *parts)) as f:
        return f.read().strip().splitlines()


def test_eigen_test_split():
    lines = _lines("eigen", "test_files.txt")
    assert len(lines) == 697
    # `folder file_index side` rows (kitti raw relative path in folder)
    folder, idx, side = lines[0].split()
    assert "drive" in folder and idx.isdigit() and side in ("l", "r")


def test_eigen_zhou_train_val_splits():
    train = _lines("eigen_zhou", "train_files.txt")
    val = _lines("eigen_zhou", "val_files.txt")
    assert len(train) == 39810
    assert len(val) == 4424
    for row in (train[0], train[-1], val[0]):
        folder, idx, side = row.split()
        assert "drive" in folder and idx.isdigit() and side in ("l", "r")
    # static-scene filtering happens at dataset build; splits are disjoint
    assert not (set(train[:200]) & set(val[:200]))


def test_kitti360_splits():
    train = _lines("kitti360_trainsub", "kitti360_train.txt")
    val = _lines("kitti360_trainsub", "kitti360_val.txt")
    assert len(train) == 51392
    assert len(val) == 986
    # `sequence,pose_idx,img_idx,former,latter` rows
    seq, pose_idx, img_idx, former, latter = train[0].split(",")
    assert seq.startswith("2013_05_28_drive_")
    assert int(former) < int(img_idx) < int(latter)


def test_nusc_splits():
    train = _lines("nusc_trainsub", "nusc_train.txt")
    val = _lines("nusc_trainsub", "nusc_val.txt")
    assert len(train) == 18703
    assert len(val) == 4227
    # rows are `token,prev_token,next_token` triples of 32-hex tokens
    toks = train[0].split(",")
    assert len(toks) == 3
    assert all(len(t) == 32 and int(t, 16) >= 0 for t in toks)


def test_fisheye_mask_loads():
    import cv2

    path = os.path.join(META, "kitti360_trainsub", "fisheye_mask.png")
    mask = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert mask is not None
    h, w = mask.shape
    assert (h, w) == (700, 700)
    vals = np.unique(mask)
    assert set(vals.tolist()) <= {0, 1, 255}
    # fisheye validity: center valid, some corners invalid
    assert mask[h // 2, w // 2] > 0
    assert 0.05 < (mask > 0).mean() < 1.0
