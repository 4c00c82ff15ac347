"""Dataset file-format readers (host-side).

Reference: ``monodepth/data/datasets/utils.py`` (image/depth/vo-depth/pose.mat
readers + relative-pose algebra) and the calib parsers at the top of
``monodepth/data/datasets/mono_dataset.py:18-106``.
"""
from __future__ import annotations

import os
from typing import Dict, List

import cv2
import numpy as np
from PIL import Image
from scipy.spatial.transform import Rotation
import scipy.io as sio


def read_pc_from_bin(bin_path: str) -> np.ndarray:
    """KITTI velodyne .bin -> [N, 4] (x, y, z, reflectance)."""
    return np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)


def read_image(path: str) -> np.ndarray:
    """RGB image as [H, W, 3] uint8 (reference ``utils.py:22-30``)."""
    return np.array(Image.open(path, "r"))


def read_depth(path: str) -> np.ndarray:
    """uint16 PNG / 256 -> metres (reference ``utils.py:32-40``)."""
    return np.array(cv2.imread(path, -1) / 256.0, dtype=np.float32)


def read_vo_depth(image_path: str) -> np.ndarray:
    """VO sparse depth: uint16/65535*120 m, invalid (<3 m or >80 m) -> 120
    (reference ``utils.py:13-20``)."""
    depth = cv2.imread(image_path, -1) / 65535.0 * 120.0
    depth[depth < 3] = 120.0
    depth[depth > 80] = 120.0
    return depth.astype(np.float32)


def read_pose_mat(path: str) -> np.ndarray:
    """Matlab-devkit pose file -> [N, 4, 4] (reference ``utils.py:42-50``)."""
    return sio.loadmat(path)["pose_mat"]


def cam_relative_pose(T_imu2world_0, T_imu2world_1, T_imu2vel, T_vel2cam):
    """cam0_T_cam1 through the imu->velo->cam chain (reference ``utils.py:53-54``)."""
    return (T_vel2cam @ T_imu2vel @ np.linalg.inv(T_imu2world_1)
            @ T_imu2world_0 @ np.linalg.inv(T_imu2vel) @ np.linalg.inv(T_vel2cam))


def cam_relative_pose_nusc(T_imu2world_0, T_imu2world_1, T_imu2cam):
    """NuScenes ego-chain variant (reference ``utils.py:56-57``)."""
    return (T_imu2cam @ np.linalg.inv(T_imu2world_1) @ T_imu2world_0
            @ np.linalg.inv(T_imu2cam))


def get_transformation_matrix(translation, rotation) -> np.ndarray:
    """translation [x,y,z] + quaternion [w,x,y,z] -> 4x4 (ref ``utils.py:59-66``)."""
    rot = Rotation.from_quat([rotation[1], rotation[2], rotation[3], rotation[0]])
    T = np.eye(4)
    T[0:3, 0:3] = rot.as_matrix()
    T[0:3, 3] = translation
    return T


# ------------------------------------------------- KITTI raw calib/split files

def read_P23_from_sequence(file: str):
    """P_rect_02/P_rect_03 from calib_cam_to_cam.txt (reference
    ``mono_dataset.py:25-41``)."""
    P2 = P3 = None
    with open(file, "r") as f:
        for line in f.readlines():
            if line.startswith("P_rect_02"):
                P2 = np.array([float(x) for x in line.split(" ")[1:13]]).reshape(3, 4)
            if line.startswith("P_rect_03"):
                P3 = np.array([float(x) for x in line.split(" ")[1:13]]).reshape(3, 4)
    assert P2 is not None, f"can not find P2 in file {file}"
    assert P3 is not None, f"can not find P3 in file {file}"
    return P2, P3


def read_imu2velo(file: str) -> np.ndarray:
    """calib_imu_to_velo.txt -> 4x4 (reference ``mono_dataset.py:44-61``)."""
    T = np.eye(4)
    R = t = None
    with open(file, "r") as f:
        for line in f.readlines():
            if line.startswith("R"):
                R = np.array([float(x) for x in line.split(" ")[1:10]]).reshape(3, 3)
            if line.startswith("T"):
                t = np.array([float(x) for x in line.split(" ")[1:4]]).reshape(3, 1)
    assert R is not None and t is not None, file
    T[0:3, 0:3] = R
    T[0:3, 3:4] = t
    return T


def read_T_from_sequence(file: str) -> np.ndarray:
    """calib_velo_to_cam.txt -> 4x4 (reference ``mono_dataset.py:64-85``)."""
    R = T = None
    with open(file, "r") as f:
        for line in f.readlines():
            if line.startswith("R:"):
                R = np.array([float(x) for x in line.split(" ")[1:10]]).reshape(3, 3)
            if line.startswith("T:"):
                T = np.array([float(x) for x in line.split(" ")[1:4]]).reshape(3, 1)
    assert R is not None and T is not None, file
    T_velo2cam = np.eye(4)
    T_velo2cam[0:3, 0:3] = R
    T_velo2cam[0:3, 3:4] = T
    return T_velo2cam


def read_split_file(file: str) -> List[Dict]:
    """eigen-style split lines 'folder index side' (reference
    ``mono_dataset.py:88-106``)."""
    imdb = []
    with open(file, "r") as f:
        for raw in f.readlines():
            line = raw.strip().split()
            if not line:
                continue
            folder, index, side = line[0], int(line[1]), line[2]
            imdb.append(dict(folder=folder, index=index, side=side,
                             datetime=folder.split("/")[0]))
    return imdb
