"""NuScenes surround-view depth evaluator.

Reference: ``monodepth/evaluation/nuscenes_unsupervised_eval.py`` —
``NuscenesEvaluator:147``: per-camera GT depth PNGs precomputed from LiDAR
sweeps (``_precompute:168-201``, ``get_lidar_data:17-70``), NuScenes crop
``[0.0359H, 0.9919H] x [0.0359W, 0.9645W]`` (``:223-227``), per-channel +
all-mean error logging (``log:203-216``, ``__call__:257-320``).

Devkit-dependent pieces (LiDAR sweep aggregation) import lazily so the
evaluator is usable without nuscenes-devkit once GT PNGs exist.
"""
from __future__ import annotations

import os
from functools import reduce

import cv2
import numpy as np

from ..data.datasets.io_utils import read_depth
from ..ops.metrics import compute_errors
from .kitti_unsupervised_eval import KittiEigenEvaluator

DEFAULT_CAMERAS = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_BACK_RIGHT",
                   "CAM_BACK", "CAM_BACK_LEFT", "CAM_FRONT_LEFT")


def pad_or_trim_to_np(x, shape, pad_val=0):
    """Reference ``:72-77``."""
    shape = np.asarray(shape)
    pad = shape - np.minimum(np.shape(x), shape)
    zeros = np.zeros_like(pad)
    x = np.pad(x, np.stack([zeros, pad], axis=1), constant_values=pad_val)
    return x[: shape[0], : shape[1]]


def generate_depth_map(velo, extrinsics, intrinsics, cam=2,
                       im_shape=(900, 1600)):
    """LiDAR (ego frame) -> camera depth map (reference ``:85-127``);
    duplicate resolution vectorized (min depth wins)."""
    N = velo.shape[0]
    homo_velo = np.ones([N, 4])
    homo_velo[:, 0:3] = velo[:, 0:3]
    homo_intrinsics = np.eye(4)
    homo_intrinsics[0:3, 0:3] = intrinsics
    projection = homo_intrinsics @ np.linalg.inv(extrinsics)

    pts = (projection @ homo_velo.T).T
    pts = pts[pts[:, 2] > 0]
    pts[:, :2] = pts[:, :2] / pts[:, 2][..., np.newaxis]

    us = np.round(pts[:, 0]) - 1
    vs = np.round(pts[:, 1]) - 1
    valid = (us >= 0) & (vs >= 0) & (us < im_shape[1]) & (vs < im_shape[0])
    us = us[valid].astype(np.int32)
    vs = vs[valid].astype(np.int32)
    ds = pts[valid, 2]

    depth = np.zeros(tuple(im_shape[:2]))
    order = np.argsort(-ds)
    depth[vs[order], us[order]] = ds[order]
    depth[depth < 0] = 0
    return depth


def get_lidar_data(nusc, sample_rec, nsweeps, min_distance):
    """Aggregate LiDAR sweeps in the ego frame (reference ``:17-70``)."""
    from nuscenes.utils.data_classes import LidarPointCloud
    from nuscenes.utils.geometry_utils import transform_matrix
    from pyquaternion import Quaternion

    points = np.zeros((5, 0))
    ref_sd_token = sample_rec["data"]["LIDAR_TOP"]
    ref_sd_rec = nusc.get("sample_data", ref_sd_token)
    ref_pose_rec = nusc.get("ego_pose", ref_sd_rec["ego_pose_token"])
    ref_time = 1e-6 * ref_sd_rec["timestamp"]

    car_from_global = transform_matrix(
        ref_pose_rec["translation"], Quaternion(ref_pose_rec["rotation"]),
        inverse=True)

    current_sd_rec = nusc.get("sample_data", sample_rec["data"]["LIDAR_TOP"])
    for _ in range(nsweeps):
        current_pc = LidarPointCloud.from_file(
            os.path.join(nusc.dataroot, current_sd_rec["filename"]))
        current_pc.remove_close(min_distance)

        current_pose_rec = nusc.get("ego_pose",
                                    current_sd_rec["ego_pose_token"])
        global_from_car = transform_matrix(
            current_pose_rec["translation"],
            Quaternion(current_pose_rec["rotation"]), inverse=False)
        current_cs_rec = nusc.get("calibrated_sensor",
                                  current_sd_rec["calibrated_sensor_token"])
        car_from_current = transform_matrix(
            current_cs_rec["translation"],
            Quaternion(current_cs_rec["rotation"]), inverse=False)

        trans_matrix = reduce(np.dot, [car_from_global, global_from_car,
                                       car_from_current])
        current_pc.transform(trans_matrix)

        time_lag = ref_time - 1e-6 * current_sd_rec["timestamp"]
        times = time_lag * np.ones((1, current_pc.nbr_points()))
        points = np.concatenate(
            (points, np.concatenate((current_pc.points, times), 0)), 1)

        if current_sd_rec["prev"] == "":
            break
        current_sd_rec = nusc.get("sample_data", current_sd_rec["prev"])
    return points


def get_lidar(nusc, rec):
    """Reference ``:136-144``."""
    lidar_data = get_lidar_data(nusc, rec, nsweeps=1, min_distance=2.2)
    lidar_data = lidar_data.transpose(1, 0)
    num_points = lidar_data.shape[0]
    lidar_data = pad_or_trim_to_np(lidar_data, [81920, 5]).astype("float32")
    lidar_mask = np.ones(81920).astype("float32")
    lidar_mask[num_points:] *= 0.0
    return lidar_data, lidar_mask


class NuscenesEvaluator(KittiEigenEvaluator):
    """Reference ``NuscenesEvaluator:147-320``."""

    def __init__(self, data_path, split_file, gt_saved_dir,
                 nuscenes_version="v1.0-trainval",
                 is_evaluate_absolute=False, is_force_recompute=False,
                 channels=DEFAULT_CAMERAS):
        self.is_evaluate_absolute = is_evaluate_absolute
        self.split_file = split_file
        with open(split_file, "r") as f:
            self.token_list = [line.strip().split(",")[0]
                               for line in f.readlines()]
        if (not os.path.isdir(gt_saved_dir)) or is_force_recompute:
            print(f"Exporting NuScenes GT depths to {gt_saved_dir}")
            self._precompute(data_path, gt_saved_dir, nuscenes_version)
        self.channels = list(channels)
        self.gt_saved_dir = gt_saved_dir

    def _precompute(self, data_path, gt_saved_dir, nuscenes_version):
        from pyquaternion import Quaternion
        from ..data.datasets.nuscenes_utils import NuScenes

        nusc = NuScenes(version=nuscenes_version, dataroot=data_path,
                        verbose=True)
        for cam in DEFAULT_CAMERAS:
            os.makedirs(os.path.join(gt_saved_dir, cam), exist_ok=True)

        for token in self.token_list:
            rec = nusc.get("sample", token)
            lidar_data, lidar_mask = get_lidar(nusc, rec)
            lidar = lidar_data[lidar_mask == 1, :]
            for cam in DEFAULT_CAMERAS:
                samp = nusc.get("sample_data", rec["data"][cam])
                im_shape = [samp["height"], samp["width"]]
                depth_name = samp["filename"].replace(
                    "samples", gt_saved_dir).replace(".jpg", ".png")

                sens = nusc.get("calibrated_sensor",
                                samp["calibrated_sensor_token"])
                T = np.eye(4)
                T[0:3, 0:3] = Quaternion(sens["rotation"]).rotation_matrix
                T[0:3, 3] = np.array(sens["translation"])
                intrins = np.array(sens["camera_intrinsic"])

                depth = generate_depth_map(lidar, T, intrins,
                                           im_shape=im_shape)
                cv2.imwrite(depth_name, (depth * 256).astype(np.uint16))

    def log(self, writer, channel, mean_errors, mean_abs_errors,
            global_step=0, epoch_num=0, is_print=True):
        log_str = f"Epoch {epoch_num} for channel {channel}"
        log_str += "\n  " + ("{:>8} | " * 7).format(
            "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
        log_str += "\n" + ("&{: 8.3f}  " * 7).format(*list(mean_errors)) + "\\\\"
        log_str += (f"\nEpoch {epoch_num} for channel {channel} "
                    "| Abs Error without Scaled")
        log_str += "\n  " + ("{:>8} | " * 7).format(
            "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
        log_str += "\n" + ("&{: 8.3f}  " * 7).format(
            *list(mean_abs_errors)) + "\\\\"
        if writer is not None:
            writer.add_text(f"Evaluation logs/{channel}",
                            log_str.replace(" ", "&nbsp;").replace("\n", "  \n"),
                            global_step=epoch_num)
        if is_print:
            print(log_str)

    def _single_loss(self, depth_0, gt_depth):
        """NuScenes crop variant (reference ``:219-255``)."""
        gt_height, gt_width = gt_depth.shape[:2]
        pred_depth = cv2.resize(depth_0, (gt_width, gt_height))
        mask = np.logical_and(gt_depth > 1e-3, gt_depth < 80.0)

        crop = np.array([0.03594771 * gt_height, 0.99189189 * gt_height,
                         0.03594771 * gt_width, 0.96405229 * gt_width]
                        ).astype(np.int32)
        crop_mask = np.zeros(mask.shape)
        crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
        mask = np.logical_and(mask, crop_mask)

        pred_depth = pred_depth[mask]
        gt = gt_depth[mask]
        if len(pred_depth) == 0 or len(gt) == 0:
            raise ValueError("empty nuscenes eval mask")

        ratio = np.median(gt) / np.median(pred_depth)
        scaled = np.clip(pred_depth * ratio, 1e-3, 80.0)
        error = compute_errors(gt, scaled)
        pred_clamped = np.clip(pred_depth, 1e-3, 80.0)
        abs_error = compute_errors(gt, pred_clamped)
        return dict(ratio=ratio, error=error, abs_error=abs_error)

    def single_call(self, depth_0, filename):
        gt_depth = read_depth(filename.replace(
            "samples", self.gt_saved_dir).replace(".jpg", ".png"))
        return self._single_loss(depth_0, gt_depth)

    def __call__(self, result_path, writer=None, global_step=0, epoch_num=0):
        all_mean, all_mean_abs = [], []
        for cam in self.channels:
            errors, abs_errors = [], []
            predict_dir = os.path.join(result_path, "predict_depth", cam)
            gt_dir = os.path.join(self.gt_saved_dir, cam)
            for image_file in sorted(os.listdir(predict_dir)):
                gt_depth = read_depth(os.path.join(gt_dir, image_file))
                pred = read_depth(os.path.join(predict_dir, image_file))
                try:
                    result = self._single_loss(pred, gt_depth)
                except ValueError:
                    import warnings
                    warnings.warn(f"{image_file} from {cam}: no usable points")
                    continue
                errors.append(result["error"])
                abs_errors.append(result["abs_error"])

            mean_errors = np.array(errors).mean(0)
            mean_abs = np.array(abs_errors).mean(0)
            self.log(writer, cam, mean_errors, mean_abs,
                     global_step=global_step, epoch_num=epoch_num)
            all_mean.append(mean_errors)
            all_mean_abs.append(mean_abs)

        self.log(writer, "all mean", np.array(all_mean).mean(0),
                 np.array(all_mean_abs).mean(0), global_step=global_step,
                 epoch_num=epoch_num)
