"""Dataset evaluation hooks.

Reference: ``monodepth/pipeline_hooks/evaluation_hooks/base_evaluation_hooks.py``
— ``KittiEvaluationHook:19`` (batched eval pass: jit forward -> per-sample
unpad by ``('image_resize','effective_size')`` -> inverse-space resize
``1/resize(1/depth)`` to original resolution -> evaluator ``single_call`` ->
mean + table log) and ``vision_base/pipeline_hooks/evaluation_hooks/
base_evaluation_hooks.py:12`` (generic driver).
"""
from __future__ import annotations

from typing import Dict, Optional

import cv2
import numpy as np

from ..data.dataloader import Dataloader, InferenceSampler
from ..data.datasets.dataset_utils import collate_fn
from ..utils.builder import build


class KittiEvaluationHook:
    """Reference ``base_evaluation_hooks.py:19-67``."""

    def __init__(self, test_run_hook_cfg: Dict,
                 dataset_eval_cfg: Optional[Dict] = None,
                 preprocessed_path: str = "", batch_size: int = 1,
                 num_workers: int = 4, **kwargs):
        self.test_hook = build(**dict(test_run_hook_cfg))
        self.dataset_eval_func = (None if dataset_eval_cfg is None
                                  else build(**dict(dataset_eval_cfg)))
        self.batch_size = batch_size
        self.num_workers = num_workers
        for key, value in kwargs.items():
            setattr(self, key, value)

    def __call__(self, state, dataset_val, writer=None, global_step: int = 0,
                 epoch_num: int = 0):
        loader = Dataloader(dataset_val, batch_size=self.batch_size,
                            sampler=InferenceSampler(len(dataset_val)),
                            collate=collate_fn, num_workers=self.num_workers,
                            drop_last=False, infinite=False)

        errors, abs_errors = [], []
        frame_index = 0
        for batched_data in loader:
            output_dict = self.test_hook(batched_data, state, global_step,
                                         epoch_num)
            depth_batch = np.asarray(output_dict["depth"])[..., 0]  # [B, H, W]
            B = depth_batch.shape[0]
            for i in range(B):
                depth = depth_batch[i]
                eff = batched_data.get("image_resize/effective_size")
                if eff is not None:
                    h_eff, w_eff = int(eff[i][0]), int(eff[i][1])
                    depth = depth[0:h_eff, 0:w_eff]
                h, w = np.asarray(
                    batched_data["original_image/0"][i]).shape[:2]
                # inverse-space resize preserves nearby structure
                # (reference base_evaluation_hooks.py:58)
                depth_0 = 1.0 / cv2.resize(1.0 / depth, (w, h))

                result = self.dataset_eval_func.single_call(depth_0, frame_index)
                frame_index += 1
                errors.append(result["error"])
                abs_errors.append(result["abs_error"])

        mean_errors = np.array(errors).mean(0)
        mean_abs_errors = np.array(abs_errors).mean(0)
        self.dataset_eval_func.log(writer, mean_errors, mean_abs_errors,
                                   global_step=global_step, epoch_num=epoch_num)
        return mean_errors, mean_abs_errors


class BaseEvaluationHook:
    """Generic single-sample evaluation driver (reference
    ``vision_base/pipeline_hooks/evaluation_hooks/base_evaluation_hooks.py:12-48``)."""

    def __init__(self, test_run_hook_cfg: Dict, result_write_cfg: Optional[Dict] = None,
                 dataset_eval_cfg: Optional[Dict] = None, **kwargs):
        self.test_hook = build(**dict(test_run_hook_cfg))
        self.result_processor = (None if result_write_cfg is None
                                 else build(**dict(result_write_cfg)))
        self.dataset_eval_func = (None if dataset_eval_cfg is None
                                  else build(**dict(dataset_eval_cfg)))

    def __call__(self, state, dataset_val, writer=None, global_step: int = 0,
                 epoch_num: int = 0):
        from ..utils.keys import encode_batch

        for index in range(len(dataset_val)):
            data = dataset_val[index]
            batch = encode_batch(collate_fn([data]))
            output = self.test_hook(batch, state, global_step, epoch_num)
            if self.result_processor is not None:
                self.result_processor(output, batch, index)
        if self.dataset_eval_func is not None and self.result_processor is not None:
            self.dataset_eval_func(self.result_processor.result_path, writer,
                                   global_step, epoch_num)


class KittiEvaluationHook_postopt(KittiEvaluationHook):
    """Eval with VO-depth post-optimization (reference
    ``base_evaluation_hooks.py:69-139``): SLIC + per-segment log-scale refine
    before the evaluator call."""

    def __call__(self, state, dataset_val, writer=None, global_step: int = 0,
                 epoch_num: int = 0):
        import numpy as np

        from ..ops.postopt import (
            denorm, depth_image_to_point_cloud_array, post_optimization,
        )

        post_opt_cfg = dict(getattr(self, "post_opt_cfg", {}) or {})
        vo_path = post_opt_cfg.pop("vo_path", None)
        params = dict(lab_dist_weight=1, depth_dist_weight=1,
                      image_dist_weight=1, h_seg=10, w_seg=18, iter_num=3,
                      lambda0=0.54 / (10 * 18), lambda1=1.0, lambda2=0.4)
        params.update({k: v for k, v in post_opt_cfg.items() if k in params})

        loader = Dataloader(dataset_val, batch_size=self.batch_size,
                            sampler=InferenceSampler(len(dataset_val)),
                            collate=collate_fn, num_workers=self.num_workers,
                            drop_last=False, infinite=False)

        errors, abs_errors = [], []
        frame_index = 0
        for batched_data in loader:
            output_dict = self.test_hook(batched_data, state, global_step,
                                         epoch_num)
            depth_batch = np.asarray(output_dict["depth"])[..., 0]
            for i in range(depth_batch.shape[0]):
                depth = depth_batch[i]
                eff = batched_data.get("image_resize/effective_size")
                if eff is not None:
                    depth = depth[0:int(eff[i][0]), 0:int(eff[i][1])]

                image = np.asarray(batched_data["image/0"][i])
                rgb_image = denorm(image,
                                   rgb_mean=np.array([0.485, 0.456, 0.406]),
                                   rgb_std=np.array([0.229, 0.224, 0.225]))
                vo = batched_data.get("vo_depth/0")
                if vo is not None:
                    try:
                        uvz = depth_image_to_point_cloud_array(depth)
                        depth = np.asarray(post_optimization(
                            rgb_image.astype(np.float32) / 255.0, uvz, depth,
                            np.asarray(vo[i]), **params))
                    except Exception:  # noqa: BLE001 - reference also falls back
                        pass

                h, w = np.asarray(
                    batched_data["original_image/0"][i]).shape[:2]
                depth_0 = 1.0 / cv2.resize(1.0 / depth, (w, h))
                result = self.dataset_eval_func.single_call(depth_0, frame_index)
                frame_index += 1
                errors.append(result["error"])
                abs_errors.append(result["abs_error"])

        mean_errors = np.array(errors).mean(0)
        mean_abs_errors = np.array(abs_errors).mean(0)
        self.dataset_eval_func.log(writer, mean_errors, mean_abs_errors,
                                   global_step=global_step, epoch_num=epoch_num)
        return mean_errors, mean_abs_errors


class FastNuscEvaluationHook:
    """Per-camera-channel NuScenes eval (reference
    ``base_evaluation_hooks.py:141-203``): groups per-sample errors by
    ``camera_type``, logs each channel plus the all-camera mean."""

    def __init__(self, test_run_hook_cfg: Dict,
                 dataset_eval_cfg: Optional[Dict] = None,
                 batch_size: int = 16, num_workers: int = 4, **kwargs):
        self.test_hook = build(**dict(test_run_hook_cfg))
        self.dataset_eval_func = (None if dataset_eval_cfg is None
                                  else build(**dict(dataset_eval_cfg)))
        self.batch_size = batch_size
        self.num_workers = num_workers
        for key, value in kwargs.items():
            setattr(self, key, value)

    def _depth_for_sample(self, depth, batched_data, i):
        import numpy as np

        eff = batched_data.get("image_resize/effective_size")
        if eff is not None:
            depth = depth[0:int(eff[i][0]), 0:int(eff[i][1])]
        h, w = np.asarray(batched_data["original_image/0"][i]).shape[:2]
        return cv2.resize(depth, (w, h))

    def __call__(self, state, dataset_val, writer=None, global_step: int = 0,
                 epoch_num: int = 0):
        import warnings

        import numpy as np

        loader = Dataloader(dataset_val, batch_size=self.batch_size,
                            sampler=InferenceSampler(len(dataset_val)),
                            collate=collate_fn, num_workers=self.num_workers,
                            drop_last=False, infinite=False)

        errors: Dict = {}
        abs_errors: Dict = {}
        for batched_data in loader:
            output_dict = self.test_hook(batched_data, state, global_step,
                                         epoch_num)
            depth_batch = np.asarray(output_dict["depth"])[..., 0]
            for i in range(depth_batch.shape[0]):
                depth_0 = self._depth_for_sample(depth_batch[i], batched_data, i)
                camera_type = batched_data["camera_type"][i]
                errors.setdefault(camera_type, [])
                abs_errors.setdefault(camera_type, [])
                if self.dataset_eval_func is None:
                    continue
                filename = batched_data["filename/0"][i]
                try:
                    result = self.dataset_eval_func.single_call(depth_0,
                                                                filename)
                except ValueError:
                    warnings.warn(f"sample {filename} has no usable points")
                    continue
                errors[camera_type].append(result["error"])
                abs_errors[camera_type].append(result["abs_error"])

        all_mean, all_mean_abs = [], []
        for cam in errors:
            mean_errors = np.array(errors[cam]).mean(0)
            mean_abs = np.array(abs_errors[cam]).mean(0)
            self.dataset_eval_func.log(writer, cam, mean_errors, mean_abs,
                                       global_step=global_step,
                                       epoch_num=epoch_num)
            all_mean.append(mean_errors)
            all_mean_abs.append(mean_abs)
        self.dataset_eval_func.log(writer, "all mean",
                                   np.array(all_mean).mean(0),
                                   np.array(all_mean_abs).mean(0),
                                   global_step=global_step,
                                   epoch_num=epoch_num)


class PostOptFastNuscEvaluationHook(FastNuscEvaluationHook):
    """NuScenes per-channel eval with VO post-optimization (reference
    ``base_evaluation_hooks.py:204-288``)."""

    def _depth_for_sample(self, depth, batched_data, i):
        import numpy as np

        from ..ops.postopt import (
            denorm, depth_image_to_point_cloud_array, post_optimization,
        )

        post_opt_cfg = dict(getattr(self, "post_opt_cfg", {}) or {})
        params = dict(lab_dist_weight=1, depth_dist_weight=1,
                      image_dist_weight=1, h_seg=10, w_seg=18, iter_num=3,
                      lambda0=0.54 / (10 * 18), lambda1=1.0, lambda2=0.4)
        params.update({k: v for k, v in post_opt_cfg.items() if k in params})

        eff = batched_data.get("image_resize/effective_size")
        if eff is not None:
            depth = depth[0:int(eff[i][0]), 0:int(eff[i][1])]

        vo = batched_data.get("vo_depth/0")
        if vo is not None:
            image = np.asarray(batched_data["image/0"][i])
            rgb = denorm(image, rgb_mean=np.array([0.485, 0.456, 0.406]),
                         rgb_std=np.array([0.229, 0.224, 0.225]))
            uvz = depth_image_to_point_cloud_array(depth)
            depth = np.asarray(post_optimization(
                rgb.astype(np.float32) / 255.0, uvz, depth,
                np.asarray(vo[i]), **params))

        h, w = np.asarray(batched_data["original_image/0"][i]).shape[:2]
        return cv2.resize(depth, (w, h))
