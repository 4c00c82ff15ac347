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
