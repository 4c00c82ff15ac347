"""KITTI-360 wpose training config (reference ``configs/kitti360_wpose_example``:
bs 12 @ 192x640, 20 epochs, Adam 1e-4, StepLR(8), clip 1.0)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from easydict import EasyDict as edict

from common import build_path, trainer_section, wpose_augmentation, wpose_meta_arch

cfg = edict()
cfg.path = build_path("KITTI360_WPose", kitti360_path="/data/KITTI-360")

data = edict(
    batch_size=12,
    num_workers=4,
    rgb_shape=(192, 640, 3),
    frame_idxs=[0, 1, -1],
)

cfg.trainer = trainer_section(
    clip_gradients=1.0,
    evaluate_hook=edict(
        name="fsnet_tpu.pipeline_hooks.evaluation_hooks.KittiEvaluationHook",
        test_run_hook_cfg=edict(
            name="fsnet_tpu.pipeline_hooks.train_val_hooks.BaseValidationHook"),
        preprocessed_path=cfg.path.preprocessed_path,
        dataset_eval_cfg=edict(
            name="fsnet_tpu.evaluation.kitti_unsupervised_eval.Kitti360Evaluator",
            data_path=cfg.path.kitti360_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "kitti360_trainsub", "kitti360_val.txt"),
            gt_saved_file=os.path.join(cfg.path.base_path, "meta_data",
                                       "kitti360_trainsub", "gt_depth.npz"),
        ),
    ),
)

cfg.optimizer = edict(name="adam", lr=1e-4, weight_decay=0)
cfg.scheduler = edict(name="StepLR", step_size=8)

cfg.train_dataset = edict(
    name="fsnet_tpu.data.datasets.dataset_utils.ConcatDataset",
    frame_idxs=data.frame_idxs,
    is_motion_mask=False,
    is_precompute_flow=False,
    is_filter_static=True,
    cfg_list=[
        edict(
            name="fsnet_tpu.data.datasets.kitti360_dataset.KITTI360MonoDataset",
            raw_path=cfg.path.kitti360_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "kitti360_trainsub", "kitti360_train.txt"),
        ),
    ],
    augmentation=wpose_augmentation(data, data.frame_idxs, train=True),
)

cfg.val_dataset = edict(
    name="fsnet_tpu.data.datasets.kitti360_dataset.KITTI360MonoDataset",
    raw_path=cfg.path.kitti360_path,
    split_file=os.path.join(cfg.path.base_path, "meta_data",
                            "kitti360_trainsub", "kitti360_val.txt"),
    is_filter_static=False,
    use_right_image=False,
    augmentation=wpose_augmentation(data, data.frame_idxs, train=False),
)

cfg.data = data
cfg.meta_arch = wpose_meta_arch(data, min_depth=0.5, max_depth=100.0)
