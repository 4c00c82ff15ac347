"""Multi-dataset joint training (reference ``configs/multi_dataset_example``:
ConcatDataset over KITTI raw + KITTI-360 + NuScenes JSON at 256x832,
fx-aware MultiChannelDepthDecoder with base_fx=492)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from easydict import EasyDict as edict

from common import build_path, trainer_section, wpose_augmentation, wpose_meta_arch

cfg = edict()
cfg.path = build_path(
    "multi_dataset_wpose",
    kitti_path="/data/kitti_raw",
    kitti360_path="/data/KITTI-360",
    nuscenes_dir="/data/nuscene",
)

data = edict(
    batch_size=8,
    num_workers=4,
    rgb_shape=(256, 832, 3),
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
            name="fsnet_tpu.evaluation.kitti_unsupervised_eval.KittiEigenEvaluator",
            data_path=cfg.path.kitti_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data", "eigen",
                                    "test_files.txt"),
            gt_saved_file=os.path.join(cfg.path.base_path, "meta_data",
                                       "eigen", "gt_depths.npz"),
        ),
    ),
)

cfg.optimizer = edict(name="adam", lr=1e-4, weight_decay=0)
cfg.scheduler = edict(name="StepLR", step_size=8)

cfg.train_dataset = edict(
    name="fsnet_tpu.data.datasets.dataset_utils.ConcatDataset",
    frame_idxs=data.frame_idxs,
    is_filter_static=True,
    cfg_list=[
        edict(
            name="fsnet_tpu.data.datasets.mono_dataset.KittiDepthMonoDataset",
            raw_path=cfg.path.kitti_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "eigen_zhou", "train_files.txt"),
        ),
        edict(
            name="fsnet_tpu.data.datasets.kitti360_dataset.KITTI360MonoDataset",
            raw_path=cfg.path.kitti360_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "kitti360_trainsub", "kitti360_train.txt"),
        ),
        edict(
            name="fsnet_tpu.data.datasets.nuscene_dataset.NusceneJsonDataset",
            json_path=os.path.join(cfg.path.base_path, "meta_data",
                                   "nusc_trainsub",
                                   "json_nusc_front_train.json"),
        ),
    ],
    augmentation=wpose_augmentation(data, data.frame_idxs, train=True),
)

cfg.val_dataset = edict(
    name="fsnet_tpu.data.datasets.mono_dataset.KittiDepthMonoEigenTestDataset",
    raw_path=cfg.path.kitti_path,
    split_file=os.path.join(cfg.path.base_path, "meta_data", "eigen",
                            "test_files.txt"),
    augmentation=wpose_augmentation(data, data.frame_idxs, train=False),
)

cfg.data = data
cfg.meta_arch = wpose_meta_arch(
    data, min_depth=0.5, max_depth=100.0, base_fx=492, num_output_channels=64)
