"""NuScenes surround-view wpose config (reference ``configs/nusc_wpose_example``:
bs 8 @ 288x512, 10 epochs, ResNet-34, 64 depth bins, base_fx=369,
FastNusc per-channel eval)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from easydict import EasyDict as edict

from common import build_path, trainer_section, wpose_augmentation, wpose_meta_arch

cfg = edict()
cfg.path = build_path("nusc_wpose", nuscenes_dir="/data/nuscene")

data = edict(
    batch_size=8,
    num_workers=4,
    rgb_shape=(288, 512, 3),
    frame_idxs=[0, 1, -1],
)

cfg.trainer = trainer_section(
    clip_gradients=1.0,
    evaluate_hook=edict(
        name="fsnet_tpu.pipeline_hooks.evaluation_hooks.FastNuscEvaluationHook",
        test_run_hook_cfg=edict(
            name="fsnet_tpu.pipeline_hooks.train_val_hooks.BaseValidationHook"),
        dataset_eval_cfg=edict(
            name="fsnet_tpu.evaluation.nuscenes_unsupervised_eval.NuscenesEvaluator",
            data_path=cfg.path.nuscenes_dir,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "nusc_trainsub", "nusc_val.txt"),
            gt_saved_dir=os.path.join(cfg.path.base_path, "meta_data",
                                      "nusc_trainsub", "samples_depth_gt"),
        ),
    ),
)
cfg.trainer.max_epochs = 10
cfg.trainer.test_iter = 1

cfg.optimizer = edict(name="adam", lr=1e-4, weight_decay=0)
cfg.scheduler = edict(name="StepLR", step_size=4)

cfg.train_dataset = edict(
    name="fsnet_tpu.data.datasets.dataset_utils.ConcatDataset",
    frame_idxs=data.frame_idxs,
    is_filter_static=True,
    cfg_list=[
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
    name="fsnet_tpu.data.datasets.nuscene_dataset.NusceneJsonDataset",
    json_path=os.path.join(cfg.path.base_path, "meta_data", "nusc_trainsub",
                           "json_nusc_front_val.json"),
    augmentation=wpose_augmentation(data, data.frame_idxs, train=False),
)

cfg.data = data
cfg.meta_arch = wpose_meta_arch(
    data, min_depth=0.5, max_depth=100.0, resnet_depth=34, base_fx=369,
    num_output_channels=64, overlapped_mask=False)
