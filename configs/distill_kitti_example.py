"""KITTI self-distillation config (reference ``configs/distill_kitti_example``:
frozen MonoDepthInference teacher + uncertainty-weighted distill loss 0.3,
student decoder = MultiChannelDepthDecoderUncertain)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from easydict import EasyDict as edict

from common import build_path, trainer_section, wpose_augmentation

cfg = edict()
cfg.path = build_path("Distill_Kitti_MonoDepth2WPose",
                      kitti_path="/data/kitti_raw")

data = edict(
    batch_size=12,
    num_workers=4,
    rgb_shape=(192, 640, 3),
    frame_idxs=[0, 1, -1],
)

cfg.trainer = trainer_section(
    clip_gradients=35.0,
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
cfg.scheduler = edict(name="StepLR", step_size=15)

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

_backbone_cfg = edict(
    name="fsnet_tpu.models.backbones.resnet.resnet",
    depth=18,
    pretrained=False,
    frozen_stages=-1,
    num_stages=4,
    out_indices=(-1, 0, 1, 2, 3),
    norm_eval=False,
    dilations=(1, 1, 1, 1),
)

cfg.meta_arch = edict(
    name="fsnet_tpu.models.meta_archs.monodepth2_model.DistillWPoseMeta",
    teacher_net_cfg=edict(
        name="fsnet_tpu.models.meta_archs.monodepth2_model.MonoDepthInference",
        backbone_cfg=_backbone_cfg,
        depth_head_cfg=edict(
            name="fsnet_tpu.models.heads.depth_decoder.MultiChannelDepthDecoder",
            num_ch_enc=np.array([64, 64, 128, 256, 512]),
            num_output_channels=16,
            use_skips=True,
            scales=[0, 1, 2, 3],
            min_depth=0.5,
            max_depth=100,
        ),
    ),
    teacher_net_path=os.path.join(cfg.path.base_path, "kitti_teacher"),
    depth_backbone_cfg=_backbone_cfg,
    head_cfg=edict(
        name="fsnet_tpu.models.heads.monodepth2_decoder.MonoDepth2Decoder",
        scales=[0, 1, 2, 3],
        height=data.rgb_shape[0],
        width=data.rgb_shape[1],
        min_depth=0.5,
        max_depth=100.0,
        is_log_image=False,
        overlapped_mask=True,
        distillation_loss_weight=0.3,
        is_uncertain_distill=True,
        depth_decoder_cfg=edict(
            name=("fsnet_tpu.models.heads.depth_decoder."
                  "MultiChannelDepthDecoderUncertain"),
            num_ch_enc=np.array([64, 64, 128, 256, 512]),
            num_output_channels=16,
            use_skips=True,
            scales=[0, 1, 2, 3],
            min_depth=0.5,
            max_depth=100,
        ),
    ),
    train_cfg=edict(frame_ids=data.frame_idxs),
    test_cfg=edict(),
)
