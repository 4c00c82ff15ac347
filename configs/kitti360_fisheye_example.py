"""KITTI-360 fisheye config (reference ``configs/kitti360_fisheye_example``:
bs 16 @ 384x384, Mei camera model, fisheye validity mask, FishEyeDecoder,
max_depth 150, weight_decay 1e-5)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from easydict import EasyDict as edict

from common import AUG, build_path, trainer_section, wpose_meta_arch

cfg = edict()
cfg.path = build_path("KITTI360_fisheye", kitti360_path="/data/KITTI-360")

data = edict(
    batch_size=16,
    num_workers=4,
    rgb_shape=(384, 384, 3),
    frame_idxs=[0, 1, -1],
)

cfg.trainer = trainer_section(
    clip_gradients=1.0,
    evaluate_hook=edict(
        name="fsnet_tpu.pipeline_hooks.evaluation_hooks.KittiEvaluationHook",
        test_run_hook_cfg=edict(
            name="fsnet_tpu.pipeline_hooks.train_val_hooks.BaseValidationHook"),
        dataset_eval_cfg=edict(
            name=("fsnet_tpu.evaluation.kitti360_fisheye_eval."
                  "Kitti360FisheyeEvaluator"),
            data_path=cfg.path.kitti360_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "kitti360_trainsub", "kitti360_val.txt"),
            gt_saved_file=os.path.join(cfg.path.base_path, "meta_data",
                                       "kitti360_trainsub",
                                       "fisheye_gt_depth.npz"),
        ),
    ),
)

cfg.optimizer = edict(name="adam", lr=1e-4, weight_decay=1e-5)
cfg.scheduler = edict(name="StepLR", step_size=8)

# fisheye aug: aspect-preserving resize + Copy to original_image AFTER mirror
# (reference kitti360_fisheye_example:131-157); geometric warps would break
# the precomputed ray maps, so only resize happens before the Mei model.
resize_image_keys = [("image", idx) for idx in data.frame_idxs]
original_image_keys = [("original_image", idx) for idx in data.frame_idxs]
color_keys = [("image", idx) for idx in data.frame_idxs]
pose_axis_pairs = [(("relative_pose", idx), 0) for idx in data.frame_idxs[1:]]

train_augmentation = edict(
    name="fsnet_tpu.utils.builder.Sequential",
    cfg_list=[
        edict(name=f"{AUG}.ConvertToFloat"),
        edict(name=f"{AUG}.Resize",
              size=(data.rgb_shape[0], data.rgb_shape[1]),
              preserve_aspect_ratio=True, force_pad=True),
        edict(name=f"{AUG}.RandomMirror", mirror_prob=0.5,
              pose_axis_pairs=pose_axis_pairs),
        edict(name=f"{AUG}.Copy", from_keys=resize_image_keys,
              to_keys=original_image_keys),
        edict(name="fsnet_tpu.utils.builder.Shuffle",
              cfg_list=[
                  edict(name=f"{AUG}.RandomBrightness", distort_prob=1.0),
                  edict(name=f"{AUG}.RandomContrast", distort_prob=1.0,
                        lower=0.6, upper=1.4),
                  edict(name="fsnet_tpu.utils.builder.Sequential",
                        cfg_list=[
                            edict(name=f"{AUG}.ConvertColor", transform="HSV"),
                            edict(name=f"{AUG}.RandomSaturation",
                                  distort_prob=1.0, lower=0.6, upper=1.4),
                            edict(name=f"{AUG}.ConvertColor", current="HSV",
                                  transform="RGB"),
                        ]),
              ],
              image_keys=color_keys),
        edict(name=f"{AUG}.Normalize", mean=np.array([0.485, 0.456, 0.406]),
              stds=np.array([0.229, 0.224, 0.225]), image_keys=color_keys),
        edict(name=f"{AUG}.Normalize", mean=np.array([0, 0, 0]),
              stds=np.array([1, 1, 1]), image_keys=original_image_keys),
        edict(name=f"{AUG}.ConvertToTensor"),
    ],
    image_keys=resize_image_keys,
    calib_keys=["P2"],
    gt_image_keys=["patched_mask"],
)

val_augmentation = edict(
    name="fsnet_tpu.utils.builder.Sequential",
    cfg_list=[
        edict(name=f"{AUG}.ConvertToFloat"),
        edict(name=f"{AUG}.Resize",
              size=(data.rgb_shape[0], data.rgb_shape[1]),
              preserve_aspect_ratio=True, force_pad=True),
        edict(name=f"{AUG}.Normalize", mean=np.array([0.485, 0.456, 0.406]),
              stds=np.array([0.229, 0.224, 0.225])),
        edict(name=f"{AUG}.ConvertToTensor"),
    ],
    image_keys=[("image", 0)],
    calib_keys=["P2"],
)

cfg.train_dataset = edict(
    name="fsnet_tpu.data.datasets.dataset_utils.ConcatDataset",
    frame_idxs=data.frame_idxs,
    is_filter_static=True,
    cfg_list=[
        edict(
            name="fsnet_tpu.data.datasets.fisheye_dataset.KITTI360FisheyeDataset",
            raw_path=cfg.path.kitti360_path,
            split_file=os.path.join(cfg.path.base_path, "meta_data",
                                    "kitti360_trainsub", "kitti360_train.txt"),
            fisheye_mask=os.path.join(cfg.path.base_path, "meta_data",
                                      "kitti360_trainsub", "fisheye_mask.png"),
        ),
    ],
    augmentation=train_augmentation,
)

cfg.val_dataset = edict(
    name="fsnet_tpu.data.datasets.fisheye_dataset.KITTI360FisheyeDataset",
    raw_path=cfg.path.kitti360_path,
    split_file=os.path.join(cfg.path.base_path, "meta_data",
                            "kitti360_trainsub", "kitti360_val.txt"),
    is_filter_static=False,
    use_right_image=False,
    augmentation=val_augmentation,
)

cfg.data = data
cfg.meta_arch = wpose_meta_arch(
    data, min_depth=0.1, max_depth=150.0,
    head_name="fsnet_tpu.models.heads.fisheye_decoder.FishEyeDecoder")
