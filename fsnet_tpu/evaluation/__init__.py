from .base_evaluator import BaseEvaluator
from .kitti_unsupervised_eval import KittiEigenEvaluator, Kitti360Evaluator
from .kitti360_fisheye_eval import Kitti360FisheyeEvaluator
from .nuscenes_unsupervised_eval import NuscenesEvaluator
from .fusionportable_eval import FusionPortableEvaluator
from .kitti_supervised_eval import (
    evaluate_depth, evaluate_depth_unsupervised_aligned,
)

__all__ = [
    "BaseEvaluator", "KittiEigenEvaluator", "Kitti360Evaluator",
    "Kitti360FisheyeEvaluator", "NuscenesEvaluator", "FusionPortableEvaluator",
    "evaluate_depth", "evaluate_depth_unsupervised_aligned",
]
