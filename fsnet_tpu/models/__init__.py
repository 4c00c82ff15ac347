from . import blocks
from .backbones.resnet import ResNet, resnet
from .heads.depth_decoder import (
    DepthDecoder,
    MultiChannelDepthDecoder,
    MultiChannelDepthDecoderUncertain,
)
from .heads.pose_decoder import PoseDecoder
from .heads.monodepth2_decoder import MonoDepth2Decoder, reprojection_loss
from .meta_archs.base_meta import BaseMetaArch
from .meta_archs.monodepth2_model import (
    DistillWPoseMeta,
    MonoDepthInference,
    MonoDepthMeta,
    MonoDepthWPose,
)

__all__ = [
    "blocks", "ResNet", "resnet", "DepthDecoder", "MultiChannelDepthDecoder",
    "MultiChannelDepthDecoderUncertain", "PoseDecoder", "MonoDepth2Decoder",
    "reprojection_loss", "BaseMetaArch", "DistillWPoseMeta",
    "MonoDepthInference", "MonoDepthMeta", "MonoDepthWPose",
]
