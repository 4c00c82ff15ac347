from . import blocks, blocks_extra
from .backbones.resnet import ResNet, resnet
from .backbones.convnext import ConvNeXt, convNext
from .backbones.swin_transformer import SwinTransformer, swinTransformer
from .backbones.vit import ViT, vit
from .backbones.dla import DLA, dlanet
from .backbones.densenet import DenseNetFeatures, densenet
from .backbones.resnet_matching import ResnetEncoderMatching
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

from .heads.fisheye_decoder import FishEyeDecoder

__all__ = [
    "blocks", "blocks_extra", "ResNet", "resnet", "ConvNeXt", "convNext",
    "SwinTransformer", "swinTransformer", "ViT", "vit", "DLA", "dlanet",
    "DenseNetFeatures", "densenet", "ResnetEncoderMatching", "FishEyeDecoder",
    "DepthDecoder", "MultiChannelDepthDecoder",
    "MultiChannelDepthDecoderUncertain", "PoseDecoder", "MonoDepth2Decoder",
    "reprojection_loss", "BaseMetaArch", "DistillWPoseMeta",
    "MonoDepthInference", "MonoDepthMeta", "MonoDepthWPose",
]
