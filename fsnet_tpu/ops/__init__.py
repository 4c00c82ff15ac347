from .geometry import (
    backproject_depth,
    cam_relative_pose,
    decode_depth_inv_sigmoid,
    depth_to_disp,
    disp_to_depth,
    encode_depth_inv_sigmoid,
    entropy,
    get_smooth_loss,
    get_translation_matrix,
    invert_K,
    inverse_sigmoid,
    make_K44,
    pixel_grid,
    project_3d,
    reproject,
    rot_from_axisangle,
    transformation_from_parameters,
)
from .warp import grid_sample
from .ssim import ssim, ssim_uncer
from .depth_codec import build_depth_bins, gather_activation
from .metrics import (
    compute_depth_errors_masked,
    compute_errors,
    compute_supervised_errors,
)

__all__ = [
    "backproject_depth", "cam_relative_pose", "decode_depth_inv_sigmoid",
    "depth_to_disp", "disp_to_depth", "encode_depth_inv_sigmoid", "entropy",
    "get_smooth_loss", "get_translation_matrix", "invert_K", "inverse_sigmoid",
    "make_K44", "pixel_grid", "project_3d", "reproject", "rot_from_axisangle",
    "transformation_from_parameters", "grid_sample", "ssim", "ssim_uncer",
    "build_depth_bins", "gather_activation", "compute_depth_errors_masked",
    "compute_errors", "compute_supervised_errors",
]
