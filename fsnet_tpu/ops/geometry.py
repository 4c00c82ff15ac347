"""SE(3) / pinhole-projection geometry kernels (pure jnp, NHWC).

Re-implements the math of the reference's geometry layer
(``monodepth/networks/utils/monodepth_utils.py``: ``disp_to_depth:8``,
``rot_from_axisangle:298``, ``transformation_from_parameters:46``,
``BackprojectDepth:101``, ``Project3D:146``) as pure functions over NHWC
tensors with static shapes:

* The pixel grid is a traced-constant built from static (H, W) — no host round
  trip. The reference computes ``np.linalg.pinv(K)`` on CPU inside the training
  loss every step (``monodepth2_decoder.py:82-85``); here ``invert_K`` runs
  in-graph on the 4x4 via a closed form.
* Backproject/project are fused into a single einsum pipeline so XLA maps them
  onto the MXU as one batched matmul over H*W points.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth). Ref ``monodepth_utils.py:8-17``."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth, min_depth, max_depth):
    """Inverse of :func:`disp_to_depth` (reference ``monodepth_utils.py:19-24``).

    ``min_depth``/``max_depth`` may be scalars or broadcastable arrays (the
    MultiChannelDepthDecoder passes fx-scaled per-sample bounds)."""
    return (1.0 / depth - 1.0 / max_depth) / (1.0 / min_depth - 1.0 / max_depth)


def inverse_sigmoid(x):
    """log(x / (1 - x)) with the reference's epsilon (``monodepth_utils.py:26-29``)."""
    return jnp.log(x / (1.0 - x + 1e-8))


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [B, 3] (or [B, 1, 3]) -> rotation as [B, 4, 4] homogeneous matrix.

    Rodrigues formula, matching reference ``monodepth_utils.py:298-337`` including
    the 1e-7 axis-normalisation epsilon.
    """
    if vec.ndim == 3:
        vec = vec[:, 0, :]
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [B, 1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zeros,
            xyC + zs, y * yC + ca, yzC - xs, zeros,
            zxC - ys, yzC + xs, z * zC + ca, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(vec.shape[0], 4, 4)
    return rot


def get_translation_matrix(translation: jnp.ndarray) -> jnp.ndarray:
    """Translation [B, 3] (or [B, 1, 3]) -> [B, 4, 4]
    (ref ``monodepth_utils.py:31-44``)."""
    if translation.ndim == 3:
        translation = translation[:, 0, :]
    B = translation.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=translation.dtype)[None], (B, 1, 1))
    T = T.at[:, :3, 3].set(translation)
    return T


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axisangle, translation) -> [B, 4, 4] cam_T_cam
    (reference ``monodepth_utils.py:46-63``)."""
    R = rot_from_axisangle(axisangle)
    t = translation
    if t.ndim == 3:
        t = t[:, 0, :]
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    return jnp.matmul(R, T) if invert else jnp.matmul(T, R)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinate grid [H, W, 3] = (u, v, 1), a static constant
    folded into the compiled graph (replaces the reference's per-call meshgrid,
    ``BackprojectDepth.get_grid``, ``monodepth_utils.py:104-116``)."""
    u = jnp.arange(width, dtype=dtype)
    v = jnp.arange(height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # [H, W, 3]


def invert_K(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a [B, 4, 4] homogeneous intrinsics matrix whose
    upper-left 3x3 is the pinhole K (fx, fy, cx, cy with possible skew).

    Replaces the reference's CPU ``np.linalg.pinv`` host sync
    (``monodepth2_decoder.py:82-85``) with an in-graph 4x4 solve. Solved in
    at least f32 (linalg has no bf16 kernels and a 4x4 inverse needs the
    precision anyway; f64 inputs stay f64 so the torch-oracle parity tests
    can compare at full precision); callers downcast as needed.
    """
    return jnp.linalg.inv(K.astype(jnp.promote_types(K.dtype, jnp.float32)))


def make_K44(P: jnp.ndarray) -> jnp.ndarray:
    """Embed the 3x3 intrinsics of a [B, 3, 4] (or [B, 4, 4]) camera matrix P
    into a [B, 4, 4] K with K[3,3] = 1, matching the reference's construction
    (``monodepth2_decoder.py:82-85``)."""
    B = P.shape[0]
    K = jnp.zeros((B, 4, 4), dtype=P.dtype)
    K = K.at[:, :3, :3].set(P[:, :3, :3])
    K = K.at[:, 3, 3].set(1.0)
    return K


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth [B, H, W, 1] + inv_K [B, 4, 4] -> homogeneous cam points [B, H, W, 4].

    Reference ``BackprojectDepth.forward`` (``monodepth_utils.py:137-148``), as a
    single einsum over the static pixel grid.
    """
    B, H, W, _ = depth.shape
    grid = pixel_grid(H, W, dtype=depth.dtype)  # [H, W, 3]
    rays = jnp.einsum("bij,hwj->bhwi", inv_K[:, :3, :3], grid)  # [B, H, W, 3]
    cam = rays * depth  # [B, H, W, 3]
    ones = jnp.ones_like(cam[..., :1])
    return jnp.concatenate([cam, ones], axis=-1)


def project_3d(points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray,
               eps: float = 1e-7) -> jnp.ndarray:
    """Project homogeneous cam points [B, H, W, 4] through pose T and intrinsics K
    into normalized [-1, 1] pixel coords [B, H, W, 2] (grid_sample convention,
    align_corners=True). Reference ``Project3D.forward``
    (``monodepth_utils.py:151-166``).
    """
    B, H, W, _ = points.shape
    P = jnp.matmul(K, T)[:, :3, :]  # [B, 3, 4]
    cam_points = jnp.einsum("bij,bhwj->bhwi", P, points)  # [B, H, W, 3]
    pix = cam_points[..., :2] / (cam_points[..., 2:3] + eps)
    u = pix[..., 0] / (W - 1)
    v = pix[..., 1] / (H - 1)
    return jnp.stack([(u - 0.5) * 2.0, (v - 0.5) * 2.0], axis=-1)


def reproject(depth: jnp.ndarray, K: jnp.ndarray, inv_K: jnp.ndarray,
              T: jnp.ndarray) -> jnp.ndarray:
    """Fused backproject -> transform -> project: depth [B, H, W, 1] to sampling
    grid [B, H, W, 2] in one matmul chain.

    Algebraically equal to ``project_3d(backproject_depth(d, inv_K), K, T)`` but
    composes the 3x4 matrix ``M = (K·T)[:3] · diag-embed(inv_K)`` on the host of
    the graph so per-pixel work is a single 3x3 matvec + depth scale — the form
    XLA tiles best on the MXU.
    """
    B, H, W, _ = depth.shape
    # The WHOLE chain runs in >= f32 even under bf16 mixed precision and the
    # returned grid stays f32: pixel addressing needs sub-pixel precision,
    # and bf16 quantizes pixel coordinates to +-2 px beyond x ~ 256 (and cam
    # ratios to ~0.8%), which corrupts every warp at the KITTI W=640 — and
    # NaN-poisons the Pallas gather path when z crosses zero in bf16
    # (convergence probe, BASELINE.md). Per-pixel cost is one 3x3 matvec;
    # the bandwidth win of bf16 lives in the image warps, not here.
    mat_t = jnp.promote_types(K.dtype, jnp.float32)
    P = jnp.matmul(K.astype(mat_t), T.astype(mat_t))[:, :3, :]
    A = jnp.matmul(P[:, :, :3], inv_K[:, :3, :3].astype(mat_t))
    b = P[:, :, 3]                            # [B, 3] constant term
    grid = pixel_grid(H, W, dtype=mat_t)
    # The per-pixel 3x3 matvec is an EXPLICIT fma chain, not an einsum: XLA
    # lowers small-K f32 einsums to bf16 MXU passes whose ~1e-3 relative
    # noise is +-0.6 px (p99 2.7 px) at W=640 — measured against an f64
    # oracle (scripts/tpu_prep_diff.py, BASELINE.md round 3). Nine VPU fmas
    # are exact f32 and fuse into the surrounding elementwise graph.
    jj = grid[..., 0]
    ii = grid[..., 1]
    A_ = A[:, None, None]                     # [B, 1, 1, 3, 3]
    cam3 = jnp.stack([
        A_[..., k, 0] * jj + A_[..., k, 1] * ii + A_[..., k, 2]
        for k in range(3)], axis=-1)
    cam = cam3 * depth.astype(mat_t) + b[:, None, None, :]
    pix = cam[..., :2] / (cam[..., 2:3] + 1e-7)
    u = pix[..., 0] / (W - 1)
    v = pix[..., 1] / (H - 1)
    return jnp.stack([(u - 0.5) * 2.0, (v - 0.5) * 2.0], axis=-1)


def get_smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order smoothness on NHWC disp [B, H, W, 1] guided by
    img [B, H, W, C] (reference ``monodepth_utils.py:169-182``)."""
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    # channel means at the image dtype: jnp.mean's half-precision upcast
    # otherwise emits f32 [B, H, W-1] guidance maps (r5 trace); a 3-element
    # mean is exact to 1 ulp in any dtype
    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]),
                          axis=-1, keepdims=True, dtype=img.dtype)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]),
                          axis=-1, keepdims=True, dtype=img.dtype)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    # >= f32 accumulation: bf16 means over B*H*W elements quantize badly
    # (promote, not hard-cast: f64 parity tests need f64 accumulation).
    # .astype().mean() — not mean(dtype=): same accumulated value, but the
    # backward casts the cotangent to the compute dtype at the reduction,
    # keeping the upstream elementwise backward at compute width.
    acc_t = jnp.promote_types(grad_disp_x.dtype, jnp.float32)
    return (jnp.mean(grad_disp_x.astype(acc_t))
            + jnp.mean(grad_disp_y.astype(acc_t)))


def decode_depth_inv_sigmoid(depth):
    """exp(-x) decode (reference ``monodepth_utils.py:461-472``)."""
    return jnp.exp(-depth)


def encode_depth_inv_sigmoid(depth_decoded):
    """-log(x) encode (reference ``monodepth_utils.py:474-486``)."""
    return -jnp.log(depth_decoded)


def entropy(volume, axis, keepdims: bool = False):
    """Shannon entropy over a prob volume (reference ``maths.py:186``)."""
    return jnp.sum(-volume * jnp.log(jnp.clip(volume, 1e-9, 1.0)), axis=axis,
                   keepdims=keepdims)


def cam_relative_pose(T_w_a: jnp.ndarray, T_w_b: jnp.ndarray) -> jnp.ndarray:
    """Relative pose a_T_b from two world poses (host util parity,
    reference ``monodepth/data/datasets/utils.py:53-57``)."""
    return jnp.matmul(jnp.linalg.inv(T_w_a), T_w_b)
