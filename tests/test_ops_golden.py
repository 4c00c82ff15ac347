"""Golden numerical tests: jnp ops vs torch CPU reference semantics.

torch (CPU build) is used purely as a test oracle replicating the published
monodepth2 formulas the reference uses; the framework itself never imports torch.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fsnet_tpu.ops import (
    backproject_depth, build_depth_bins, depth_to_disp, disp_to_depth,
    gather_activation, get_smooth_loss, grid_sample, invert_K, make_K44,
    project_3d, reproject, rot_from_axisangle, ssim,
    transformation_from_parameters,
)

RNG = np.random.RandomState(0)


def _rand(*shape):
    return RNG.rand(*shape).astype(np.float32)


# ---------------------------------------------------------------- torch oracles

def torch_rot_from_axisangle(vec):
    """Reference monodepth_utils.py:298-337 (Rodrigues)."""
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


def torch_ssim(x, y, kernel_size=3, padding=1):
    """Reference monodepth_utils.py:184-215."""
    refl = torch.nn.ReflectionPad2d(padding)
    pool = torch.nn.AvgPool2d(kernel_size, 1)
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


# ------------------------------------------------------------------------ tests

def test_disp_depth_roundtrip():
    disp = _rand(2, 8, 8, 1)
    scaled, depth = disp_to_depth(jnp.asarray(disp), 0.5, 100.0)
    disp_back = depth_to_disp(depth, 0.5, 100.0)
    np.testing.assert_allclose(np.asarray(disp_back), disp, atol=1e-5)
    assert float(jnp.min(depth)) >= 0.5 - 1e-4
    assert float(jnp.max(depth)) <= 100.0 + 1e-4


def test_rot_from_axisangle_vs_torch():
    vec = (_rand(4, 1, 3) - 0.5) * 2.0
    ours = np.asarray(rot_from_axisangle(jnp.asarray(vec)))
    oracle = torch_rot_from_axisangle(torch.from_numpy(vec)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def torch_transformation_from_parameters(axisangle, translation, invert=False):
    """Reference monodepth_utils.py:46-63."""
    R = torch_rot_from_axisangle(axisangle)
    t = translation.clone()
    if invert:
        R = R.transpose(1, 2)
        t = t * -1
    T = torch.zeros(t.shape[0], 4, 4)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, :3, 3] = t.view(-1, 3)
    return torch.matmul(R, T) if invert else torch.matmul(T, R)


def test_transformation_from_parameters_vs_torch():
    aa = (_rand(3, 1, 3) - 0.5) * 0.2
    t = (_rand(3, 1, 3) - 0.5) * 0.5
    for invert in (False, True):
        ours = np.asarray(transformation_from_parameters(
            jnp.asarray(aa), jnp.asarray(t), invert=invert))
        oracle = torch_transformation_from_parameters(
            torch.from_numpy(aa), torch.from_numpy(t), invert=invert).numpy()
        np.testing.assert_allclose(ours, oracle, atol=1e-5)
    # composition is only approximately identity: the reference's 1e-7 axis
    # epsilon (kept for parity) leaves R slightly non-orthogonal
    T = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t)))
    T_inv = np.asarray(
        transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=True))
    prod = np.einsum("bij,bjk->bik", T, T_inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (3, 1, 1)), atol=1e-2)


def _make_K(B):
    K = np.zeros((B, 4, 4), dtype=np.float32)
    K[:, 0, 0] = 100.0 + 10 * RNG.rand(B)
    K[:, 1, 1] = 100.0 + 10 * RNG.rand(B)
    K[:, 0, 2] = 32.0
    K[:, 1, 2] = 24.0
    K[:, 2, 2] = 1.0
    K[:, 3, 3] = 1.0
    return K


def test_backproject_project_identity():
    """Backproject then project with identity pose must return the pixel grid."""
    B, H, W = 2, 24, 32
    depth = (_rand(B, H, W, 1) * 10 + 1).astype(np.float32)
    K = _make_K(B)
    inv_K = np.asarray(invert_K(jnp.asarray(K)))

    cam = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    T = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    pix = np.asarray(project_3d(cam, jnp.asarray(K), T))

    # expected normalized identity grid
    u = (np.arange(W) / (W - 1) - 0.5) * 2
    v = (np.arange(H) / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(pix[..., 0], np.tile(u[None, None, :], (B, H, 1)),
                               atol=1e-3)
    np.testing.assert_allclose(pix[..., 1], np.tile(v[None, :, None], (B, 1, W)),
                               atol=1e-3)


def test_reproject_matches_two_step():
    B, H, W = 2, 16, 20
    depth = (_rand(B, H, W, 1) * 10 + 1).astype(np.float32)
    K = _make_K(B)
    inv_K = np.asarray(invert_K(jnp.asarray(K)))
    aa = (_rand(B, 1, 3) - 0.5) * 0.1
    t = (_rand(B, 1, 3) - 0.5) * 0.5
    T = transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t))

    cam = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    two_step = np.asarray(project_3d(cam, jnp.asarray(K), T))
    fused = np.asarray(reproject(jnp.asarray(depth), jnp.asarray(K),
                                 jnp.asarray(inv_K), T))
    np.testing.assert_allclose(fused, two_step, atol=1e-3)


def test_make_K44():
    P = _rand(2, 3, 4)
    K = np.asarray(make_K44(jnp.asarray(P)))
    np.testing.assert_allclose(K[:, :3, :3], P[:, :3, :3])
    assert np.all(K[:, 3, 3] == 1.0)
    assert np.all(K[:, :3, 3] == 0.0)


@pytest.mark.parametrize("mode,padding_mode", [
    ("bilinear", "border"), ("bilinear", "zeros"),
    ("nearest", "border"), ("nearest", "zeros"),
])
def test_grid_sample_vs_torch(mode, padding_mode):
    B, H, W, C = 2, 12, 16, 3
    img = _rand(B, H, W, C)
    # grid extends past the borders to test padding behavior
    grid = (_rand(B, 10, 14, 2) * 2.6 - 1.3).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  mode=mode, padding_mode=padding_mode,
                                  align_corners=True))
    oracle = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode=mode, padding_mode=padding_mode, align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_grid_sample_gradient_exists():
    import jax
    img = jnp.asarray(_rand(1, 8, 8, 1))
    grid = jnp.asarray(_rand(1, 8, 8, 2) * 2 - 1)
    g = jax.grad(lambda gr: jnp.sum(grid_sample(img, gr)))(grid)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_ssim_vs_torch():
    x = _rand(2, 16, 20, 3)
    y = _rand(2, 16, 20, 3)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    oracle = torch_ssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(y).permute(0, 3, 1, 2))
    oracle = oracle.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_smooth_loss_vs_torch():
    disp = _rand(2, 16, 20, 1)
    img = _rand(2, 16, 20, 3)
    ours = float(get_smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

    d = torch.from_numpy(disp).permute(0, 3, 1, 2)
    im = torch.from_numpy(img).permute(0, 3, 1, 2)
    gx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    ix = torch.mean(torch.abs(im[:, :, :, :-1] - im[:, :, :, 1:]), 1, keepdim=True)
    iy = torch.mean(torch.abs(im[:, :, :-1, :] - im[:, :, 1:, :]), 1, keepdim=True)
    oracle = float((gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean())
    assert abs(ours - oracle) < 1e-6


def test_depth_bins_and_gather_activation():
    bins = build_depth_bins(0.5, 100.0, 16)
    assert bins.shape == (16,)
    # torch oracle for the bin construction (depth_encoder.py:68-74)
    lo, hi = np.log(0.5), np.log(100.0)
    t_bins = torch.exp(torch.arange(lo, hi, (hi - lo) / 16)).numpy()
    np.testing.assert_allclose(bins, t_bins, rtol=1e-5)

    logits = (_rand(2, 8, 8, 16) * 30 - 15).astype(np.float32)  # exercises clamp
    ours = np.asarray(gather_activation(jnp.asarray(logits), jnp.asarray(bins)))
    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    t_logits = torch.clamp(t_logits, -10.0, 10.0)
    activated = torch.softmax(t_logits, dim=1)
    oracle = torch.sum(activated * torch.from_numpy(bins).reshape(1, -1, 1, 1),
                       dim=1, keepdim=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)
    assert ours.min() >= 0.5 and ours.max() <= 100.0


def test_ssim_stencil_matches_matmul_pooling():
    """FSNET_SSIM_STENCIL shifted-adds pooling == banded-matmul pooling to
    f32 reassociation noise, on pooling itself and through the SSIM map."""
    import importlib

    import numpy as np
    import jax.numpy as jnp

    sm = importlib.import_module("fsnet_tpu.ops.ssim")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    old = sm.SSIM_STENCIL
    try:
        sm.SSIM_STENCIL = False
        pool_ref = sm._avg_pool_same(x, 3, 1)
        ssim_ref = sm.ssim(x, y)
        sm.SSIM_STENCIL = True
        pool_st = sm._avg_pool_same(x, 3, 1)
        ssim_st = sm.ssim(x, y)
    finally:
        sm.SSIM_STENCIL = old
    np.testing.assert_allclose(np.asarray(pool_st), np.asarray(pool_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ssim_st), np.asarray(ssim_ref),
                               atol=1e-5)
