"""Deformable conv tests: zero-offset equivalence with plain conv, image
gradients through the band warp, torch oracle parity."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from fsnet_tpu.ops.dcn import modulated_deform_conv
from fsnet_tpu.ops.warp import grid_sample as gs_exact
from fsnet_tpu.ops.warp_fast import grid_sample_band

RNG = np.random.RandomState(0)


def test_zero_offset_equals_conv():
    """With zero offsets and unit masks, DCN == standard conv (zeros pad)."""
    B, H, W, Cin, Cout, K = 1, 10, 12, 4, 6, 3
    x = RNG.rand(B, H, W, Cin).astype(np.float32)
    weight = RNG.randn(K, K, Cin, Cout).astype(np.float32) * 0.1
    offset = np.zeros((B, H, W, 2 * K * K), np.float32)
    mask = np.ones((B, H, W, K * K), np.float32)

    ours = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), stride=1, padding=1, warp_band=6))

    oracle = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(weight).permute(3, 2, 0, 1),
        stride=1, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_torchvision_style_offsets():
    """Fractional offsets vs a torch oracle built from grid_sample math."""
    B, H, W, Cin, Cout, K = 1, 8, 10, 3, 5, 3
    x = RNG.rand(B, H, W, Cin).astype(np.float32)
    weight = RNG.randn(K, K, Cin, Cout).astype(np.float32) * 0.1
    offset = (RNG.rand(B, H, W, 2 * K * K).astype(np.float32) - 0.5) * 2.0
    mask = RNG.rand(B, H, W, K * K).astype(np.float32)

    ours = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), stride=1, padding=1, warp_band=8))

    # oracle: manual tap-by-tap bilinear sampling in numpy/torch
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # [B, C, H, W]
    out = torch.zeros(B, Cout, H, W)
    base_y, base_x = torch.meshgrid(
        torch.arange(H, dtype=torch.float32) - 1,
        torch.arange(W, dtype=torch.float32) - 1, indexing="ij")
    off = torch.from_numpy(offset).reshape(B, H, W, K * K, 2)
    m = torch.from_numpy(mask)
    for ky in range(K):
        for kx in range(K):
            tap = ky * K + kx
            sy = base_y + ky + off[0, ..., tap, 0]
            sx = base_x + kx + off[0, ..., tap, 1]
            gx = sx / (W - 1) * 2 - 1
            gy = sy / (H - 1) * 2 - 1
            grid = torch.stack([gx, gy], dim=-1)[None]
            sampled = torch.nn.functional.grid_sample(
                xt, grid, mode="bilinear", padding_mode="zeros",
                align_corners=True)  # [B, C, H, W]
            sampled = sampled * m[0, None, None, :, :, tap]
            w_t = torch.from_numpy(weight[ky, kx])  # [Cin, Cout]
            out += torch.einsum("bchw,cd->bdhw", sampled, w_t)
    oracle = out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_image_gradient_through_band_warp():
    """image_grad=True must give the exact-gather image cotangent."""
    B, H, W, C = 1, 16, 20, 2
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray((RNG.rand(B, H, W, 2) * 1.8 - 0.9).astype(np.float32))

    g_exact = jax.grad(lambda im: jnp.sum(
        gs_exact(im, grid, padding_mode="zeros") ** 2))(img)
    g_fast = jax.grad(lambda im: jnp.sum(
        grid_sample_band(im, grid, padding_mode="zeros", band=H,
                         image_grad=True) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_exact),
                               atol=1e-4)


def test_dcn_gradients_flow():
    B, H, W, Cin, Cout, K = 1, 8, 8, 2, 3, 3
    x = jnp.asarray(RNG.rand(B, H, W, Cin).astype(np.float32))
    weight = jnp.asarray(RNG.randn(K, K, Cin, Cout).astype(np.float32) * 0.1)
    offset = jnp.asarray(RNG.randn(B, H, W, 2 * K * K).astype(np.float32) * 0.3)
    mask = jnp.asarray(RNG.rand(B, H, W, K * K).astype(np.float32))

    def loss(x_, off_, m_, w_):
        return jnp.sum(modulated_deform_conv(x_, off_, m_, w_, warp_band=8) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for gname, g in zip(("x", "offset", "mask", "weight"), grads):
        assert np.all(np.isfinite(np.asarray(g))), gname
        assert float(jnp.max(jnp.abs(g))) > 0, gname
