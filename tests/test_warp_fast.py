"""Band-warp correctness: must match the exact gather grid_sample whenever the
per-row vertical spread fits in the band."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsnet_tpu.ops.warp import grid_sample as gs_exact
from fsnet_tpu.ops.warp_fast import grid_sample_band

RNG = np.random.RandomState(0)


def _warp_grid(B, H, W, max_dy=3.0, max_dx=30.0, beyond_border=False):
    """Smooth warp-like grid: identity + bounded smooth displacement."""
    u = np.tile(np.linspace(-1, 1, W)[None, None, :], (B, H, 1))
    v = np.tile(np.linspace(-1, 1, H)[None, :, None], (B, 1, W))
    ph = RNG.rand(B, 1, 1) * 6.28
    dx = max_dx * np.sin(v * 3 + ph) * np.cos(u * 2) * 2 / (W - 1)
    dy = max_dy * np.cos(u * 4 + ph) * 2 / (H - 1)
    if beyond_border:
        dx = dx + 0.4 * np.sign(u)  # push samples past the borders
    return np.stack([u + dx, v + dy], axis=-1).astype(np.float32)


@pytest.mark.parametrize("mode,padding_mode", [
    ("bilinear", "border"), ("bilinear", "zeros"),
    ("nearest", "border"), ("nearest", "zeros"),
])
def test_band_matches_exact(mode, padding_mode):
    B, H, W, C = 2, 48, 64, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(_warp_grid(B, H, W))

    exact = gs_exact(img, grid, mode=mode, padding_mode=padding_mode)
    fast = grid_sample_band(img, grid, mode=mode, padding_mode=padding_mode,
                            band=16)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_band_matches_exact_beyond_border():
    B, H, W, C = 2, 32, 48, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(_warp_grid(B, H, W, beyond_border=True))
    for pad in ("border", "zeros"):
        exact = gs_exact(img, grid, padding_mode=pad)
        fast = grid_sample_band(img, grid, padding_mode=pad, band=16)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   atol=1e-5)


def test_band_covers_full_height_when_band_large():
    """band >= H must be exact for ANY warp, including vertical folds."""
    B, H, W, C = 1, 24, 32, 2
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray((RNG.rand(B, H, W, 2) * 2.4 - 1.2).astype(np.float32))
    exact = gs_exact(img, grid)
    fast = grid_sample_band(img, grid, band=H)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_band_gradients_match_exact():
    B, H, W, C = 1, 24, 32, 1
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(_warp_grid(B, H, W, max_dy=2.0, max_dx=6.0))

    g_exact = jax.grad(lambda g: jnp.sum(gs_exact(img, g) ** 2))(grid)
    g_fast = jax.grad(lambda g: jnp.sum(
        grid_sample_band(img, g, band=12) ** 2))(grid)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_exact),
                               atol=1e-4)


def test_band_gradients_match_exact_zeros_padding():
    B, H, W, C = 1, 24, 32, 1
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(_warp_grid(B, H, W, max_dy=2.0, max_dx=6.0,
                                  beyond_border=True))
    g_exact = jax.grad(lambda g: jnp.sum(
        gs_exact(img, g, padding_mode="zeros") ** 2))(grid)
    g_fast = jax.grad(lambda g: jnp.sum(
        grid_sample_band(img, g, padding_mode="zeros", band=12) ** 2))(grid)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_exact),
                               atol=1e-4)


def test_analytic_inbounds_equals_ones_nearest_warp():
    """The decoder's analytic overlap mask must equal the nearest/zeros warp
    of an all-ones mask (the reference's default patched_mask path)."""
    import numpy as np
    import jax.numpy as jnp
    from fsnet_tpu.ops.warp import _unnormalize
    from fsnet_tpu.ops.warp_fast import grid_sample

    N, H, W = 2, 16, 32
    rng = np.random.RandomState(0)
    ones = jnp.ones((N, H, W, 1), jnp.float32)
    grid = jnp.asarray((rng.rand(N, H, W, 2) * 2.6 - 1.3).astype(np.float32))

    warped = grid_sample(ones, grid, mode="nearest", padding_mode="zeros",
                         align_corners=True, impl="band", band=16)
    ref = np.asarray(warped[..., 0] == 1.0)

    xu = _unnormalize(grid[..., 0], W, True)
    yu = _unnormalize(grid[..., 1], H, True)
    ana = np.asarray((xu >= -0.5) & (xu < W - 0.5)
                     & (yu >= -0.5) & (yu < H - 0.5))
    np.testing.assert_array_equal(ana, ref)
