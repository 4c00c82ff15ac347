"""SSIM dissimilarity kernels (NHWC, pure jnp).

Reference ``monodepth/networks/utils/monodepth_utils.py``: ``SSIM:184`` (avg-pool
formulation over reflection-padded windows) and ``SSIMUncer:217`` (SSIM plus the
analytic derivative d(dissim)/dy used by the uncertainty-weighted distill loss).
"""
from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _avg_pool_same(x: jnp.ndarray, kernel_size: int, padding: int) -> jnp.ndarray:
    """Reflection-pad then kernel_size x kernel_size mean pool, stride 1 (the
    reference's ``nn.ReflectionPad2d`` + ``nn.AvgPool2d(k, 1)`` pair).

    Implemented as two separable 1D depthwise convolutions: XLA's conv
    transpose (backward) is much faster on TPU than reduce_window's, and the
    SSIM backward is on the training hot path."""
    x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                mode="reflect")
    C = x.shape[-1]
    inv_k = 1.0 / kernel_size
    kernel_h = jnp.full((kernel_size, 1, 1, 1), inv_k, dtype=x.dtype)
    kernel_w = jnp.full((1, kernel_size, 1, 1), inv_k, dtype=x.dtype)
    kernel_h = jnp.tile(kernel_h, (1, 1, 1, C))
    kernel_w = jnp.tile(kernel_w, (1, 1, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(x, kernel_h, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=C)
    return lax.conv_general_dilated(x, kernel_w, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=C)


def ssim(x: jnp.ndarray, y: jnp.ndarray, kernel_size: int = 3,
         padding: int = 1) -> jnp.ndarray:
    """SSIM *dissimilarity* clamp((1 - SSIM)/2, 0, 1), elementwise over NHWC.

    Matches reference ``SSIM.forward`` (``monodepth_utils.py:199-215``).
    """
    mu_x = _avg_pool_same(x, kernel_size, padding)
    mu_y = _avg_pool_same(y, kernel_size, padding)

    sigma_x = _avg_pool_same(x * x, kernel_size, padding) - mu_x * mu_x
    sigma_y = _avg_pool_same(y * y, kernel_size, padding) - mu_y * mu_y
    sigma_xy = _avg_pool_same(x * y, kernel_size, padding) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def ssim_uncer(x0: jnp.ndarray, y0: jnp.ndarray, kernel_size: int = 3,
               padding: int = 1):
    """SSIM dissimilarity plus its analytic derivative w.r.t. y (reference
    ``SSIMUncer.forward``, ``monodepth_utils.py:220-249``). Returns (out, dout_dy)."""
    mu_x = _avg_pool_same(x0, kernel_size, padding)
    mu_y = _avg_pool_same(y0, kernel_size, padding)

    sigma_x = _avg_pool_same(x0 * x0, kernel_size, padding) - mu_x * mu_x
    sigma_y = _avg_pool_same(y0 * y0, kernel_size, padding) - mu_y * mu_y
    sigma_xy = _avg_pool_same(x0 * y0, kernel_size, padding) - mu_x * mu_y

    N = kernel_size ** 2
    dsigma_y_dy = 2.0 / N * y0 - 2.0 / N * mu_y
    dsigma_xy_dy = 1.0 / N * x0 - 1.0 / N * mu_x

    Id = mu_x ** 2 + mu_y ** 2 + _C1
    I = (2.0 * mu_x * mu_y + _C1) / Id  # noqa: E741 - matches reference naming

    Cs_n = 2.0 * sigma_xy + _C2
    Cs_d = sigma_x + sigma_y + _C2
    Cs = Cs_n / Cs_d

    dIdy = (2.0 * mu_x * (mu_x ** 2 - mu_y ** 2)) / (Id ** 2)
    dCsdy = (Cs_d * (2.0 * dsigma_xy_dy) - Cs_n * dsigma_y_dy) / (Cs_d ** 2)

    out = jnp.clip((1.0 - I * Cs) / 2.0, 0.0, 1.0)
    dout_dy = -(I * dCsdy + Cs * dIdy) / 2.0
    return out, dout_dy
