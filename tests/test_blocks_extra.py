"""Extended blocks: FPN shapes, ASPP, reg3d, convex upsample vs torch oracle."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fsnet_tpu.models.blocks_extra import (
    ASPP, ConvexUpsampleLayer, PyramidFeatures, Reg3D, UpsampleFPN,
    convex_upsample, localmax, modified_smoothed_l1,
)


def test_pyramid_features_shapes():
    model = PyramidFeatures(feature_size=32)
    C3 = jnp.zeros((1, 16, 24, 64))
    C4 = jnp.zeros((1, 8, 12, 128))
    C5 = jnp.zeros((1, 4, 6, 256))
    variables = model.init(jax.random.PRNGKey(0), [C3, C4, C5])
    P3, P4, P5, P6 = model.apply(variables, [C3, C4, C5])
    assert P3.shape == (1, 16, 24, 32)
    assert P4.shape == (1, 8, 12, 32)
    assert P5.shape == (1, 4, 6, 32)
    assert P6.shape == (1, 2, 3, 32)


def test_upsample_fpn_shapes():
    model = UpsampleFPN(feature_size=32)
    C3 = jnp.zeros((1, 16, 24, 64))
    C4 = jnp.zeros((1, 8, 12, 128))
    C5 = jnp.zeros((1, 4, 6, 256))
    variables = model.init(jax.random.PRNGKey(0), [C3, C4, C5])
    (P3,) = model.apply(variables, [C3, C4, C5])
    assert P3.shape == (1, 16, 24, 32)


def test_aspp_shapes():
    model = ASPP(depth=16, num_classes=4)
    x = jnp.zeros((1, 24, 32, 64))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 24, 32, 4)


def test_reg3d_shapes():
    model = Reg3D(base_channels=4, down_size=3)
    x = jnp.zeros((1, 8, 16, 16, 4))  # [B, D, H, W, C]
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 8, 16, 16)


def test_modified_smoothed_l1_vs_torch():
    rng = np.random.RandomState(0)
    deltas = rng.randn(100).astype(np.float32) * 3
    targets = rng.randn(100).astype(np.float32) * 3
    sigma = 2.0
    ours = np.asarray(modified_smoothed_l1(jnp.asarray(deltas),
                                           jnp.asarray(targets), sigma))
    sigma2 = sigma * sigma
    d = torch.from_numpy(deltas) - torch.from_numpy(targets)
    o1 = d * d * 0.5 * sigma2
    o2 = torch.abs(d) - 0.5 / sigma2
    c1 = (d < (1.0 / sigma2)).float()
    oracle = (o1 * c1 + o2 * (1 - c1)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_convex_upsample_vs_torch():
    rng = np.random.RandomState(0)
    B, H, W, scale = 2, 6, 8, 2
    depth = rng.rand(B, H, W).astype(np.float32)
    mask = rng.randn(B, H, W, 9 * 16).astype(np.float32)

    ours = np.asarray(convex_upsample(jnp.asarray(depth), jnp.asarray(mask),
                                      scale))

    # torch oracle (reference blocks.py:402-416)
    d_t = torch.from_numpy(depth).unsqueeze(1)
    m_t = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m_t = m_t.view(B, 9, 4, 4, H, W)
    m_t = torch.softmax(m_t, dim=1)
    up_ = F.unfold(F.pad(d_t, [1, 1, 1, 1], mode="reflect"), [3, 3], padding=0)
    up_ = up_.view(B, 9, 1, 1, H, W)
    up_ = torch.sum(m_t * up_, dim=1)
    oracle = up_.permute(0, 3, 1, 4, 2).reshape(B, 4 * H, 4 * W).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_localmax():
    B, H, W, D = 1, 4, 4, 16
    rng = np.random.RandomState(0)
    prob = jax.nn.softmax(jnp.asarray(rng.randn(B, H, W, D) * 3), axis=-1)
    bins = jnp.linspace(1.0, 80.0, D).reshape(1, 1, 1, D)
    depth = np.asarray(localmax(prob, radius=2, casbin=D, depth_bins=bins))
    assert depth.shape == (B, H, W, 1)
    assert depth.min() >= 1.0 and depth.max() <= 80.0
