"""Backbone family tests: ConvNeXt + ManyDepth cost-volume encoder shapes."""
import numpy as np

import jax
import jax.numpy as jnp


def _jit_init_apply(model, *args, **apply_kw):
    """init + forward, both jitted: eager per-op dispatch of a full backbone
    costs tens of seconds per call on the single-core CI box, while jitted
    graphs land in the persistent compile cache (conftest)."""
    variables = jax.jit(lambda k, *a: model.init(k, *a, train=False))(
        jax.random.PRNGKey(0), *args)
    out = jax.jit(lambda v, *a: model.apply(v, *a, train=False, **apply_kw))(
        variables, *args)
    return variables, out

from fsnet_tpu.models.backbones.convnext import convNext
from fsnet_tpu.models.backbones.resnet_matching import ResnetEncoderMatching


def test_convnext_tiny_pyramid():
    model = convNext("ConvNeXt-T", out_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 96, 3))
    _, feats = _jit_init_apply(model, x)
    assert [f.shape for f in feats] == [
        (1, 16, 24, 96), (1, 8, 12, 192), (1, 4, 6, 384), (1, 2, 3, 768)]


def test_resnet_matching_cost_volume():
    H, W = 64, 96
    B, F = 2, 1
    model = ResnetEncoderMatching(
        depth=18, input_height=H, input_width=W,
        min_depth_bin=0.5, max_depth_bin=20.0, num_depth_bins=12)

    rng = np.random.RandomState(0)
    current = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    lookup = jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, F, 1, 1))
    poses[:, :, 0, 3] = 0.3
    P2 = np.zeros((B, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = 0.58 * W
    P2[:, 0, 2], P2[:, 1, 2], P2[:, 2, 2] = W / 2, H / 2, 1.0

    _, out = _jit_init_apply(model, current, lookup, jnp.asarray(poses),
                             jnp.asarray(P2), mutable=["batch_stats"])
    feats, lowest_cost, conf = out[0]

    assert len(feats) == 5
    assert feats[0].shape == (B, H // 2, W // 2, 64)
    assert feats[1].shape == (B, H // 4, W // 4, 64)
    assert feats[4].shape == (B, H // 32, W // 32, 512)
    assert lowest_cost.shape == (B, H // 4, W // 4)
    assert conf.shape == (B, H // 4, W // 4)
    assert np.all(np.isfinite(np.asarray(lowest_cost)))


def test_resnet_matching_missing_frame_skipped():
    """Zero pose marks a missing lookup frame; cost volume must still be
    finite and the confidence mask all-zero (no observations)."""
    H, W = 32, 48
    model = ResnetEncoderMatching(depth=18, input_height=H, input_width=W,
                                  num_depth_bins=6)
    rng = np.random.RandomState(0)
    current = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    lookup = jnp.asarray(rng.rand(1, 1, H, W, 3).astype(np.float32))
    poses = jnp.zeros((1, 1, 4, 4))
    P2 = np.zeros((1, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = 30.0
    P2[:, 0, 2], P2[:, 1, 2], P2[:, 2, 2] = W / 2, H / 2, 1.0

    _, out = _jit_init_apply(model, current, lookup, poses, jnp.asarray(P2),
                             mutable=["batch_stats"])
    (feats, lowest_cost, conf), _ = out
    assert np.all(np.asarray(conf) == 0)
    assert np.all(np.isfinite(np.asarray(feats[-1])))


def test_swin_tiny_pyramid():
    from fsnet_tpu.models.backbones.swin_transformer import swinTransformer
    # window-divisible resolutions required (as in the torch reference)
    model = swinTransformer("Swin-T", window_size=3, drop_path_rate=0.0,
                            output_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 96, 96, 3))
    _, feats = _jit_init_apply(model, x)
    # scales: 1/4 (embed), 1/8, 1/16, 1/32 (last stage has no merge)
    assert feats[0].shape == (1, 24, 24, 96)
    assert feats[1].shape == (1, 12, 12, 192)
    assert feats[2].shape == (1, 6, 6, 384)
    assert feats[3].shape == (1, 3, 3, 768)


def test_vit_single_scale():
    from fsnet_tpu.models.backbones.vit import vit
    model = vit("B_16", num_layers=2, dropout_rate=0.0)
    x = jnp.zeros((1, 64, 96, 3))
    _, feats = _jit_init_apply(model, x)
    assert len(feats) == 1
    assert feats[0].shape == (1, 4, 6, 768)


def test_dla34_pyramid():
    from fsnet_tpu.models.backbones.dla import dlanet
    model = dlanet(34, out_indices=(-1, 0, 1, 2, 3, 4, 5))
    x = jnp.zeros((1, 64, 64, 3))
    _, feats = _jit_init_apply(model, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 64, 64, 16), (1, 64, 64, 16), (1, 32, 32, 32), (1, 16, 16, 64),
        (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_dla_seg_upsample():
    from fsnet_tpu.models.backbones.dla import dlanet
    from fsnet_tpu.models.backbones.dla_utils import DLASegUpsample
    trunk = dlanet(34, out_indices=(0, 1, 2, 3, 4, 5))
    x = jnp.zeros((1, 64, 64, 3))
    _, feats = _jit_init_apply(trunk, x)

    head = DLASegUpsample(input_channels=(16, 32, 64, 128, 256, 512),
                          down_ratio=4, last_level=5)
    hv = jax.jit(lambda k, f: head.init(k, f, train=False))(
        jax.random.PRNGKey(1), feats)
    out = jax.jit(lambda v, f: head.apply(
        v, f, train=False, mutable=["batch_stats"]))(hv, feats)[0]
    assert out.shape == (1, 16, 16, 64)  # 1/4 resolution, first_level channels


def test_densenet_features():
    from fsnet_tpu.models.backbones.densenet import densenet
    model = densenet(121)
    x = jnp.zeros((1, 64, 96, 3))
    _, out = _jit_init_apply(model, x)
    # transition3 pool removed -> final stride 16 instead of 32
    assert out.shape == (1, 4, 6, 1024)


def test_stem_space_to_depth_exact():
    """The TPU space-to-depth stem (4x4/s1 on 2x2-regrouped pixels) must be
    bit-exact vs the canonical 7x7/s2 conv for the same [7,7,C,Co] kernel,
    for both the C=3 depth stem and the C=6 pose stem."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fsnet_tpu.models.backbones.resnet import (
        _space_to_depth2, _stem_kernel_to_s2d)

    rng = np.random.RandomState(0)
    for C in (3, 6):
        x = jnp.asarray(rng.randn(2, 32, 48, C).astype(np.float32))
        w = jnp.asarray(rng.randn(7, 7, C, 16).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            _space_to_depth2(x), _stem_kernel_to_s2d(w),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # gradients w.r.t. x and w agree too (the backward is the win)
        f_ref = lambda x_, w_: jnp.sum(jax.lax.conv_general_dilated(
            x_, w_, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)
        f_s2d = lambda x_, w_: jnp.sum(jax.lax.conv_general_dilated(
            _space_to_depth2(x_), _stem_kernel_to_s2d(w_), (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)
        gx_r, gw_r = jax.grad(f_ref, (0, 1))(x, w)
        gx_s, gw_s = jax.grad(f_s2d, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-3)
