"""Width-packed decoder path (fsnet_tpu/ops/fast_conv.py): numerical
equivalence with the standard NHWC path under SHARED parameters, and the
packed conv against XLA's native conv."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsnet_tpu.ops import fast_conv as fc


def test_conv3x3_packed_matches_native():
    rng = np.random.RandomState(0)
    for C, Co, H, W, pad_mode in [(16, 16, 12, 64, "zeros"),
                                  (16, 16, 12, 64, "replicate"),
                                  (32, 16, 8, 32, "replicate"),
                                  (64, 32, 8, 32, "zeros"),
                                  (96, 32, 6, 16, "replicate")]:
        x = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
        w = jnp.asarray((rng.rand(3, 3, C, Co) - 0.5).astype(np.float32))
        b = jnp.asarray(rng.rand(Co).astype(np.float32))

        if pad_mode == "replicate":
            xp_ref = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            ref = jax.lax.conv_general_dilated(
                xp_ref, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        else:
            ref = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        out = fc.conv3x3_packed(fc.pack_width(x, 1), w, b, C=C,
                                pad_mode=pad_mode)
        out = fc.unpack_width(out, Co)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def test_conv3x3_packed_multipart_matches_concat():
    """Multi-part input (unmaterialized channel concat) == conv on the
    concatenated tensor."""
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(2, 8, 32, 32).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 8, 32, 64).astype(np.float32))
    w = jnp.asarray((rng.rand(3, 3, 96, 32) - 0.5).astype(np.float32))
    bias = jnp.asarray(rng.rand(32).astype(np.float32))

    ref = fc.conv3x3_packed(fc.pack_width(jnp.concatenate([a, b], -1), 1),
                            w, bias, C=96, pad_mode="replicate")
    out = fc.conv3x3_packed((fc.pack_width(a, 2), fc.pack_width(b, 1)),
                            w, bias, C=(32, 64), pad_mode="replicate")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_conv7x7s2_matches_native():
    rng = np.random.RandomState(2)
    for C, H, W in [(3, 32, 64), (6, 16, 32)]:
        x = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
        w = jnp.asarray((rng.rand(7, 7, C, 64) - 0.5).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = fc.conv7x7s2(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def test_upsample_concat_packed():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 16, 32).astype(np.float32))
    xp = fc.pack_width(x, 4)
    up = fc.upsample2x_packed(xp, 32)
    ref = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(np.asarray(fc.unpack_width(up, 32)),
                                  np.asarray(ref))

    y = jnp.asarray(rng.rand(2, 8, 16, 16).astype(np.float32))
    cat = fc.concat_packed(fc.pack_width(x, 4), 32, fc.pack_width(y, 4), 16, 4)
    ref = jnp.concatenate([x, y], axis=-1)
    np.testing.assert_array_equal(np.asarray(fc.unpack_width(cat, 48)),
                                  np.asarray(ref))


@pytest.mark.parametrize("train", [True, False])
def test_packed_decoder_matches_unpacked(train):
    from fsnet_tpu.models.heads.depth_decoder import MultiChannelDepthDecoder

    rng = np.random.RandomState(0)
    B, H, W = 2, 64, 128
    feats = [jnp.asarray(rng.rand(B, H // s, W // s, c).astype(np.float32))
             for s, c in [(2, 64), (4, 64), (8, 128), (16, 256), (32, 512)]]

    dec_u = MultiChannelDepthDecoder(packed=False, scales=(0, 1, 2, 3),
                                     min_depth=0.5, max_depth=100.0)
    dec_p = MultiChannelDepthDecoder(packed=True, scales=(0, 1, 2, 3),
                                     min_depth=0.5, max_depth=100.0)
    v = dec_u.init(jax.random.PRNGKey(0), feats, train=True)
    vp = dec_p.init(jax.random.PRNGKey(0), feats, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vp))

    ou, mu = jax.jit(lambda v_, f: dec_u.apply(
        v_, f, train=train, mutable=["batch_stats"]))(v, feats)
    op, mp = jax.jit(lambda v_, f: dec_p.apply(
        v_, f, train=train, mutable=["batch_stats"]))(v, feats)
    for k in ou:
        np.testing.assert_allclose(np.asarray(ou[k]), np.asarray(op[k]),
                                   atol=5e-4, rtol=1e-3, err_msg=str(k))
    # BN running-stat updates agree too
    for (pu, su), (pp, sp) in zip(
            jax.tree_util.tree_leaves_with_path(mu),
            jax.tree_util.tree_leaves_with_path(mp)):
        np.testing.assert_allclose(np.asarray(su), np.asarray(sp),
                                   atol=5e-4, rtol=1e-3, err_msg=str(pu))


@pytest.mark.parametrize("pad_mode", ["zeros", "replicate"])
def test_conv3x3_packed_custom_vjp_matches_autodiff(pad_mode):
    """The hand-written packed-conv VJP (dx = packed correlation with flipped
    weights + replicate edge folds, dw = one matmul + inverse Toeplitz fold)
    must equal XLA autodiff of the forward exactly."""
    import fsnet_tpu.ops.fast_conv as fc

    rng = np.random.RandomState(11)
    B, H, W, Cs, Co = 2, 8, 64, (32, 16), 64
    parts = tuple(
        jnp.asarray(rng.randn(B, H, W // max(128 // c, 1),
                              max(128 // c, 1) * c).astype(np.float32))
        for c in Cs)
    w = jnp.asarray(rng.randn(3, 3, sum(Cs), Co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(Co).astype(np.float32) * 0.1)
    probe = None

    def loss(parts_, w_, b_, use_cvjp):
        nonlocal probe
        fc.PACKED_VJP = use_cvjp
        try:
            out = fc.conv3x3_packed(parts_, w_, b_, C=Cs, pad_mode=pad_mode)
        finally:
            fc.PACKED_VJP = True
        if probe is None:
            # numpy (not jnp): created inside the first jit trace, a jnp
            # probe would be a tracer leaking into the second jitted grad
            probe = np.cos(np.arange(int(np.prod(out.shape)),
                                     dtype=np.float32)).reshape(out.shape)
        return jnp.sum(out * probe)

    # jitted: eager per-op dispatch of the two grad graphs costs ~1 min on
    # the single-core CI box; jitted graphs hit the persistent compile cache
    ga = jax.jit(jax.grad(lambda p, w_, b_: loss(p, w_, b_, False),
                          argnums=(0, 1, 2)))(parts, w, b)
    gc = jax.jit(jax.grad(lambda p, w_, b_: loss(p, w_, b_, True),
                          argnums=(0, 1, 2)))(parts, w, b)
    for a, c in zip(jax.tree.leaves(ga), jax.tree.leaves(gc)):
        a, c = np.asarray(a), np.asarray(c)
        # f32 matmul-ordering noise only: scale atol to the tensor magnitude
        np.testing.assert_allclose(c, a, rtol=1e-4,
                                   atol=1e-5 * max(1.0, np.abs(a).max()))


def test_packed_decoder_pallas_bn_route(monkeypatch):
    """Module-level coverage of the PALLAS conv + BN-moments-epilogue route
    (round 5): on CPU the backend gate routes conv3x3_packed_bn to the XLA
    fallback, so force the pallas dispatch (interpret kernels) and assert
    the decoder still matches the unpacked reference decoder in train mode
    — conv outputs, BN batch stats, and running-stat updates."""
    import jax.experimental.pallas as pl

    import fsnet_tpu.ops.pallas.conv_kernel as ck
    from fsnet_tpu.ops import fast_conv as fc
    from fsnet_tpu.models.heads.depth_decoder import MultiChannelDepthDecoder

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(ck.pl, "pallas_call", patched)
    monkeypatch.setattr(fc, "PALLAS_CONV", True)
    real_sup = fc._pallas_conv_supported

    def sup(parts, Cs, Co):
        # keep the real shape gating, drop only the backend probe
        import unittest.mock as um

        with um.patch("jax.default_backend", return_value="tpu"):
            return real_sup(parts, Cs, Co)

    monkeypatch.setattr(fc, "_pallas_conv_supported", sup)

    rng = np.random.RandomState(1)
    B, H, W = 2, 64, 128
    feats = [jnp.asarray(rng.rand(B, H // s, W // s, c).astype(np.float32))
             for s, c in [(2, 64), (4, 64), (8, 128), (16, 256), (32, 512)]]

    dec_u = MultiChannelDepthDecoder(packed=False, scales=(0, 1, 2, 3),
                                     min_depth=0.5, max_depth=100.0)
    dec_p = MultiChannelDepthDecoder(packed=True, scales=(0, 1, 2, 3),
                                     min_depth=0.5, max_depth=100.0)
    v = dec_u.init(jax.random.PRNGKey(0), feats, train=True)

    ou, mu = dec_u.apply(v, feats, train=True, mutable=["batch_stats"])
    op, mp = dec_p.apply(v, feats, train=True, mutable=["batch_stats"])
    for k in ou:
        np.testing.assert_allclose(np.asarray(ou[k]), np.asarray(op[k]),
                                   atol=5e-4, rtol=1e-3, err_msg=str(k))
    for (pu, su), (pp, sp) in zip(
            jax.tree_util.tree_leaves_with_path(mu),
            jax.tree_util.tree_leaves_with_path(mp)):
        np.testing.assert_allclose(np.asarray(su), np.asarray(sp),
                                   atol=5e-4, rtol=1e-3, err_msg=str(pu))


@pytest.mark.parametrize("train", [True, False])
def test_batchnorm_packed_path_matches_standard(train):
    """BatchNorm(packed_C=...) on the width-packed view must equal the
    standard nn.BatchNorm path on NHWC (same params/stat names, same
    values) — the lane-full stem BN (round 5) relies on this."""
    from fsnet_tpu.models.blocks import BatchNorm
    from fsnet_tpu.ops import fast_conv as fc

    rng = np.random.RandomState(2)
    B, H, W, C = 2, 8, 32, 64
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    bn = BatchNorm()
    v = bn.init(jax.random.PRNGKey(0), x, train=True)

    ou, mu = bn.apply(v, x, train=train, mutable=["batch_stats"])
    op_p, mp = bn.apply(v, fc.pack_width(x, 2), train=train,
                        packed_C=C, mutable=["batch_stats"])
    op = fc.unpack_width(op_p, C)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ou),
                               atol=1e-5, rtol=1e-5)
    for (pu, su), (pp, sp) in zip(
            jax.tree_util.tree_leaves_with_path(mu),
            jax.tree_util.tree_leaves_with_path(mp)):
        np.testing.assert_allclose(np.asarray(sp), np.asarray(su),
                                   atol=1e-5, rtol=1e-5, err_msg=str(pu))


def test_resnet_packed_stem_matches_unpacked(monkeypatch):
    """The lane-full stem dispatch (backend-gated) must be a pure layout
    change: same outputs and batch stats as the NHWC stem path."""
    from fsnet_tpu.models.backbones.resnet import ResNet

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 128, 3).astype(np.float32))
    net = ResNet(layers=(2, 2, 2, 2), out_indices=(-1, 0, 1),
                 num_stages=2, norm_eval=False)
    v = net.init(jax.random.PRNGKey(0), x, train=True)

    outs_u, mu = net.apply(v, x, train=True, mutable=["batch_stats"])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    outs_p, mp = net.apply(v, x, train=True, mutable=["batch_stats"])
    # 1e-4 abs: the packed moments fold phases in a different summation
    # order (measured max diff 2e-5 at f32)
    for a, b in zip(outs_u, outs_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)
    for (pu, su), (pp, sp) in zip(
            jax.tree_util.tree_leaves_with_path(mu),
            jax.tree_util.tree_leaves_with_path(mp)):
        np.testing.assert_allclose(np.asarray(sp), np.asarray(su),
                                   atol=1e-4, rtol=1e-3, err_msg=str(pu))
