"""Fused Pallas packed-conv kernel (interpret mode on CPU) vs the XLA
block-Toeplitz packed conv: forward, input/weight/bias cotangents, both pad
modes, single- and multi-part inputs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import fsnet_tpu.ops.pallas.conv_kernel as ck
from fsnet_tpu.ops import fast_conv as fc


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(ck.pl, "pallas_call", patched)


def _loss(out):
    return jnp.sum(out.astype(jnp.float32) ** 2)


def _compare(f_ref, f_pal, args, atol=1e-4):
    out_ref = f_ref(*args)
    out_pal = f_pal(*args)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=atol, rtol=1e-5)
    n = len(args)
    gr = jax.grad(lambda *a: _loss(f_ref(*a)), argnums=tuple(range(n)))(*args)
    gp = jax.grad(lambda *a: _loss(f_pal(*a)), argnums=tuple(range(n)))(*args)
    for i, (a, b) in enumerate(zip(gr, gp)):
        ra, rb = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            rb, ra, atol=1e-3 * max(1.0, np.abs(ra).max()), rtol=1e-3,
            err_msg=f"grad argnum {i}")


@pytest.mark.parametrize("pad_mode", ["zeros", "replicate"])
def test_pallas_conv_single_part(pad_mode):
    B, H, W, C, Co = 2, 16, 128, 16, 16
    P = 128 // Co
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(Co).astype(np.float32) * 0.1)
    xp = fc.pack_width(x, P)

    _compare(
        lambda xp_, w_, b_: fc._conv3x3_forward([xp_], [C], w_, b_, pad_mode),
        lambda xp_, w_, b_: fc._conv3x3_pallas_cvjp((xp_,), w_, b_, (C,),
                                                    pad_mode),
        (xp, w, b))


@pytest.mark.parametrize("pad_mode", ["zeros", "replicate"])
def test_pallas_conv_two_part(pad_mode):
    """Channel-concat semantics across two parts at different pack factors
    (the trunk's skip concat): C=(32, 64) -> Co=32, P=4, part PCs 128/256."""
    B, H, W = 2, 8, 64
    C1, C2, Co = 32, 64, 32
    P = 128 // Co
    rng = np.random.RandomState(1)
    x1 = jnp.asarray(rng.randn(B, H, W, C1).astype(np.float32))
    x2 = jnp.asarray(rng.randn(B, H, W, C2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C1 + C2, Co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(Co).astype(np.float32) * 0.1)
    p1 = fc.pack_width(x1, 2)      # different incoming pack factors
    p2 = fc.pack_width(x2, 1)

    _compare(
        lambda a, c, w_, b_: fc._conv3x3_forward([a, c], [C1, C2], w_, b_,
                                                 pad_mode),
        lambda a, c, w_, b_: fc._conv3x3_pallas_cvjp((a, c), w_, b_,
                                                     (C1, C2), pad_mode),
        (p1, p2, w, b))


def test_pallas_conv_vs_native_nn_conv():
    """End-to-end against jax's native conv (not just the XLA packed path):
    zeros padding, C=16 -> Co=16."""
    B, H, W, C, Co = 1, 16, 128, 16, 16
    P = 128 // Co
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
    out = fc._conv3x3_pallas_cvjp((fc.pack_width(x, P),), w, None, (C,),
                                  "zeros")
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(fc.unpack_width(out, Co)),
                               np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_pallas_conv_odd_height():
    """H not divisible by the default group: _group degrades, kernel stays
    exact (H=12 -> G=4)."""
    B, H, W, C, Co = 1, 12, 128, 16, 16
    P = 128 // Co
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(Co).astype(np.float32) * 0.1)
    xp = fc.pack_width(x, P)
    _compare(
        lambda xp_, w_, b_: fc._conv3x3_forward([xp_], [C], w_, b_,
                                                "replicate"),
        lambda xp_, w_, b_: fc._conv3x3_pallas_cvjp((xp_,), w_, b_, (C,),
                                                    "replicate"),
        (xp, w, b))


def test_conv_kernel_gate_requires_aligned_nb():
    """NB must be a whole number of 8-sublane tiles: the scale-2/3 dispconvs
    (Co=16 -> P=8, W=160/80 -> NB=20/10) sublane-pad the HBM memref so the
    row-window DMA cannot slice it (Mosaic alignment crash, round 2); they
    must fall back to XLA."""
    from fsnet_tpu.ops.pallas import conv_kernel as ck

    for dt in (jnp.float32, jnp.bfloat16):
        assert ck.conv_kernel_supported(24, 512, 128, dt)       # aligned
        assert not ck.conv_kernel_supported(20, 512, 128, dt)   # W=160 P=8
        assert not ck.conv_kernel_supported(10, 512, 128, dt)   # W=80  P=8
        assert not ck.conv_kernel_supported(4, 512, 128, dt)    # too small
    assert not ck.conv_kernel_supported(24, 512, 128, jnp.float64)
    assert not ck.conv_kernel_supported(24, 500, 128, jnp.float32)  # lanes


@pytest.mark.parametrize("nparts", [1, 2])
def test_pallas_conv_bn_moments(monkeypatch, nparts):
    """conv3x3_packed_bn (moments epilogue + in-kernel multi-part
    accumulation) == conv3x3_packed + explicit XLA moments: forward,
    moments, and all cotangents including the moment cotangents."""
    B, H, W, C, Co = 2, 16, 128, 16, 16
    P = 128 // Co
    rng = np.random.RandomState(5)
    Cs = [C] * nparts
    parts = [fc.pack_width(
        jnp.asarray(rng.randn(B, H, W, c).astype(np.float32)), 128 // c)
        for c in Cs]
    w = jnp.asarray(rng.randn(3, 3, sum(Cs), Co).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.randn(Co).astype(np.float32)) * 0.1
    xp = parts[0] if nparts == 1 else tuple(parts)
    Carg = Cs[0] if nparts == 1 else tuple(Cs)

    def ref(w, b, *ps):
        x = ps[0] if nparts == 1 else tuple(ps)
        out = fc.conv3x3_packed(x, w, b, C=Carg, pad_mode="zeros")
        xf = out.astype(jnp.float32)
        return out, jnp.sum(xf, axis=(0, 1, 2)), \
            jnp.sum(xf * xf, axis=(0, 1, 2))

    def pal(w, b, *ps):
        x = ps[0] if nparts == 1 else tuple(ps)
        return fc.conv3x3_packed_bn(x, w, b, C=Carg, pad_mode="zeros")

    monkeypatch.setattr(fc, "PALLAS_CONV", False)
    o_r, s1_r, s2_r = ref(w, b, *parts)
    monkeypatch.setattr(fc, "PALLAS_CONV", True)
    monkeypatch.setattr(fc, "_pallas_conv_supported", lambda *a: True)
    o_p, s1_p, s2_p = pal(w, b, *parts)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1_p), np.asarray(s1_r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_r),
                               rtol=1e-5, atol=1e-3)

    # gradients, with loss touching out AND both moment outputs
    def loss(f):
        def inner(w, b, *ps):
            out, s1, s2 = f(w, b, *ps)
            return (jnp.sum(out.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.sin(s1)) + 1e-3 * jnp.sum(jnp.cos(s2)))
        return inner

    n = 2 + nparts
    monkeypatch.setattr(fc, "PALLAS_CONV", False)
    gr = jax.grad(loss(ref), argnums=tuple(range(n)))(w, b, *parts)
    monkeypatch.setattr(fc, "PALLAS_CONV", True)
    gp = jax.grad(loss(pal), argnums=tuple(range(n)))(w, b, *parts)
    for i, (a, bb) in enumerate(zip(gr, gp)):
        ra, rb = np.asarray(a), np.asarray(bb)
        np.testing.assert_allclose(
            rb, ra, atol=2e-3 * max(1.0, np.abs(ra).max()), rtol=2e-3,
            err_msg=f"grad argnum {i}")
