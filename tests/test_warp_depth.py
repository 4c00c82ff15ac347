"""Depth-direct Pallas warp (prep kernel fused grid chain) vs the grid route.

The oracle is the einsum band warp fed by ``reproject`` grids — the exact
XLA path the prep kernel replaces (``ops/warp_depth.py`` module docstring).
Interpret mode on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import fsnet_tpu.ops.pallas.warp_kernel as wk
import fsnet_tpu.ops.warp_depth as wd
from fsnet_tpu.ops.geometry import invert_K, reproject
from fsnet_tpu.ops.warp import _unnormalize
from fsnet_tpu.ops.warp_fast import grid_sample_band


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(wk.pl, "pallas_call", patched)


def _scene(rng, S, F, B, H, W, C):
    """Synthetic depth + KITTI-like intrinsics/motions + images."""
    image = jnp.asarray(rng.rand(F * B, H, W, C).astype(np.float32))
    # smooth positive depth (plane + bumps), per (s, b)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = 8.0 + 4.0 * np.sin(xs / W * 4.0)[None] \
        + rng.rand(S * B, 1, 1) * 6.0
    depth = jnp.asarray((base + 2.0 * np.cos(ys / H * 3.0)[None])
                        .astype(np.float32))
    K = np.zeros((B, 4, 4), np.float32)
    K[:, 0, 0] = 0.58 * W
    K[:, 1, 1] = 1.92 * H
    K[:, 0, 2] = 0.5 * W
    K[:, 1, 2] = 0.5 * H
    K[:, 2, 2] = 1.0
    K[:, 3, 3] = 1.0
    Ts = np.tile(np.eye(4, dtype=np.float32), (F, B, 1, 1))
    for f in range(F):
        for b in range(B):
            ang = (rng.rand(3) - 0.5) * 0.01          # ~+-0.3 deg
            Ts[f, b, :3, 3] = (rng.rand(3) - 0.5) * np.array([0.2, 0.1, 1.4])
            Ts[f, b, 0, 1] = -ang[2]
            Ts[f, b, 1, 0] = ang[2]
            Ts[f, b, 0, 2] = ang[1]
            Ts[f, b, 2, 0] = -ang[1]
            Ts[f, b, 1, 2] = -ang[0]
            Ts[f, b, 2, 1] = ang[0]
    return image, depth, jnp.asarray(K), jnp.asarray(Ts)


def _grid_route(image, depth, K, inv_K, Ts, S, F, band):
    B, H, W = depth.shape[0] // S, depth.shape[1], depth.shape[2]
    d4 = depth.reshape(S, B, H, W, 1)
    grids = jax.vmap(lambda d: jax.vmap(
        lambda T: reproject(d, K, inv_K, T))(Ts))(d4)   # [S, F, B, H, W, 2]
    gf = grids.reshape(S * F * B, H, W, 2)
    out = grid_sample_band(image, gf, padding_mode="border", band=band)
    xu = _unnormalize(gf[..., 0], W, True)
    yu = _unnormalize(gf[..., 1], H, True)
    overlap = ((xu >= -0.5) & (xu < W - 0.5)
               & (yu >= -0.5) & (yu < H - 0.5))
    return out, overlap


@pytest.mark.parametrize("W,band", [(256, 8), (128, 4)])
def test_warp_depth_forward_matches_grid_route(W, band):
    S, F, B, H, C = 2, 2, 2, 16, 3
    rng = np.random.RandomState(0)
    image, depth, K, Ts = _scene(rng, S, F, B, H, W, C)
    inv_K = invert_K(K)
    arows = wd.make_affine_rows(K, inv_K, Ts, S)
    out, overlap = wd.warp_depth_fused(image, depth, arows, S, F, band)
    ref, ref_ov = _grid_route(image, depth, K, inv_K, Ts, S, F, band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # overlap: identical up to the normalize/unnormalize rounding of the
    # grid route at the exact +-0.5 boundaries (measure disagreement rate)
    agree = np.mean(np.asarray(overlap) == np.asarray(ref_ov))
    assert agree > 0.9999, agree


def test_warp_depth_grad_matches_grid_route():
    S, F, B, H, W, C, band = 2, 2, 1, 16, 256, 3, 8
    rng = np.random.RandomState(1)
    image, depth, K, Ts = _scene(rng, S, F, B, H, W, C)
    inv_K = invert_K(K)
    arows = wd.make_affine_rows(K, inv_K, Ts, S)

    def loss_direct(d):
        out, _ = wd.warp_depth_fused(image, d, arows, S, F, band)
        return jnp.sum(jnp.sin(out * 3.0))

    def loss_grid(d):
        d4 = d.reshape(S, B, H, W, 1)
        grids = jax.vmap(lambda dd: jax.vmap(
            lambda T: reproject(dd, K, inv_K, T))(Ts))(d4)
        out = grid_sample_band(image, grids.reshape(S * F * B, H, W, 2),
                               padding_mode="border", band=band)
        return jnp.sum(jnp.sin(out * 3.0))

    g_direct = jax.grad(loss_direct)(depth)
    g_grid = jax.grad(loss_grid)(depth)
    scale = float(jnp.max(jnp.abs(g_grid))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_direct) / scale,
                               np.asarray(g_grid) / scale, atol=2e-4)


def test_warp_depth_bf16_packed_path():
    """bf16 images take the row-pair packed kernels; forward must equal the
    f32-image direct path bf16-rounded, and the depth grad must stay close
    to the f32 one (bf16 kernel arithmetic)."""
    S, F, B, H, W, C, band = 1, 2, 2, 16, 256, 3, 8
    rng = np.random.RandomState(2)
    image, depth, K, Ts = _scene(rng, S, F, B, H, W, C)
    inv_K = invert_K(K)
    arows = wd.make_affine_rows(K, inv_K, Ts, S)
    img_bf = image.astype(jnp.bfloat16)

    out_bf, ov_bf = wd.warp_depth_fused(img_bf, depth, arows, S, F, band)
    out_f32, ov_f32 = wd.warp_depth_fused(
        img_bf.astype(jnp.float32), depth, arows, S, F, band)
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf, dtype=np.float32),
        np.asarray(out_f32.astype(jnp.bfloat16), dtype=np.float32),
        atol=1e-2)
    assert bool(jnp.all(ov_bf == ov_f32))

    g_bf = jax.grad(lambda d: jnp.sum(
        jnp.sin(wd.warp_depth_fused(img_bf, d, arows, S, F, band)[0]
                .astype(jnp.float32) * 3.0)))(depth)
    g_f = jax.grad(lambda d: jnp.sum(
        jnp.sin(wd.warp_depth_fused(img_bf.astype(jnp.float32), d, arows,
                                    S, F, band)[0] * 3.0)))(depth)
    scale = float(jnp.max(jnp.abs(g_f))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_bf) / scale,
                               np.asarray(g_f) / scale, atol=0.05)


@pytest.mark.heavy
def test_flagship_loss_depth_direct_matches_grid_route(monkeypatch):
    """Decoder integration: the depth-direct dispatch in _warp_all (forced
    on, interpret kernels) must reproduce the grid-route loss and parameter
    gradients on the full flagship model."""
    import fsnet_tpu.models.heads.monodepth2_decoder as md
    from fsnet_tpu.models import MonoDepthWPose
    from test_models import _flagship_cfg, _synthetic_batch

    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0), batch=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "loss_noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, {"is_training": True})

    def lossfn(params, direct):
        monkeypatch.setattr(md, "warp_depth_supported",
                            (lambda *a: True) if direct else (lambda *a: False))
        out, _ = model.apply({**variables, "params": params}, batch,
                             {"is_training": True},
                             rngs={"loss_noise": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        return out["loss"]

    p = variables["params"]
    l0, g0 = jax.value_and_grad(lambda q: lossfn(q, False))(p)
    l1, g1 = jax.value_and_grad(lambda q: lossfn(q, True))(p)
    assert abs(float(l0) - float(l1)) < 2e-5, (float(l0), float(l1))
    scale = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g0))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-4 * max(scale, 1.0)


def test_warp_depth_cmajor_matches_nhwc():
    """The channel-major emission (wk.CMAJOR_OUT / warp_depth_fused_cm)
    must be a pure LAYOUT change: NCHW forward == transposed NHWC forward
    bit-for-bit, same overlap, same depth gradient."""
    S, F, B, H, W, C, band = 2, 2, 1, 16, 256, 3, 8
    rng = np.random.RandomState(3)
    image, depth, K, Ts = _scene(rng, S, F, B, H, W, C)
    inv_K = invert_K(K)
    arows = wd.make_affine_rows(K, inv_K, Ts, S)

    def loss_nhwc(d):
        out, ov = wd.warp_depth_fused(image, d, arows, S, F, band)
        return jnp.sum(jnp.sin(out * 3.0)), (out, ov)

    def loss_cm(d):
        out, ov = wd.warp_depth_fused_cm(image, d, arows, S, F, band)
        return jnp.sum(jnp.sin(out * 3.0)), (out, ov)

    (v0, (o0, ov0)), g0 = jax.value_and_grad(loss_nhwc, has_aux=True)(depth)
    (v1, (o1, ov1)), g1 = jax.value_and_grad(loss_cm, has_aux=True)(depth)
    assert o1.shape == (S * F * B, C, H, W)
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(o1, 1, 3)),
                                  np.asarray(o0))
    np.testing.assert_array_equal(np.asarray(ov1), np.asarray(ov0))
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5,
                               atol=1e-7)


def test_warp_depth_cmajor_bf16_packed():
    """cmajor on the bf16 row-pair packed kernels (the production combo)."""
    S, F, B, H, W, C, band = 1, 2, 2, 16, 256, 3, 8
    rng = np.random.RandomState(4)
    image, depth, K, Ts = _scene(rng, S, F, B, H, W, C)
    inv_K = invert_K(K)
    arows = wd.make_affine_rows(K, inv_K, Ts, S)
    img_bf = image.astype(jnp.bfloat16)

    out_n, ov_n = wd.warp_depth_fused(img_bf, depth, arows, S, F, band)
    out_c, ov_c = wd.warp_depth_fused_cm(img_bf, depth, arows, S, F, band)
    assert out_c.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(out_c, 1, 3), dtype=np.float32),
        np.asarray(out_n, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(ov_c), np.asarray(ov_n))
