"""Pallas band-warp kernel (interpret mode on CPU) vs the einsum band warp."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import fsnet_tpu.ops.pallas.warp_kernel as wk
from fsnet_tpu.ops.warp_fast import _indices_and_weights, grid_sample_band


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(wk.pl, "pallas_call", patched)


def test_pallas_warp_matches_einsum_band():
    N, H, W, C = 2, 16, 32, 3
    BAND = 8
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    grid = jnp.asarray((rng.rand(N, H, W, 2) * 1.6 - 0.8).astype(np.float32))

    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    out = wk.grid_sample_band_pallas(img, iw, BAND, iw["wx0"], iw["wx1"],
                                     iw["wy0"], iw["wy1"], group=4)
    ref = grid_sample_band(img, grid, band=BAND)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_windowed_gather_w640():
    """T > 3 activates the DYNAMICALLY anchored 3-tile gather window: exact
    whenever each (row, output tile)'s samples span <= 3 aligned source
    tiles — true for any displacement field whose within-tile spread is
    modest (reprojection grids are spatially smooth), regardless of the
    displacement magnitude. Arbitrary (noise) fields stay finite,
    window-clamped."""
    N, H, W, C = 1, 8, 640, 3
    BAND = 4
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    base = np.stack([xs, ys], -1)[None].astype(np.float32)

    # smooth displacement: large magnitude (up to ~0.25 tile) but slowly
    # varying, as reprojection grids are; plus small smooth y-offsets
    dx = 0.1 * np.sin(2 * np.pi * xs + 0.7) * np.cos(np.pi * ys)
    dy = 0.01 * np.cos(np.pi * xs)
    grid = jnp.asarray(
        (base + np.stack([dx, dy], -1)[None]).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    out = wk.grid_sample_band_pallas(img, iw, BAND, iw["wx0"], iw["wx1"],
                                     iw["wy0"], iw["wy1"])
    ref = grid_sample_band(img, grid, band=BAND)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    grid2 = jnp.asarray((rng.rand(N, H, W, 2) * 1.8 - 0.9).astype(np.float32))
    iw2 = _indices_and_weights(img.shape, grid2, "bilinear", "border", True,
                               BAND)
    out2 = wk.grid_sample_band_pallas(img, iw2, BAND, iw2["wx0"], iw2["wx1"],
                                      iw2["wy0"], iw2["wy1"])
    assert bool(jnp.isfinite(out2).all())
    assert float(out2.min()) >= 0.0 and float(out2.max()) <= 1.0


def test_pallas_packed_bf16_matches_unpacked():
    """bf16 images take the row-pair packing path; results must match the
    f32 path on the same bf16-rounded data exactly (packing is lossless)."""
    N, H, W, C = 2, 16, 256, 3
    BAND = 8
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    img_bf = img.astype(jnp.bfloat16)
    grid = jnp.asarray((rng.rand(N, H, W, 2) * 1.8 - 0.9).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    args = (iw, BAND, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"])
    out_p = wk.grid_sample_band_pallas(img_bf, *args)
    out_u = wk.grid_sample_band_pallas(img_bf.astype(jnp.float32), *args)
    # the packed path stores bf16 (BF16_OUT): exact == bf16-rounded f32 result
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_p, dtype=np.float32),
        np.asarray(out_u.astype(jnp.bfloat16), dtype=np.float32), atol=1e-6)

    gcot = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    one = jnp.ones_like(iw["wx0"])
    bargs = (iw, BAND, -one, one, iw["wy0"], iw["wy1"],
             iw["wx0"], iw["wx1"], -one, one, gcot)
    ap = wk.grid_sample_band_pallas_bwd(img_bf, *bargs)
    au = wk.grid_sample_band_pallas_bwd(img_bf.astype(jnp.float32), *bargs)
    np.testing.assert_allclose(np.asarray(ap[0]), np.asarray(au[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ap[1]), np.asarray(au[1]),
                               atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_pallas_fused_backward_matches_einsum(monkeypatch, padding_mode):
    """The fused dual-output backward kernel must produce the same grid
    cotangent as the einsum difference-weight path."""
    import fsnet_tpu.ops.warp_fast as wf

    N, H, W, C = 2, 16, 128, 3
    BAND = 8
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                          indexing="ij")
    jitter = jnp.asarray((rng.rand(N, H, W, 2) * 0.3 - 0.15)
                         .astype(np.float32))
    grid = jnp.stack([xs, ys], -1)[None] + jitter

    def loss(gr, use_pallas):
        monkeypatch.setattr(wf, "_use_pallas", lambda *a: use_pallas)
        out = wf.grid_sample_band(img, gr, padding_mode=padding_mode,
                                  band=BAND)
        return jnp.sum(jnp.sin(out * 3.0))

    g_eins = jax.grad(loss)(grid, False)
    g_pal = jax.grad(loss)(grid, True)
    scale = float(jnp.max(jnp.abs(g_eins))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_pal) / scale,
                               np.asarray(g_eins) / scale, atol=1e-5)


def test_pallas_warp_group_fallback():
    """Ho not divisible by the group -> group halves until it divides."""
    N, H, W, C = 1, 12, 16, 1
    BAND = 4
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    grid = jnp.asarray((rng.rand(N, H, W, 2) * 1.5 - 0.75).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    out = wk.grid_sample_band_pallas(img, iw, BAND, iw["wx0"], iw["wx1"],
                                     iw["wy0"], iw["wy1"], group=8)
    ref = grid_sample_band(img, grid, band=BAND)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("padding_mode,border_fast", [
    ("border", False), ("border", True), ("zeros", False)])
def test_pallas_fused_fwd_vjp_kernel(padding_mode, border_fast):
    """The fused fwd+vjp kernel's (out, va, vb) must equal the forward
    dispatch run three times with the corresponding corner weights (the
    exact contract the two-pass backward relied on). ``border_fast``
    exercises the 4-row fpack specialization (mask rows elided) against the
    same oracles."""
    import fsnet_tpu.ops.warp_fast as wf

    N, H, W, C = 2, 16, 256, 3
    BAND = 8
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    grid = jnp.asarray((rng.rand(N, H, W, 2) * 1.8 - 0.9).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", padding_mode,
                              True, BAND)
    mx0, mx1, my0, my1 = wf._padding_masks(iw, padding_mode, jnp.float32)

    out, va, vb = wk.grid_sample_band_pallas_fused(
        img, iw, BAND, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"],
        mx0, mx1, my0, my1, border=border_fast)

    ref_out = wk.grid_sample_band_pallas(img, iw, BAND, iw["wx0"], iw["wx1"],
                                         iw["wy0"], iw["wy1"])
    ref_va = wk.grid_sample_band_pallas(img, iw, BAND, -mx0, mx1,
                                        iw["wy0"], iw["wy1"])
    ref_vb = wk.grid_sample_band_pallas(img, iw, BAND, iw["wx0"], iw["wx1"],
                                        -my0, my1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(va), np.asarray(ref_va), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(ref_vb), atol=1e-6)


@pytest.mark.parametrize("packed", [False, True])
def test_pallas_stacked_window_gather(monkeypatch, packed):
    """FSNET_STACK_WIN: the one-gather-per-corner windowed formulation (DMA
    kernels, granule-padded scratch) must match the per-tile gather path
    exactly — fwd, fused (out, va, vb), bf16-packed and f32, W=640 so the
    dynamic 3-tile window is active."""
    import fsnet_tpu.ops.warp_fast as wf

    # W=512 -> T=4 > kw=3 keeps the dynamic window anchor meaningful while
    # halving interpret-mode cost vs the 640/B2 original
    N, H, W, C = 1, 16, 512, 3
    BAND = 8
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    if packed:
        img = img.astype(jnp.bfloat16)
    grid = jnp.asarray((rng.rand(N, H, W, 2) * 1.8 - 0.9).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    mx0, mx1, my0, my1 = wf._padding_masks(iw, "border", jnp.float32)
    fargs = (iw, BAND, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"])

    monkeypatch.setattr(wk, "STACK_WIN", False)
    ref_fwd = wk.grid_sample_band_pallas(img, *fargs)
    ref_f = wk.grid_sample_band_pallas_fused(
        img, *fargs, mx0, mx1, my0, my1, border=True)

    monkeypatch.setattr(wk, "STACK_WIN", True)
    out_fwd = wk.grid_sample_band_pallas(img, *fargs)
    out_f = wk.grid_sample_band_pallas_fused(
        img, *fargs, mx0, mx1, my0, my1, border=True)

    np.testing.assert_allclose(np.asarray(out_fwd), np.asarray(ref_fwd),
                               atol=1e-6)
    for a, b in zip(out_f, ref_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_band4_all_paths():
    """band=4 (packed KL=6: single-vreg gather operands) must stay exact on
    every kernel path — fwd f32, fwd bf16-packed, fused (out, va, vb) — vs
    the exact warp on a smooth in-band grid. Prep for the planned band-4
    default (BASELINE.md band sweep); kernels take band as data, but KL < 8
    exercises the sub-granule DMA slice the other tests never hit."""
    from fsnet_tpu.ops.warp import grid_sample as grid_sample_exact
    from fsnet_tpu.ops.warp_fast import _padding_masks

    N, H, W, C = 1, 16, 256, 3
    BAND = 4
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    base = np.stack([xs, ys], -1)[None].astype(np.float32)
    dx = 0.03 * np.sin(2 * np.pi * xs) * np.cos(np.pi * ys)
    dy = 0.005 * np.cos(np.pi * xs)
    grid = jnp.asarray(
        (base + np.stack([dx, dy], -1)[None]).astype(np.float32))
    iw = _indices_and_weights(img.shape, grid, "bilinear", "border", True,
                              BAND)
    fargs = (iw, BAND, iw["wx0"], iw["wx1"], iw["wy0"], iw["wy1"])
    ref = grid_sample_exact(img, grid, padding_mode="border",
                            align_corners=True)

    out = wk.grid_sample_band_pallas(img, *fargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    out_p = wk.grid_sample_band_pallas(img.astype(jnp.bfloat16), *fargs)
    out_u = wk.grid_sample_band_pallas(
        img.astype(jnp.bfloat16).astype(jnp.float32), *fargs)
    np.testing.assert_allclose(
        np.asarray(out_p, dtype=np.float32),
        np.asarray(out_u.astype(jnp.bfloat16), dtype=np.float32), atol=1e-6)

    mx0, mx1, my0, my1 = _padding_masks(iw, "border", jnp.float32)
    o, va, vb = wk.grid_sample_band_pallas_fused(
        img, *fargs, mx0, mx1, my0, my1, border=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=1e-5)


@pytest.mark.heavy
def test_tiled_loss_matches_nhwc(monkeypatch):
    """FSNET_TILED_LOSS: the tiled-layout photometric loss (tiled warp out +
    tiled SSIM/L1) must match the NHWC path to f32 reassociation noise —
    loss value and parameter gradients — on the full flagship model."""
    import fsnet_tpu.models.heads.monodepth2_decoder as md
    import fsnet_tpu.ops.warp_fast as wf
    from fsnet_tpu.models import MonoDepthWPose
    from test_models import _flagship_cfg, _synthetic_batch

    monkeypatch.setattr(wf, "_use_pallas", lambda *a: True)
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0), batch=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "loss_noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, {"is_training": True})

    def lossfn(params, tiled):
        monkeypatch.setattr(md, "TILED_LOSS", tiled)
        out, _ = model.apply({**variables, "params": params}, batch,
                             {"is_training": True},
                             rngs={"loss_noise": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        return out["loss"]

    p = variables["params"]
    l0, g0 = jax.value_and_grad(lambda q: lossfn(q, False))(p)
    l1, g1 = jax.value_and_grad(lambda q: lossfn(q, True))(p)
    assert abs(float(l0) - float(l1)) < 1e-6
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
