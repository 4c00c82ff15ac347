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
