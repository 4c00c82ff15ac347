"""Norm-direct Pallas fisheye warp (Mei prep kernel) vs the grid route.

The oracle is the einsum band warp fed by the fisheye decoder's own Mei
projection chain — the exact XLA path the Mei prep kernel replaces
(``ops/warp_mei.py`` module docstring) — plus the nearest/zeros mask warp
for the overlap semantics. Interpret mode on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import fsnet_tpu.ops.pallas.warp_kernel as wk
import fsnet_tpu.ops.warp_mei as wm
from fsnet_tpu.models.heads.fisheye_decoder import _mei_project
from fsnet_tpu.ops.warp_fast import grid_sample, grid_sample_band


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(wk.pl, "pallas_call", patched)


def _scene(rng, S, F, B, H, W, C):
    """Synthetic Mei camera: smooth positive norm maps, a unit ray field
    with a central validity disc, KITTI-360-class intrinsics, small
    ego-motions."""
    image = jnp.asarray(rng.rand(F * B, H, W, C).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = 8.0 + 4.0 * np.sin(xs / W * 4.0)[None] \
        + rng.rand(S * B, 1, 1) * 6.0
    norm = jnp.asarray((base + 2.0 * np.cos(ys / H * 3.0)[None])
                       .astype(np.float32))

    # ray field: pinhole-ish directions bent outward (Mei-like), normalized
    u = (xs - 0.5 * W) / (0.35 * W)
    v = (ys - 0.5 * H) / (0.35 * W)
    rays = np.stack([u, v, np.ones_like(u)], axis=-1).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    r2 = u * u + v * v
    valid = (r2 < 1.9).astype(np.float32)
    rays4 = np.concatenate(
        [np.tile(rays[None], (B, 1, 1, 1)),
         np.tile(valid[None, ..., None], (B, 1, 1, 1))], axis=-1)

    P = np.zeros((B, 3, 4), np.float32)
    P[:, 0, 0] = 1.3 * W
    P[:, 1, 1] = 1.3 * W
    P[:, 0, 2] = 0.5 * W
    P[:, 1, 2] = 0.5 * H
    P[:, 2, 2] = 1.0
    params = np.tile(np.array([[2.17, 1.68, 0.0]], np.float32), (B, 1))

    Ts = np.tile(np.eye(4, dtype=np.float32), (F, B, 1, 1))
    for f in range(F):
        for b in range(B):
            ang = (rng.rand(3) - 0.5) * 0.01
            Ts[f, b, :3, 3] = (rng.rand(3) - 0.5) * np.array([1.4, 0.1, 0.2])
            Ts[f, b, 0, 1] = -ang[2]
            Ts[f, b, 1, 0] = ang[2]
            Ts[f, b, 0, 2] = ang[1]
            Ts[f, b, 2, 0] = -ang[1]
            Ts[f, b, 1, 2] = -ang[0]
            Ts[f, b, 2, 1] = ang[0]
    return (image, norm, jnp.asarray(rays4), jnp.asarray(P),
            jnp.asarray(params), jnp.asarray(Ts))


def _grids(norm, rays4, P, params, Ts, S, F):
    """The fisheye decoder's exact grid chain ([S, F, B, H, W, 2],
    normalized)."""
    B, H, W = rays4.shape[0], rays4.shape[1], rays4.shape[2]
    f32 = jnp.float32
    rays = rays4[..., 0:3].astype(f32)
    R = Ts[:, :, :3, :3].astype(f32)[:, :, None, None]
    rot_rays = jnp.stack([
        R[..., k, 0] * rays[None, ..., 0]
        + R[..., k, 1] * rays[None, ..., 1]
        + R[..., k, 2] * rays[None, ..., 2]
        for k in range(3)], axis=-1)
    trans = Ts[:, :, :3, 3].astype(f32)

    def grid_for(norm_s, rot_f, t_f):
        transformed = (norm_s[..., None].astype(f32) * rot_f
                       + t_f[:, None, None, :])
        pix = _mei_project(transformed, P.astype(f32), params.astype(f32))
        u = pix[..., 0] / max(W - 1, 1) * 2.0 - 1.0
        v = pix[..., 1] / max(H - 1, 1) * 2.0 - 1.0
        return jnp.stack([u, v], axis=-1)

    norm_s = norm.reshape(S, B, H, W)
    return jax.vmap(lambda n: jax.vmap(
        lambda rf, tf: grid_for(n, rf, tf))(rot_rays, trans))(norm_s)


def _grid_route(image, mask, norm, rays4, P, params, Ts, S, F, band):
    B, H, W = rays4.shape[0], rays4.shape[1], rays4.shape[2]
    grids = _grids(norm, rays4, P, params, Ts, S, F)
    gf = grids.reshape(S * F * B, H, W, 2)
    preds = grid_sample_band(image, gf, padding_mode="border", band=band)
    mask_flat = jnp.broadcast_to(
        mask[None, ..., None], (F, B, H, W, 1)).reshape(F * B, H, W, 1)
    warped = jnp.stack([
        grid_sample(mask_flat, grids[s].reshape(F * B, H, W, 2),
                    mode="nearest", padding_mode="zeros", impl="gather")
        for s in range(S)])
    overlap = (warped.reshape(S * F * B, H, W) == 1.0)
    return preds, overlap


@pytest.mark.parametrize("W,band", [(256, 16), (128, 8)])
def test_warp_mei_forward_matches_grid_route(W, band):
    S, F, B, H, C = 2, 2, 2, 16, 3
    rng = np.random.RandomState(0)
    image, norm, rays4, P, params, Ts = _scene(rng, S, F, B, H, W, C)
    mask = rays4[..., 3]
    rays_cf = jnp.moveaxis(rays4[..., 0:3], -1, 1)
    mrows = wm.make_mei_rows(P, params, Ts, S)
    out, overlap = wm.warp_mei_fused(image, mask, norm, rays_cf, mrows,
                                     S, F, band, True)
    ref, ref_ov = _grid_route(image, mask, norm, rays4, P, params, Ts,
                              S, F, band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)
    # overlap: the kernel's nearest + analytic in-bounds vs the grid
    # route's nearest/zeros warp — identical up to the +-0.5-boundary and
    # fx == 0.5 rounding knife-edges (measure disagreement rate)
    agree = np.mean(np.asarray(overlap) == np.asarray(ref_ov))
    assert agree > 0.999, agree


def test_warp_mei_grad_matches_grid_route():
    S, F, B, H, W, C, band = 2, 2, 1, 16, 256, 3, 16
    rng = np.random.RandomState(1)
    image, norm, rays4, P, params, Ts = _scene(rng, S, F, B, H, W, C)
    mask = rays4[..., 3]
    rays_cf = jnp.moveaxis(rays4[..., 0:3], -1, 1)
    mrows = wm.make_mei_rows(P, params, Ts, S)

    def loss_direct(n):
        out, _ = wm.warp_mei_fused(image, mask, n, rays_cf, mrows, S, F,
                                   band, False)
        return jnp.sum(jnp.sin(out * 3.0))

    def loss_grid(n):
        grids = _grids(n, rays4, P, params, Ts, S, F)
        out = grid_sample_band(image, grids.reshape(S * F * B, H, W, 2),
                               padding_mode="border", band=band)
        return jnp.sum(jnp.sin(out * 3.0))

    g_direct = jax.grad(loss_direct)(norm)
    g_grid = jax.grad(loss_grid)(norm)
    scale = float(jnp.max(jnp.abs(g_grid))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_direct) / scale,
                               np.asarray(g_grid) / scale, atol=3e-4)


def test_warp_mei_bf16_packed_path():
    """bf16 images take the row-pair packed kernels; the overlap mask now
    follows the image's packing ({0, 1} is exact in bf16, so the packed
    mask sweep is exact) — the ov_bf == ov_f32 assertion below certifies
    the packed and unpacked mask passes agree bit-for-bit."""
    S, F, B, H, W, C, band = 1, 2, 2, 16, 256, 3, 16
    rng = np.random.RandomState(2)
    image, norm, rays4, P, params, Ts = _scene(rng, S, F, B, H, W, C)
    mask = rays4[..., 3]
    rays_cf = jnp.moveaxis(rays4[..., 0:3], -1, 1)
    mrows = wm.make_mei_rows(P, params, Ts, S)
    img_bf = image.astype(jnp.bfloat16)

    out_bf, ov_bf = wm.warp_mei_fused(img_bf, mask, norm, rays_cf, mrows,
                                      S, F, band, True)
    out_f32, ov_f32 = wm.warp_mei_fused(
        img_bf.astype(jnp.float32), mask, norm, rays_cf, mrows, S, F,
        band, True)
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf, dtype=np.float32),
        np.asarray(out_f32.astype(jnp.bfloat16), dtype=np.float32),
        atol=1e-2)
    assert bool(jnp.all(ov_bf == ov_f32))


@pytest.mark.heavy
def test_fisheye_loss_norm_direct_matches_grid_route(monkeypatch):
    """Decoder integration: the norm-direct dispatch in FishEyeDecoder
    (forced on, interpret kernels) must reproduce the grid-route loss and
    parameter gradients on a full fisheye model — including the overlap
    mask fold (nearest mask warp + zeros padding semantics)."""
    import fsnet_tpu.models.heads.fisheye_decoder as fd
    from fsnet_tpu.models import MonoDepthWPose
    from fsnet_tpu.ops.fisheye import MeiCameraProjection
    from fsnet_tpu.utils.keys import encode_batch

    B, H, W = 1, 64, 128
    P_np = np.zeros((3, 4), np.float32)
    P_np[0, 0] = P_np[1, 1] = 1.3 * W
    P_np[0, 2], P_np[1, 2], P_np[2, 2] = W / 2.0, H / 2.0, 1.0
    rng = np.random.RandomState(0)
    P = np.tile(P_np[None], (B, 1, 1))
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    pose[:, 0, 3] = 0.1
    pose[:, 2, 3] = 0.4

    mei = MeiCameraProjection()
    X, Y, Z, mask = mei.get_ray_map(
        H, W, P_np, {"mirror_parameters": {"xi": 2.17},
                     "distortion_parameters": {"k1": 1.68, "k2": 0.0}})
    rays = np.stack([X[0], Y[0], Z[0], mask[0]], axis=-1)

    img = lambda: rng.rand(B, H, W, 3).astype(np.float32)  # noqa: E731
    data = {
        ("image", 0): img(), ("image", 1): img(), ("image", -1): img(),
        ("original_image", 0): img(), ("original_image", 1): img(),
        ("original_image", -1): img(),
        ("relative_pose", 1): pose, ("relative_pose", -1): pose.copy(),
        "P2": P.astype(np.float32),
        "fisheye_rays": np.tile(rays[None], (B, 1, 1, 1)).astype(np.float32),
        "fisheye_params": np.tile(
            np.array([[2.17, 1.68, 0.0]], np.float32), (B, 1)),
        "patched_mask": np.ones((B, H, W), np.float32),
    }
    batch = encode_batch(data)

    model = MonoDepthWPose(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet", depth=18,
            out_indices=(-1, 0, 1, 2, 3), norm_eval=False),
        head_cfg=dict(
            name="fsnet_tpu.models.heads.fisheye_decoder.FishEyeDecoder",
            scales=(0, 1, 2, 3), height=H, width=W, min_depth=0.1,
            max_depth=30.0, is_log_image=False, overlapped_mask=True,
            warp_band=16,
            depth_decoder_cfg=dict(
                name="fsnet_tpu.models.heads.depth_decoder."
                     "MultiChannelDepthDecoder",
                num_output_channels=16, scales=(0, 1, 2, 3),
                min_depth=0.1, max_depth=30.0)),
        train_cfg=dict(frame_ids=(0, 1, -1)),
        test_cfg=dict(),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        batch, {"is_training": True})

    def lossfn(params, direct):
        # force the full norm-direct chain incl. the tiled fused
        # photometric handoff (photo_loss_supported gates it)
        monkeypatch.setattr(
            fd, "warp_mei_supported",
            (lambda *a: True) if direct else (lambda *a: False))
        monkeypatch.setattr(fd, "photo_loss_supported", lambda *a: direct)
        import fsnet_tpu.models.heads.monodepth2_decoder as md
        monkeypatch.setattr(md, "photo_loss_supported", lambda *a: direct)
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


def test_warp_mei_tile_ymin_matches_per_row(monkeypatch):
    """The per-tile half-band anchor path (TILE_YMIN, the TPU default at
    W > 128) must reproduce the per-row full-band warp: the 128-lane
    tile-local vertical spread of Mei reprojections is well under half the
    per-row band (scripts/fisheye_band_probe.py), so both cover every
    sample on these motions — forward, overlap mask, AND norm gradient."""
    S, F, B, H, W, C, band = 2, 2, 1, 16, 256, 3, 16
    rng = np.random.RandomState(3)
    image, norm, rays4, P, params, Ts = _scene(rng, S, F, B, H, W, C)
    mask = rays4[..., 3]
    rays_cf = jnp.moveaxis(rays4[..., 0:3], -1, 1)
    mrows = wm.make_mei_rows(P, params, Ts, S)

    def run():
        def loss(n):
            out, ov = wm.warp_mei_fused(image, mask, n, rays_cf, mrows,
                                        S, F, band, True)
            return jnp.sum(jnp.sin(out * 3.0)), (out, ov)
        (val, (out, ov)), g = jax.value_and_grad(loss, has_aux=True)(norm)
        return out, ov, g

    monkeypatch.setattr(wm, "TILE_YMIN", True)
    out_t, ov_t, g_t = run()
    monkeypatch.setattr(wm, "TILE_YMIN", False)
    out_r, ov_r, g_r = run()
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_r),
                               atol=3e-4)
    assert float(np.mean(np.asarray(ov_t) == np.asarray(ov_r))) > 0.999
    scale = float(jnp.max(jnp.abs(g_r))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_t) / scale,
                               np.asarray(g_r) / scale, atol=3e-4)


def test_warp_mei_tile_ymin_bf16_packed(monkeypatch):
    """The packed-bf16 + tile_ymin combination the TPU A/B actually runs
    (ADVICE r4): bf16 images ride the row-pair packed kernels in tile mode
    too, exercising the ymin//2 row-pair scaling and the ymin|ws<<16
    prefetch word on the packed path. Oracle: the per-row packed warp of
    the same bf16 image."""
    S, F, B, H, W, C, band = 1, 2, 2, 16, 256, 3, 16
    rng = np.random.RandomState(4)
    image, norm, rays4, P, params, Ts = _scene(rng, S, F, B, H, W, C)
    mask = rays4[..., 3]
    rays_cf = jnp.moveaxis(rays4[..., 0:3], -1, 1)
    mrows = wm.make_mei_rows(P, params, Ts, S)
    img_bf = image.astype(jnp.bfloat16)

    def run():
        out, ov = wm.warp_mei_fused(img_bf, mask, norm, rays_cf, mrows,
                                    S, F, band, True)
        return out, ov

    monkeypatch.setattr(wm, "TILE_YMIN", True)
    out_t, ov_t = run()
    monkeypatch.setattr(wm, "TILE_YMIN", False)
    out_r, ov_r = run()
    assert out_t.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_t, dtype=np.float32),
        np.asarray(out_r, dtype=np.float32), atol=1e-2)
    assert float(np.mean(np.asarray(ov_t) == np.asarray(ov_r))) > 0.999

    # odd-half rounding: band=10 halves to 5 -> rounded up to 6 so the
    # packed route stays eligible (ADVICE r4: silent f32 fallback cliff)
    monkeypatch.setattr(wm, "TILE_YMIN", True)
    used = []
    real_use_packed = wm.wk._use_packed
    monkeypatch.setattr(wm.wk, "_use_packed",
                        lambda img, b: used.append(b) or
                        real_use_packed(img, b))
    out10, _ = wm.warp_mei_fused(img_bf, mask, norm, rays_cf, mrows,
                                 S, F, 10, True)
    assert used == [6], used              # halved band rounded up to even
    assert real_use_packed(img_bf, 6)     # packed route taken, not f32
