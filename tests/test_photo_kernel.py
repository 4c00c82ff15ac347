"""Fused Pallas photometric loss vs the XLA reprojection_loss (interpret
mode on CPU): forward values and the closed-form VJP against autodiff."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import fsnet_tpu.ops.pallas.photo_kernel as pk
import fsnet_tpu.ops.photo_loss as plm
from fsnet_tpu.models.heads.monodepth2_decoder import reprojection_loss
from fsnet_tpu.ops.ssim import ssim_target_stats


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk.pl, "pallas_call", patched)


def _data(rng, N, B, H, W, C):
    pred = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32))
    target = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    return pred, target


def _xla_loss(pred, target, stats):
    B = target.shape[0]
    reps = pred.shape[0] // B
    t_tiled = jnp.broadcast_to(
        target[None], (reps,) + target.shape).reshape(pred.shape)
    st = tuple(jnp.broadcast_to(s[None], (reps,) + s.shape).reshape(
        pred.shape) for s in stats)
    return reprojection_loss(pred, t_tiled, target_stats=st)[..., 0]


@pytest.mark.parametrize("H,W", [(16, 256), (8, 128), (12, 640)])
def test_photo_loss_forward_matches_xla(H, W):
    N, B, C = 8, 2, 3
    rng = np.random.RandomState(0)
    pred, target = _data(rng, N, B, H, W, C)
    stats = ssim_target_stats(target)
    out = plm.reprojection_loss_fused(pred, target, *stats)
    ref = _xla_loss(pred, target, stats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_photo_loss_grad_matches_xla():
    N, B, H, W, C = 4, 2, 16, 256, 3
    rng = np.random.RandomState(1)
    pred, target = _data(rng, N, B, H, W, C)
    stats = ssim_target_stats(target)

    def loss_fused(p):
        return jnp.sum(jnp.sin(
            plm.reprojection_loss_fused(p, target, *stats) * 3.0))

    def loss_xla(p):
        return jnp.sum(jnp.sin(_xla_loss(p, target, stats) * 3.0))

    g_fused = jax.grad(loss_fused)(pred)
    g_xla = jax.grad(loss_xla)(pred)
    scale = float(jnp.max(jnp.abs(g_xla))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_fused) / scale,
                               np.asarray(g_xla) / scale, atol=2e-5)


def test_photo_loss_grad_edges():
    """Tiny H so every row is an H-edge case; W=128 single lane tile so
    every column edge is a within-tile reflect."""
    N, B, H, W, C = 2, 1, 4, 128, 2
    rng = np.random.RandomState(2)
    pred, target = _data(rng, N, B, H, W, C)
    stats = ssim_target_stats(target)

    g_fused = jax.grad(lambda p: jnp.sum(
        plm.reprojection_loss_fused(p, target, *stats) ** 2))(pred)
    g_xla = jax.grad(lambda p: jnp.sum(_xla_loss(p, target, stats) ** 2))(
        pred)
    scale = float(jnp.max(jnp.abs(g_xla))) + 1e-8
    np.testing.assert_allclose(np.asarray(g_fused) / scale,
                               np.asarray(g_xla) / scale, atol=2e-5)


def test_photo_loss_bf16():
    """bf16 inputs: the kernel (f32 pooling throughout) must be at least as
    close to the f32 truth as the XLA bf16 path (which casts to bf16
    between pool stages), elementwise-summarized."""
    N, B, H, W, C = 4, 2, 16, 256, 3
    rng = np.random.RandomState(3)
    pred, target = _data(rng, N, B, H, W, C)
    pb, tb = pred.astype(jnp.bfloat16), target.astype(jnp.bfloat16)
    stats_b = tuple(s.astype(jnp.bfloat16) for s in ssim_target_stats(tb))
    out = plm.reprojection_loss_fused(pb, tb, *stats_b)
    assert out.dtype == jnp.bfloat16
    truth = np.asarray(_xla_loss(pred, target, ssim_target_stats(target)))
    xla_b = np.asarray(_xla_loss(pb, tb, stats_b), np.float32)
    err_fused = np.abs(np.asarray(out, np.float32) - truth)
    err_xla = np.abs(xla_b - truth)
    assert err_fused.mean() <= err_xla.mean() * 1.05 + 1e-4, \
        (err_fused.mean(), err_xla.mean())
    assert np.percentile(err_fused, 99) <= 2e-2


@pytest.mark.heavy
def test_flagship_loss_fused_photo_matches_xla(monkeypatch):
    """Decoder integration: the fused photometric dispatch (forced on,
    interpret kernels) must reproduce the XLA-route loss and parameter
    gradients on the full flagship model — including the identity automask
    path, which also routes through the kernel."""
    import fsnet_tpu.models.heads.monodepth2_decoder as md
    from fsnet_tpu.models import MonoDepthWPose
    from test_models import _flagship_cfg, _synthetic_batch

    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0), batch=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "loss_noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, {"is_training": True})

    def lossfn(params, fused):
        monkeypatch.setattr(md, "photo_loss_supported",
                            (lambda *a: fused))
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


@pytest.mark.heavy
def test_flagship_loss_tiled_chain_matches_xla(monkeypatch):
    """The zero-relayout chain (depth-direct Pallas warp -> tiled fused
    photometric loss -> tiled cotangent -> prep backward), all forced on
    with interpret kernels, vs the all-XLA route."""
    import fsnet_tpu.models.heads.monodepth2_decoder as md
    from fsnet_tpu.models import MonoDepthWPose
    from test_models import _flagship_cfg, _synthetic_batch

    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0), batch=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "loss_noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, {"is_training": True})

    def lossfn(params, fused):
        monkeypatch.setattr(md, "photo_loss_supported", lambda *a: fused)
        monkeypatch.setattr(md, "warp_depth_supported", lambda *a: fused)
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
