"""Model construction + forward smoke tests (CPU, tiny shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsnet_tpu.models import MonoDepthWPose, PoseDecoder, resnet
from fsnet_tpu.utils.keys import encode_batch

H, W = 64, 96  # divisible by 32 for the 5-stage decoder
B = 2


def _flagship_cfg(height=H, width=W):
    """Mirror of configs/kitti360_wpose_example meta_arch (tiny shapes)."""
    return dict(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet",
            depth=18,
            frozen_stages=-1,
            num_stages=4,
            out_indices=(-1, 0, 1, 2, 3),
            norm_eval=False,
            dilations=(1, 1, 1, 1),
        ),
        head_cfg=dict(
            name="fsnet_tpu.models.heads.monodepth2_decoder.MonoDepth2Decoder",
            scales=(0, 1, 2, 3),
            height=height,
            width=width,
            min_depth=0.5,
            max_depth=100.0,
            is_log_image=False,
            overlapped_mask=True,
            depth_decoder_cfg=dict(
                name="fsnet_tpu.models.heads.depth_decoder.MultiChannelDepthDecoder",
                num_output_channels=16,
                use_skips=True,
                scales=(0, 1, 2, 3),
                min_depth=0.5,
                max_depth=100.0,
            ),
        ),
        train_cfg=dict(frame_ids=(0, 1, -1)),
        test_cfg=dict(),
    )


def _synthetic_batch(rng, height=H, width=W, batch=B):
    P2 = np.zeros((batch, 3, 4), np.float32)
    P2[:, 0, 0] = 80.0
    P2[:, 1, 1] = 80.0
    P2[:, 0, 2] = width / 2
    P2[:, 1, 2] = height / 2
    P2[:, 2, 2] = 1.0

    pose = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    pose[:, 0, 3] = 0.1  # small x translation

    data = {
        ("image", 0): rng.rand(batch, height, width, 3).astype(np.float32),
        ("image", 1): rng.rand(batch, height, width, 3).astype(np.float32),
        ("image", -1): rng.rand(batch, height, width, 3).astype(np.float32),
        ("original_image", 0): rng.rand(batch, height, width, 3).astype(np.float32),
        ("original_image", 1): rng.rand(batch, height, width, 3).astype(np.float32),
        ("original_image", -1): rng.rand(batch, height, width, 3).astype(np.float32),
        ("relative_pose", 1): pose,
        ("relative_pose", -1): pose.copy(),
        "P2": P2,
    }
    return encode_batch(data)


def test_resnet18_shapes():
    model = resnet(18, out_indices=(-1, 0, 1, 2, 3), norm_eval=False)
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert len(feats) == 5
    assert feats[0].shape == (1, H // 2, W // 2, 64)   # stem
    assert feats[1].shape == (1, H // 4, W // 4, 64)   # layer1
    assert feats[2].shape == (1, H // 8, W // 8, 128)
    assert feats[3].shape == (1, H // 16, W // 16, 256)
    assert feats[4].shape == (1, H // 32, W // 32, 512)


def test_pose_decoder_shapes():
    model = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    feats = [[jnp.zeros((B, 4, 6, 512))]]
    variables = model.init(jax.random.PRNGKey(0), feats)
    aa, t = model.apply(variables, feats)
    assert aa.shape == (B, 2, 1, 3)
    assert t.shape == (B, 2, 1, 3)


def test_wpose_train_forward_loss():
    rng = np.random.RandomState(0)
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(rng)
    meta = {"is_training": True}

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        batch, meta)
    out, mutated = model.apply(
        variables, batch, meta,
        rngs={"loss_noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])

    assert np.isfinite(float(out["loss"]))
    assert "total_loss" in out["loss_dict"]
    for s in range(4):
        assert f"loss/{s}" in out["loss_dict"]
        assert f"smooth_loss/{s}" in out["loss_dict"]
    assert "batch_stats" in mutated


def test_wpose_test_forward():
    rng = np.random.RandomState(0)
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(rng)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        batch, {"is_training": True})
    pred = model.apply(variables, batch, {"is_training": False})
    assert pred["depth"].shape == (B, H, W, 1)
    d = np.asarray(pred["depth"])
    assert np.all(d >= 0.5) and np.all(d <= 100.0)


def test_wpose_loss_decreases_under_sgd():
    """One-step sanity: gradient step reduces the loss on a fixed batch."""
    rng = np.random.RandomState(1)
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(rng)
    meta = {"is_training": True}

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        batch, meta)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, meta,
            rngs={"loss_noise": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return out["loss"]

    # jit so the graph lands in the persistent compile cache (conftest):
    # un-jitted eager dispatch of the full model costs ~1 min per call on
    # the single-core CI box, every run.
    vg = jax.jit(jax.value_and_grad(loss_fn))
    loss0, grads = vg(params)
    params2 = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
    loss1, _ = vg(params2)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    assert float(loss1) < float(loss0)


def test_wpose_photometric_uncertainty_option():
    """Learnable photometric uncertainty (reference
    monodepth2_decoder.py:278-290): loss finite, net params created+trained."""
    rng = np.random.RandomState(3)
    cfg = _flagship_cfg()
    cfg["head_cfg"]["learnable_photometric_uncertain"] = True
    model = MonoDepthWPose(**cfg)
    batch = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        batch, {"is_training": True})
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("photometric_net" in jax.tree_util.keystr(p) for p, _ in flat)
    # one jitted value_and_grad call: loss + photometric-net grads together
    # (separate eager apply + grad cost ~2 full un-jitted model walks)
    loss, g = jax.jit(jax.value_and_grad(lambda v: model.apply(
        {**variables, "params": v}, batch, {"is_training": True},
        rngs={"loss_noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])[0]["loss"]))(variables["params"])
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for p, x in jax.tree_util.tree_leaves_with_path(g)
             if "photometric_net" in jax.tree_util.keystr(p))
    assert gn > 0.0
