"""Pretrained-encoder wiring: config pretrained/pretrained_path -> converted
torchvision weights grafted into the train state, surviving into the first
optimizer step (reference loads ImageNet weights at build time,
``vision_base/networks/models/backbone/resnet.py:155-160,270-284``)."""
import os

import numpy as np
import pytest
import torch

import jax

from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.pretrained import (
    graft_pretrained_backbones, resolve_pretrained_path,
)
from fsnet_tpu.runtime.state import init_state, make_train_step

from test_models import _flagship_cfg, _synthetic_batch
from test_torch_convert import TorchResNet18


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    net = TorchResNet18()
    path = tmp_path_factory.mktemp("weights") / "resnet18-testrand.pth"
    torch.save(net.state_dict(), str(path))
    return str(path), net.state_dict()


def _build_state(meta_cfg):
    from fsnet_tpu.models import MonoDepthWPose

    model = MonoDepthWPose(**{k: v for k, v in meta_cfg.items()
                              if k != "name"})
    batch = _synthetic_batch(np.random.RandomState(0), batch=2)
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4),
                            dict(name="StepLR", step_size=8),
                            steps_per_epoch=4, clip_gradients=1.0)
    return model, batch, init_state(model, batch, tx, jax.random.PRNGKey(0))


def test_graft_and_first_step(torch_ckpt):
    path, sd = torch_ckpt
    meta_cfg = _flagship_cfg()
    meta_cfg["depth_backbone_cfg"]["pretrained"] = True
    meta_cfg["depth_backbone_cfg"]["pretrained_path"] = path

    model, batch, state = _build_state(meta_cfg)
    state, grafted = graft_pretrained_backbones(state, meta_cfg,
                                                verbose=False)
    assert grafted == ["depth_backbone"]

    # converted conv1 landed (torch OIHW -> flax HWIO)
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(state.params["depth_backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # BN running stats landed in batch_stats
    got_mean = np.asarray(
        state.batch_stats["depth_backbone"]["bn1"]["bn"]["mean"])
    np.testing.assert_allclose(got_mean, sd["bn1.running_mean"].numpy(),
                               rtol=1e-6)

    # grafted weights survive into the first jitted step: the post-step
    # params are the grafted values plus one small Adam update, not a
    # re-initialization
    train_step = make_train_step(donate=False)
    state2, metrics, _ = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state2.params["depth_backbone"]["conv1"]["kernel"])
    assert not np.allclose(after, want)            # the step updated them
    assert np.max(np.abs(after - want)) < 5e-4     # by ~lr, from the graft


def test_pretrained_true_without_weights_errors(tmp_path, monkeypatch):
    monkeypatch.delenv("FSNET_PRETRAINED_DIR", raising=False)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="pretrained=True"):
        resolve_pretrained_path(dict(
            name="fsnet_tpu.models.backbones.resnet.resnet",
            depth=18, pretrained=True))


def test_cache_dir_resolution(torch_ckpt, tmp_path, monkeypatch):
    path, _ = torch_ckpt
    cache = tmp_path / "hub" / "checkpoints"
    cache.mkdir(parents=True)
    dst = cache / "resnet18-f37072fd.pth"
    dst.write_bytes(open(path, "rb").read())
    monkeypatch.delenv("FSNET_PRETRAINED_DIR", raising=False)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    found = resolve_pretrained_path(dict(
        name="fsnet_tpu.models.backbones.resnet.resnet",
        depth=18, pretrained=True))
    assert found == str(dst)


def test_pose_backbone_multi_image_graft(torch_ckpt):
    path, sd = torch_ckpt
    # MonoDepthMeta carries a pose backbone over 2 concatenated frames:
    # conv1 must be replicated/averaged over the 6 input channels
    # (reference resnet.py:155-160)
    from fsnet_tpu.models.torch_convert import load_torch_resnet

    params, _ = load_torch_resnet(path, num_input_images=2)
    conv1 = params["conv1"]["kernel"]
    assert conv1.shape == (7, 7, 6, 64)
    base = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(conv1[:, :, :3], base / 2, rtol=1e-6)
    np.testing.assert_allclose(conv1[:, :, 3:], base / 2, rtol=1e-6)
