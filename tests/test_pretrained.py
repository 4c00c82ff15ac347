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


def test_converter_dispatch_all_backbones(tmp_path):
    """convert_backbone_weights routes each backbone family to its converter
    (reference loads zoo weights for all of them: swin_transformer.py:591,
    vit.py:12, convnext.py:204, densenet.py:3)."""
    from fsnet_tpu.runtime.pretrained import convert_backbone_weights
    from test_torch_convert_backbones import (
        TorchConvNeXt, TorchDenseNetFeatures)

    torch.manual_seed(3)

    dn = TorchDenseNetFeatures(growth=4, block_config=(2, 2), num_init=8)
    p = tmp_path / "densenet121-test.pth"
    torch.save(dn.state_dict(), str(p))
    params, stats = convert_backbone_weights(
        {"name": "fsnet_tpu.models.backbones.densenet.densenet",
         "depth": 121}, str(p))
    assert "conv0" in params and stats

    cn = TorchConvNeXt(depths=(1, 1, 1, 1), dims=(8, 8, 16, 16))
    p = tmp_path / "convnext_tiny_test.pth"
    torch.save({"model": cn.state_dict()}, str(p))
    params, stats = convert_backbone_weights(
        {"name": "fsnet_tpu.models.backbones.convnext.convNext"}, str(p))
    assert "stem_conv" in params and stats == {}

    import sys
    if "/root/reference" in sys.path or os.path.isdir("/root/reference"):
        sys.path.insert(0, "/root/reference")
        from vision_base.networks.models.backbone.swin_transformer import (
            SwinTransformer as RefSwin)
        from vision_base.networks.models.backbone.vit import ViT as RefViT

        sw = RefSwin(img_size=(56, 56), patch_size=4, embed_dim=16,
                     depths=[2, 2], num_heads=[2, 4], window_size=7)
        p = tmp_path / "swin_tiny_patch4_window7_224_test.pth"
        torch.save({"model": sw.state_dict()}, str(p))
        params, _ = convert_backbone_weights(
            {"name": "fsnet_tpu.models.backbones.swin_transformer"
                     ".swinTransformer"}, str(p))
        assert "patch_embed" in params and "layer0_block0" in params

        vt = RefViT(pretrained=False, patches=8, dim=16, ff_dim=32,
                    num_heads=2, num_layers=2, dropout_rate=0.0,
                    image_size=(32, 32))
        p = tmp_path / "B_16_test.pth"
        torch.save(vt.state_dict(), str(p))
        # grid resize path: pretrain grid 4x4 -> target 6x8 (48x64 @ p8)
        params, _ = convert_backbone_weights(
            {"name": "fsnet_tpu.models.backbones.vit.vit", "patches": 8,
             "image_size": (48, 64)}, str(p))
        assert params["pos_embedding"].shape[1] == 1 + 6 * 8


def test_cache_patterns_new_backbones(tmp_path, monkeypatch):
    """resolve_pretrained_path finds zoo-named caches for every family."""
    monkeypatch.setenv("FSNET_PRETRAINED_DIR", str(tmp_path))
    for fname, cfg in [
        ("swin_base_patch4_window7_224_22k.pth",
         {"name": "models.swin_transformer.swinTransformer",
          "pretrained": True, "pretrained_name": "Swin-B"}),
        ("convnext_tiny_1k_224_ema.pth",
         {"name": "models.convnext.convNext", "pretrained": True,
          "pretrained_name": "ConvNeXt-T"}),
        ("densenet121-a639ec97.pth",
         {"name": "models.densenet.densenet", "pretrained": True,
          "depth": 121}),
        ("B_16_imagenet1k.pth",
         {"name": "models.vit.vit", "pretrained": True,
          "pretrained_name": "B_16"}),
    ]:
        (tmp_path / fname).write_bytes(b"x")
        assert resolve_pretrained_path(cfg) == str(tmp_path / fname), fname
