"""Weight-conversion parity for the non-ResNet backbones (VERDICT round-2
item 6): inline torch oracles with exact torchvision/timm state-dict naming,
random weights, converted to flax — features must match to float tolerance.

Reference loading behavior being replicated:
``vision_base/networks/models/backbone/densenet.py:3-21`` (torchvision
``.features`` with transition3's pool removed), ``convnext.py:204``,
``vit.py:12``, ``swin_transformer.py:591``.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

# ------------------------------------------------- torch oracle: densenet


class TorchDenseLayer(nn.Module):
    def __init__(self, num_input, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(num_input)
        self.conv1 = nn.Conv2d(num_input, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        h = self.conv1(torch.relu(self.norm1(x)))
        h = self.conv2(torch.relu(self.norm2(h)))
        return torch.cat([x, h], 1)


class TorchDenseNetFeatures(nn.Module):
    """torchvision ``densenet*.features`` with transition3's pool removed
    (the reference's extractor)."""

    def __init__(self, growth=8, block_config=(2, 3, 2, 2), num_init=16):
        super().__init__()
        f = nn.Sequential()
        f.add_module("conv0", nn.Conv2d(3, num_init, 7, 2, 3, bias=False))
        f.add_module("norm0", nn.BatchNorm2d(num_init))
        f.add_module("relu0", nn.ReLU())
        f.add_module("pool0", nn.MaxPool2d(3, 2, 1))
        ch = num_init
        for i, layers in enumerate(block_config):
            block = nn.Sequential()
            for j in range(layers):
                block.add_module(f"denselayer{j + 1}",
                                 TorchDenseLayer(ch, growth))
                ch += growth
            f.add_module(f"denseblock{i + 1}", block)
            if i != len(block_config) - 1:
                tr = nn.Sequential()
                tr.add_module("norm", nn.BatchNorm2d(ch))
                tr.add_module("relu", nn.ReLU())
                ch //= 2
                tr.add_module("conv", nn.Conv2d(ch * 2, ch, 1, bias=False))
                if i != 2:  # reference removes transition3's pool
                    tr.add_module("pool", nn.AvgPool2d(2, 2))
                f.add_module(f"transition{i + 1}", tr)
        f.add_module("norm5", nn.BatchNorm2d(ch))
        self.features = f

    def forward(self, x):
        return self.features(x)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.rand(p.shape, generator=g) * 0.4 - 0.2)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.rand(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.7)


def test_densenet_conversion_parity():
    from fsnet_tpu.models.backbones.densenet import DenseNetFeatures
    from fsnet_tpu.models.torch_convert import convert_densenet_state_dict

    cfg = dict(growth=8, block_config=(2, 3, 2, 2), num_init=16)
    tmodel = TorchDenseNetFeatures(**cfg)
    _randomize(tmodel, 0)
    tmodel.eval()

    x = np.random.RandomState(1).rand(2, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    params, stats = convert_densenet_state_dict(tmodel.state_dict())
    fmodel = DenseNetFeatures(growth_rate=8, block_config=(2, 3, 2, 2),
                              num_init=16)
    out = fmodel.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_densenet_old_key_spelling():
    """Pre-torchvision-1.0 checkpoints spell ``norm.1.weight``; the converter
    must normalize them exactly as torchvision's loader does."""
    from fsnet_tpu.models.torch_convert import _norm_densenet_keys

    sd = {"denseblock1.denselayer1.norm.1.weight": 1,
          "denseblock1.denselayer1.conv.2.weight": 2,
          "transition1.norm.weight": 3,
          "norm5.running_var": 4}
    out = _norm_densenet_keys(sd)
    assert out == {"denseblock1.denselayer1.norm1.weight": 1,
                   "denseblock1.denselayer1.conv2.weight": 2,
                   "transition1.norm.weight": 3,
                   "norm5.running_var": 4}


# ------------------------------------------------- torch oracle: convnext


class TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim, ls_init=1e-6):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(ls_init * torch.ones(dim))

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.pwconv2(self.act(self.pwconv1(self.norm(x))))
        x = (self.gamma * x).permute(0, 3, 1, 2)
        return inp + x


class TorchConvNeXt(nn.Module):
    """Official-repo naming: downsample_layers.{i}.{0,1} + stages.{i}.{j}."""

    def __init__(self, depths=(2, 2, 3, 2), dims=(16, 24, 32, 48)):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            TorchChannelsFirstLN(dims[0])))
        for i in range(3):
            self.downsample_layers.append(nn.Sequential(
                TorchChannelsFirstLN(dims[i]),
                nn.Conv2d(dims[i], dims[i + 1], 2, stride=2)))
        self.stages = nn.ModuleList(
            nn.Sequential(*[TorchConvNeXtBlock(dims[i])
                            for _ in range(depths[i])])
            for i in range(4))

    def forward(self, x):
        outs = []
        for i in range(4):
            x = self.stages[i](self.downsample_layers[i](x))
            outs.append(x.permute(0, 2, 3, 1))
        return outs


class TorchChannelsFirstLN(nn.Module):
    """Official ConvNeXt LayerNorm(channels_first) — params named
    weight/bias like nn.LayerNorm."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def test_convnext_conversion_parity():
    from fsnet_tpu.models.backbones.convnext import ConvNeXt
    from fsnet_tpu.models.torch_convert import convert_convnext_state_dict

    tmodel = TorchConvNeXt()
    _randomize(tmodel, 3)
    tmodel.eval()

    x = np.random.RandomState(4).rand(2, 3, 32, 64).astype(np.float32)
    with torch.no_grad():
        refs = [r.numpy() for r in tmodel(torch.from_numpy(x))]

    params, stats = convert_convnext_state_dict(
        {"model": tmodel.state_dict()})
    fmodel = ConvNeXt(depths=(2, 2, 3, 2), dims=(16, 24, 32, 48))
    outs = fmodel.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r, atol=3e-5)


# ------------------------------------------- vit: reference code as oracle

import os
import sys

REFERENCE = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_vit_conversion_parity_vs_reference_code():
    """Run the REFERENCE'S OWN modified ViT (per-block pos-embed re-add,
    attention-score bias, no final norm — ``vision_base/.../vit.py``) with
    random weights, convert, and compare the feature output."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from vision_base.networks.models.backbone.vit import ViT as RefViT

    from fsnet_tpu.models.backbones.vit import ViT
    from fsnet_tpu.models.torch_convert import convert_vit_state_dict

    torch.manual_seed(0)
    h, w, patches, dim, heads, layers, ff = 32, 48, 16, 24, 3, 2, 48
    ref = RefViT(pretrained=False, patches=patches, dim=dim, ff_dim=ff,
                 num_heads=heads, num_layers=layers, dropout_rate=0.0,
                 image_size=(h, w))
    _randomize(ref, 7)
    # exercise the fork-only params with nonzero values too
    with torch.no_grad():
        ref.transformer.positional_embedding.pos_embedding.copy_(
            torch.rand_like(
                ref.transformer.positional_embedding.pos_embedding) * 0.1)
        ref.transformer.positional_embedding_attn.pos_embedding.copy_(
            torch.rand_like(
                ref.transformer.positional_embedding_attn.pos_embedding) * 0.1)
    ref.eval()

    x = np.random.RandomState(8).rand(2, 3, h, w).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))[0].numpy().transpose(0, 2, 3, 1)

    params, _ = convert_vit_state_dict(ref.state_dict())
    fmodel = ViT(patches=patches, dim=dim, ff_dim=ff, num_heads=heads,
                 num_layers=layers, dropout_rate=0.0)
    out = fmodel.apply({"params": params},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)[0]
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=3e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_swin_conversion_parity_vs_reference_code():
    """Run the REFERENCE'S OWN Swin fork (pyramid ``forward_features``, no
    final norm — ``vision_base/.../swin_transformer.py``) with random
    weights, convert, and compare every pyramid output."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from vision_base.networks.models.backbone.swin_transformer import (
        SwinTransformer as RefSwin)

    from fsnet_tpu.models.backbones.swin_transformer import SwinTransformer
    from fsnet_tpu.models.torch_convert import convert_swin_state_dict

    torch.manual_seed(0)
    h, w = 56, 56
    kw = dict(patch_size=4, embed_dim=16, depths=[2, 2], num_heads=[2, 4],
              window_size=7, drop_path_rate=0.0, output_indices=[0, 1, 2])
    ref = RefSwin(img_size=(h, w), **kw)
    _randomize(ref, 11)
    ref.eval()

    x = np.random.RandomState(12).rand(2, 3, h, w).astype(np.float32)
    with torch.no_grad():
        outs_ref = [o.numpy().transpose(0, 2, 3, 1)
                    for o in ref(torch.from_numpy(x))]

    # the official checkpoints arrive wrapped under a "model" key with
    # attn_mask / relative_position_index buffers present — keep both to
    # exercise the converter's drop logic
    params, stats = convert_swin_state_dict({"model": ref.state_dict()})
    assert stats == {}
    fmodel = SwinTransformer(
        img_size=(h, w), patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=7, drop_path_rate=0.0,
        output_indices=(0, 1, 2))
    outs = fmodel.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(outs) == len(outs_ref)
    for got, want in zip(outs, outs_ref):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
