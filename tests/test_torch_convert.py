"""Weight-conversion parity: a torch ResNet-18 (standard torchvision
architecture, written inline as the oracle) vs our flax ResNet with converted
weights — feature maps must match to float tolerance."""
import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from fsnet_tpu.models import resnet
from fsnet_tpu.models.torch_convert import convert_resnet_state_dict


# ----------------------------------------------------- torch oracle (resnet18)

class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU()

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        for i, planes in enumerate([64, 128, 256, 512]):
            stride = 1 if i == 0 else 2
            setattr(self, f"layer{i + 1}", self._make_layer(planes, 2, stride))

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        layers = [TorchBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers.append(TorchBasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        outs = []
        x = self.relu(self.bn1(self.conv1(x)))
        outs.append(x)
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


def _randomize_bn_stats(model):
    rng = np.random.RandomState(0)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(m.num_features).astype(np.float32) + 0.5))
            m.weight.data.copy_(torch.from_numpy(
                rng.rand(m.num_features).astype(np.float32) + 0.5))
            m.bias.data.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))


def test_resnet18_weight_conversion_parity():
    torch.manual_seed(0)
    oracle = TorchResNet18()
    with torch.no_grad():
        _randomize_bn_stats(oracle)
    oracle.eval()

    params, stats = convert_resnet_state_dict(oracle.state_dict())

    model = resnet(18, out_indices=(-1, 0, 1, 2, 3), norm_eval=True)
    x = np.random.RandomState(1).rand(2, 64, 96, 3).astype(np.float32)

    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))

    assert len(ours) == len(theirs) == 5
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_conv1_multi_image_replication():
    torch.manual_seed(0)
    oracle = TorchResNet18()
    params, stats = convert_resnet_state_dict(oracle.state_dict(),
                                              num_input_images=2)
    k = params["conv1"]["kernel"]
    assert k.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(k[:, :, :3] * 2,
                               oracle.conv1.weight.detach().numpy()
                               .transpose(2, 3, 1, 0), atol=1e-6)
