"""Deep Layer Aggregation backbone (flax.linen, NHWC).

Reference: ``vision_base/networks/models/backbone/dla.py`` — ``BasicBlock:39``
/ ``Bottleneck:70`` / ``BottleneckX:111`` residual blocks with externally-fed
residual, ``Root:155`` aggregation nodes, recursive ``Tree:176``, ``DLA:232``
trunk (7-scale pyramid incl. base layer), factories ``dla34...dla169``
(``:333-439``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..blocks import BatchNorm


def _conv(features, k, stride=1, dilation=1, groups=1, name=None):
    pad = dilation if k == 3 else (3 if k == 7 else (k - 1) // 2)
    return nn.Conv(features, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=False, name=name)


def _max_pool(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), "VALID")


class DLABasicBlock(nn.Module):
    """Reference ``dla.py:39-67`` (residual passed in by the Tree)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, x, residual=None, train: bool = True):
        if residual is None:
            residual = x
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv1")(x)
        out = jax.nn.relu(BatchNorm(frozen=self.norm_frozen, name="bn1")(out, train))
        out = _conv(self.planes, 3, 1, self.dilation, name="conv2")(out)
        out = BatchNorm(frozen=self.norm_frozen, name="bn2")(out, train)
        return jax.nn.relu(out + residual)


class DLABottleneck(nn.Module):
    """Reference ``dla.py:70-108``; ``expansion`` is a class attribute the
    factories mutate in the reference — here a field."""

    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    cardinality: int = 1     # >1 -> BottleneckX (reference ``:111-152``)
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, x, residual=None, train: bool = True):
        if residual is None:
            residual = x
        if self.cardinality > 1:
            bottle = self.planes * self.cardinality // 32
        else:
            bottle = self.planes // self.expansion
        out = _conv(bottle, 1, name="conv1")(x)
        out = jax.nn.relu(BatchNorm(frozen=self.norm_frozen, name="bn1")(out, train))
        out = _conv(bottle, 3, self.stride, self.dilation,
                    groups=self.cardinality, name="conv2")(out)
        out = jax.nn.relu(BatchNorm(frozen=self.norm_frozen, name="bn2")(out, train))
        out = _conv(self.planes, 1, name="conv3")(out)
        out = BatchNorm(frozen=self.norm_frozen, name="bn3")(out, train)
        return jax.nn.relu(out + residual)


class Root(nn.Module):
    """Aggregation node (reference ``dla.py:155-173``)."""

    out_channels: int
    kernel_size: int = 1
    residual: bool = False
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, *children, train: bool = True):
        x = _conv(self.out_channels, self.kernel_size, name="conv")(
            jnp.concatenate(children, axis=-1))
        x = BatchNorm(frozen=self.norm_frozen, name="bn")(x, train)
        if self.residual:
            x = x + children[0]
        return jax.nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (reference ``dla.py:176-230``)."""

    levels: int
    block: str  # 'basic' | 'bottleneck' | 'bottleneckx'
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_kernel_size: int = 1
    dilation: int = 1
    root_residual: bool = False
    expansion: int = 2
    norm_frozen: bool = False

    def _block(self, planes, stride, name):
        if self.block == "basic":
            return DLABasicBlock(planes, stride, self.dilation,
                                 self.norm_frozen, name=name)
        return DLABottleneck(planes, stride, self.dilation, self.expansion,
                             32 if self.block == "bottleneckx" else 1,
                             self.norm_frozen, name=name)

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = True):
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else list(children)
        bottom = _max_pool(x, self.stride) if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            residual = BatchNorm(frozen=self.norm_frozen, name="project_bn")(
                _conv(self.out_channels, 1, name="project_conv")(bottom), train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = self._block(self.out_channels, self.stride, "tree1")(
                x, residual, train=train)
            x2 = self._block(self.out_channels, 1, "tree2")(x1, train=train)
            return Root(self.out_channels, self.root_kernel_size,
                        self.root_residual, self.norm_frozen, name="root")(
                x2, x1, *children, train=train)

        x1 = Tree(self.levels - 1, self.block, self.in_channels,
                  self.out_channels, self.stride, root_dim=0,
                  root_kernel_size=self.root_kernel_size,
                  dilation=self.dilation, root_residual=self.root_residual,
                  expansion=self.expansion, norm_frozen=self.norm_frozen,
                  name="tree1")(x, residual, train=train)
        children.append(x1)
        return Tree(self.levels - 1, self.block, self.out_channels,
                    self.out_channels, root_dim=root_dim + self.out_channels,
                    root_kernel_size=self.root_kernel_size,
                    dilation=self.dilation, root_residual=self.root_residual,
                    expansion=self.expansion, norm_frozen=self.norm_frozen,
                    name="tree2")(x1, children=children, train=train)


class DLA(nn.Module):
    """7-scale trunk (reference ``DLA:232-330``). ``out_indices`` selects from
    (-1=base, 0..5=levels); scales 1,1,2,4,8,16,32."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    block: str = "basic"
    residual_root: bool = False
    expansion: int = 2
    out_indices: Tuple[int, ...] = (-1, 0, 1, 2, 3, 4, 5)
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        frozen = self.norm_eval
        ch = self.channels

        y = []
        x = _conv(ch[0], 7, 1, name="base_conv")(x)
        x = jax.nn.relu(BatchNorm(frozen=frozen, name="base_bn")(x, train))
        if -1 in self.out_indices:
            y.append(x)

        def conv_level(x, planes, convs, stride, scope):
            for i in range(convs):
                x = _conv(planes, 3, stride if i == 0 else 1,
                          name=f"{scope}_conv{i}")(x)
                x = jax.nn.relu(BatchNorm(frozen=frozen,
                                          name=f"{scope}_bn{i}")(x, train))
            return x

        x = conv_level(x, ch[0], self.levels[0], 1, "level0")
        if 0 in self.out_indices:
            y.append(x)
        x = conv_level(x, ch[1], self.levels[1], 2, "level1")
        if 1 in self.out_indices:
            y.append(x)

        in_ch = ch[1]
        for lvl in range(2, 6):
            x = Tree(self.levels[lvl], self.block, in_ch, ch[lvl], 2,
                     level_root=(lvl != 2), root_residual=self.residual_root,
                     expansion=self.expansion, norm_frozen=frozen,
                     name=f"level{lvl}")(x, train=train)
            in_ch = ch[lvl]
            if lvl in self.out_indices:
                y.append(x)
        return y


_FACTORIES = {
    34: dict(levels=(1, 1, 1, 2, 2, 1), channels=(16, 32, 64, 128, 256, 512),
             block="basic"),
    46: dict(levels=(1, 1, 1, 2, 2, 1), channels=(16, 32, 64, 64, 128, 256),
             block="bottleneck", expansion=2),
    60: dict(levels=(1, 1, 1, 2, 3, 1), channels=(16, 32, 128, 256, 512, 1024),
             block="bottleneck", expansion=2),
    102: dict(levels=(1, 1, 1, 3, 4, 1),
              channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
              expansion=2, residual_root=True),
    169: dict(levels=(1, 1, 2, 3, 5, 1),
              channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
              expansion=2, residual_root=True),
}


def dlanet(depth: int = 34, pretrained=None, **kwargs) -> DLA:
    """Factory (reference ``dlanet:427-439``); pretrained weights via the
    torch converter from a local checkpoint."""
    cfg = dict(_FACTORIES[depth])
    kwargs.pop("pretrained", None)
    cfg.update(kwargs)
    return DLA(**cfg)
