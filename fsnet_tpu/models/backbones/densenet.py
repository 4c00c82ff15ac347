"""DenseNet feature backbone (flax.linen, NHWC).

Reference: ``vision_base/networks/models/backbone/densenet.py`` wraps
torchvision's densenet ``.features`` with the transition3 pool removed (so the
last two dense blocks share a stride). This is a native implementation of the
same extractor: stem + 4 dense blocks with transitions, the third transition's
pool elided, returning the final feature map.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..blocks import BatchNorm, max_pool_3x3_s2_p1

_CONFIGS = {
    121: dict(growth_rate=32, block_config=(6, 12, 24, 16), num_init=64),
    161: dict(growth_rate=48, block_config=(6, 12, 36, 24), num_init=96),
    169: dict(growth_rate=32, block_config=(6, 12, 32, 32), num_init=64),
    201: dict(growth_rate=32, block_config=(6, 12, 48, 32), num_init=64),
}


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = jax.nn.relu(BatchNorm(frozen=self.norm_frozen, name="norm1")(x, train))
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    name="conv1")(h)
        h = jax.nn.relu(BatchNorm(frozen=self.norm_frozen, name="norm2")(h, train))
        h = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    out_features: int
    pool: bool = True
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = jax.nn.relu(BatchNorm(frozen=self.norm_frozen, name="norm")(x, train))
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv")(x)
        if self.pool:  # transition3's pool is removed (reference densenet.py:19)
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        return x


class DenseNetFeatures(nn.Module):
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    num_init: int = 64
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        frozen = self.norm_eval
        x = nn.Conv(self.num_init, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, name="conv0")(x)
        x = jax.nn.relu(BatchNorm(frozen=frozen, name="norm0")(x, train))
        x = max_pool_3x3_s2_p1(x)

        features = self.num_init
        for i, layers in enumerate(self.block_config):
            for j in range(layers):
                x = _DenseLayer(self.growth_rate, norm_frozen=frozen,
                                name=f"block{i + 1}_layer{j + 1}")(x, train)
                features += self.growth_rate
            if i != len(self.block_config) - 1:
                features //= 2
                x = _Transition(features, pool=(i != 2), norm_frozen=frozen,
                                name=f"transition{i + 1}")(x, train)
        x = BatchNorm(frozen=frozen, name="norm5")(x, train)
        return x


def densenet(depth: int = 121, **kwargs) -> DenseNetFeatures:
    """Factory (reference ``densenet.py:3-21``)."""
    cfg = dict(_CONFIGS[depth])
    kwargs.pop("pretrained", None)
    cfg.update(kwargs)
    return DenseNetFeatures(**cfg)
