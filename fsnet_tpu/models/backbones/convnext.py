"""ConvNeXt feature backbone (flax.linen, NHWC).

Reference: ``vision_base/networks/models/backbone/convnext.py`` — ``Block:14``
(7x7 depthwise -> LN -> MLP with layer-scale gamma + DropPath),
``ConvNeXt:53`` (4x4 stem + 3 LN+2x2 downsample stages, multi-scale
``out_indices`` pyramid), factory ``convNext:204`` (T/S/B/L/XL).

NHWC is ConvNeXt's natural layout (the reference permutes to channels-last
inside every block anyway); no permutes needed here.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..blocks import DropPath

_VARIANTS = {
    "convnext-t": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext-s": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext-b": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext-l": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext-xt": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    """Reference ``Block:14-51``."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda key: jnp.full((self.dim,), self.layer_scale_init_value))
            x = gamma * x
        if self.drop_path > 0:
            x = DropPath(self.drop_path, name="drop_path")(x, train)
        return inp + x


class ConvNeXt(nn.Module):
    """Reference ``ConvNeXt:53-131`` (feature-pyramid forward)."""

    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        # numpy (not jnp): these are static per-block hyperparameters — a
        # traced linspace would break float() under jit (init is jitted).
        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outputs = []
        cur = 0
        max_step = max(self.out_indices) + 1
        for i in range(max_step):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                            padding="VALID", name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down_norm_{i}")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2),
                            padding="VALID", name=f"down_conv_{i}")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(
                    dim=self.dims[i],
                    drop_path=float(dp_rates[cur + j]),
                    layer_scale_init_value=self.layer_scale_init_value,
                    name=f"stage{i}_block{j}")(x, train)
            cur += self.depths[i]
            if i in self.out_indices:
                outputs.append(x)
        return outputs


def convNext(pretrained_name: str = "ConvNeXt-T", pretrained: bool = False,
             **kwargs) -> ConvNeXt:
    """Config-facing factory (reference ``convnext.py:204-214``). Pretrained
    weights come from a local checkpoint via the torch converter (zero-egress
    build; see ``torch_convert.py``)."""
    kwargs.pop("pretrained", None)
    variant = _VARIANTS[pretrained_name.lower()]
    return ConvNeXt(depths=variant["depths"], dims=variant["dims"], **kwargs)
