"""ViT backbone (flax.linen, NHWC).

Reference: ``vision_base/networks/models/backbone/vit.py`` — ``ViT:338``
(patch embedding, class token, 1D positional embedding, pre-norm transformer,
single-scale output at patch resolution) with pos-embed resize for
non-pretrain image sizes (``resize_pos_embed:91``; here
:func:`resize_pos_embed` works on numpy arrays for the weight converter).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

PRESETS = {
    "b_16": dict(patches=16, dim=768, ff_dim=3072, num_heads=12, num_layers=12),
    "b_32": dict(patches=32, dim=768, ff_dim=3072, num_heads=12, num_layers=12),
    "l_16": dict(patches=16, dim=1024, ff_dim=4096, num_heads=16,
                 num_layers=24),
}


def resize_pos_embed(posemb: np.ndarray, gh_gw_old, gh_gw_new,
                     has_class_token: bool = True) -> np.ndarray:
    """Bilinear pos-embed grid resize (reference ``vit.py:91-118``), used by
    the torch-weight converter when image sizes differ."""
    import cv2

    if has_class_token:
        tok, grid = posemb[:, :1], posemb[0, 1:]
    else:
        tok, grid = posemb[:, :0], posemb[0]
    gh, gw = gh_gw_old
    grid = grid.reshape(gh, gw, -1)
    grid = cv2.resize(grid, (gh_gw_new[1], gh_gw_new[0]),
                      interpolation=cv2.INTER_LINEAR)
    grid = grid.reshape(1, gh_gw_new[0] * gh_gw_new[1], -1)
    return np.concatenate([tok, grid], axis=1)


class _Encoder1DBlock(nn.Module):
    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.LayerNorm(name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            name="attn")(h, h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h

        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ff_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class ViT(nn.Module):
    """Reference ``ViT:338-451``; input NHWC, returns a single-scale feature
    map [B, H/patches, W/patches, dim] in a list."""

    pretrained_name: Optional[str] = None
    pretrained: bool = False  # API parity; weights via torch_convert
    patches: int = 16
    dim: int = 768
    ff_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    dropout_rate: float = 0.1
    classifier: str = "token"
    image_size: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        B, fh, fw, _ = x.shape
        gh, gw = fh // self.patches, fw // self.patches

        x = nn.Conv(self.dim, (self.patches, self.patches),
                    strides=(self.patches, self.patches), padding="VALID",
                    name="patch_embedding")(x)
        x = x.reshape(B, gh * gw, self.dim)

        seq_len = gh * gw
        if self.classifier == "token":
            cls = self.param("class_token", nn.initializers.zeros,
                             (1, 1, self.dim))
            x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x],
                                axis=1)
            seq_len += 1

        pos = self.param("pos_embedding",
                         nn.initializers.normal(0.02), (1, seq_len, self.dim))
        x = x + pos

        for i in range(self.num_layers):
            x = _Encoder1DBlock(self.dim, self.num_heads, self.ff_dim,
                                self.dropout_rate, name=f"block{i}")(x, train)
        x = nn.LayerNorm(name="norm")(x)

        if self.classifier == "token":
            x = x[:, 1:]
        return [x.reshape(B, gh, gw, self.dim)]


def vit(pretrained_name: str = "B_16", **kwargs) -> ViT:
    """Preset factory (reference PRETRAINED_MODELS table)."""
    cfg = dict(PRESETS[pretrained_name.lower()])
    cfg.update(kwargs)
    cfg.pop("pretrained", None)
    return ViT(**cfg)
