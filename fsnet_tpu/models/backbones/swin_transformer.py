"""Swin Transformer backbone (flax.linen, NHWC).

Reference: ``vision_base/networks/models/backbone/swin_transformer.py`` —
windowed MSA with relative position bias (``WindowAttention:66``), shifted
windows + attn mask (``SwinTransformerBlock:164``), ``PatchMerging:292``,
multi-scale pyramid ``forward_features:557-576`` and the ``swinTransformer``
factory (``:591-618``; Swin-T/B presets).

TPU-first notes: windows are formed by reshapes of the NHWC grid (no
permute-to-tokens round trip); the shifted-window attention mask is built from
static shapes at trace time, so the whole model is one fused XLA graph.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..blocks import DropPath


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (reference ``:34-46``)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition` (reference ``:49-63``)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [N, N]


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference ``:66-145``)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        B_, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = (q * scale) @ k.transpose(0, 1, 3, 2)  # [B_, nH, N, N]

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads))
        rel_idx = _relative_position_index(self.window_size).reshape(-1)
        bias = bias_table[rel_idx].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, N, N)

        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    """Shifted-window transformer block (reference ``SwinTransformerBlock:164-271``)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        H, W = self.input_resolution
        B, L, C = x.shape
        ws, ss = self.window_size, self.shift_size
        if min(H, W) <= ws:
            ws, ss = min(H, W), 0

        shortcut = x
        x = nn.LayerNorm(name="norm1")(x).reshape(B, H, W, C)

        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
        windows = window_partition(x, ws)

        mask = None
        if ss > 0:
            img_mask = np.zeros((1, H, W, 1))
            cnt = 0
            for h_sl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                for w_sl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                    img_mask[:, h_sl, w_sl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            mask = jnp.where(mw[:, None, :] - mw[:, :, None] != 0, -100.0, 0.0)

        attn = WindowAttention(self.dim, ws, self.num_heads,
                               qkv_bias=self.qkv_bias, name="attn")(windows,
                                                                    mask)
        x = window_reverse(attn, ws, H, W)
        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
        x = x.reshape(B, L, C)

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train)

        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + DropPath(self.drop_path, name="drop_path2")(h, train)


class PatchMerging(nn.Module):
    """2x2 patch concat + linear reduction (reference ``PatchMerging:292-329``)."""

    input_resolution: Tuple[int, int]
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Multi-scale Swin backbone (reference ``SwinTransformer:459-580``).
    Input NHWC; output list of NHWC pyramid maps per ``output_indices``."""

    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    output_indices: Sequence[int] = (0, 1, 2, 3)
    num_classes: int = 1000  # API parity; no classification head is built

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        B, fh, fw, _ = x.shape
        ph, pw = fh // self.patch_size, fw // self.patch_size

        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(x)
        x = x.reshape(B, ph * pw, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(name="patch_norm")(x)
        if self.ape:
            pos = self.param("absolute_pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, ph * pw, self.embed_dim))
            x = x + pos

        num_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        outputs = []
        if 0 in self.output_indices:
            outputs.append(x.reshape(B, ph, pw, -1))

        cur = 0
        res = (ph, pw)
        dim = self.embed_dim
        for i in range(num_layers):
            for b in range(self.depths[i]):
                x = SwinBlock(
                    dim=dim, input_resolution=res, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path=float(dpr[cur + b]),
                    name=f"layer{i}_block{b}")(x, train)
            cur += self.depths[i]
            if i < num_layers - 1:
                x = PatchMerging(res, dim, name=f"merge{i}")(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
            if (i + 1) in self.output_indices:
                outputs.append(x.reshape(B, res[0], res[1], -1))
        return outputs


def swinTransformer(pretrained_name: str = "Swin-B", pretrained: bool = False,
                    *args, **kwargs) -> SwinTransformer:
    """Factory matching the reference presets (``swin_transformer.py:591-618``).
    Pretrained weights load from a local checkpoint via the torch converter."""
    presets = {
        "swin-t": dict(embed_dim=96, depths=(2, 2, 6, 2),
                       num_heads=(3, 6, 12, 24)),
        "swin-b": dict(embed_dim=128, depths=(2, 2, 18, 2),
                       num_heads=(4, 8, 16, 32)),
    }
    cfg = dict(presets[pretrained_name.lower()])
    cfg.update(kwargs)
    cfg.pop("pretrained", None)
    return SwinTransformer(**cfg)
