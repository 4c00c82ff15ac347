"""ViT backbone (flax.linen, NHWC) — the reference's MODIFIED variant.

Reference: ``vision_base/networks/models/backbone/vit.py`` — a fork of
PyTorch-Pretrained-ViT with three deliberate edits that this implementation
mirrors exactly:

* the transformer re-adds a SHARED learned positional embedding before
  EVERY block (``Transformer.forward:318-325``: zero-init
  ``transformer.positional_embedding``), on top of the standard one added
  once at the input (``ViT.forward:434-446``);
* every block's attention adds a shared learned [1, S, S] score bias
  before softmax (``MultiHeadedSelfAttention.forward:263-264``:
  ``positional_embedding_attn``, zero-init);
* there is NO final LayerNorm — the class token is stripped and the
  patch-grid features are returned directly (``ViT.forward:447-451``).

Pretrained zoo weights load with ``strict=False`` in the reference, so the
extra (fork-only) parameters keep their zero init — identical here via the
torch converter (``models/torch_convert.py:convert_vit_state_dict``).
``resize_pos_embed`` reproduces the reference's bilinear grid resize for
non-pretrain image sizes (``vit.py:91-118``).
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


class _SelfAttention(nn.Module):
    """Reference ``MultiHeadedSelfAttention:241-275``: separate q/k/v
    projections, additive [1, S, S] score bias, dropout on the attention
    probabilities. The output projection lives in the block (``proj``)."""

    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, score_bias, train: bool = True):
        B, S, D = x.shape
        hd = D // self.num_heads
        q = nn.Dense(D, name="proj_q")(x)
        k = nn.Dense(D, name="proj_k")(x)
        v = nn.Dense(D, name="proj_v")(x)

        def heads(t):
            return t.reshape(B, S, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        scores = scores + score_bias          # [1, S, S] -> [B, H, S, S]
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        h = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return h.transpose(0, 2, 1, 3).reshape(B, S, D)


class _Encoder1DBlock(nn.Module):
    """Reference ``Block:289-306``: pre-norm attention (+ out proj + drop)
    and pre-norm exact-GELU MLP, both residual."""

    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, score_bias, train: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = _SelfAttention(self.dim, self.num_heads, self.dropout,
                           name="attn")(h, score_bias, train)
        h = nn.Dense(self.dim, name="proj")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.ff_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
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

        # fork-only parameters (zero-init, reference ViT.init_weights):
        # a shared pos embedding re-added before every block, and a shared
        # additive attention-score bias
        pos_t = self.param("transformer_pos", nn.initializers.zeros,
                           (1, seq_len, self.dim))
        pos_attn = self.param("transformer_pos_attn", nn.initializers.zeros,
                              (1, seq_len, seq_len))
        for i in range(self.num_layers):
            x = x + pos_t
            x = _Encoder1DBlock(self.dim, self.num_heads, self.ff_dim,
                                self.dropout_rate,
                                name=f"block{i}")(x, pos_attn, train)
        # NO final LayerNorm (reference ViT.forward:447-451)

        if self.classifier == "token":
            x = x[:, 1:]
        return [x.reshape(B, gh, gw, self.dim)]


def vit(pretrained_name: str = "B_16", **kwargs) -> ViT:
    """Preset factory (reference PRETRAINED_MODELS table)."""
    cfg = dict(PRESETS[pretrained_name.lower()])
    cfg.update(kwargs)
    cfg.pop("pretrained", None)
    return ViT(**cfg)
