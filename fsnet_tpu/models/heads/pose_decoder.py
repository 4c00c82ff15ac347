"""6-DoF pose decoder (flax.linen, NHWC).

Reference: ``monodepth/networks/models/heads/pose_decoder.py:5-45`` — squeeze
1x1 conv per input feature pyramid, 3 conv stages, global mean, 0.01-scaled
(axisangle, translation) split.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class PoseDecoder(nn.Module):
    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)  # API parity
    num_input_features: int = 1
    num_frames_to_predict_for: int = None  # type: ignore[assignment]
    stride: int = 1

    @nn.compact
    def __call__(self, input_features):
        """``input_features``: list (length ``num_input_features``) of feature
        pyramids; only the last (coarsest) map of each is used
        (reference ``pose_decoder.py:26-29``). Returns (axisangle, translation)
        each [B, num_frames, 1, 3]."""
        n_frames = self.num_frames_to_predict_for
        if n_frames is None:
            n_frames = self.num_input_features - 1

        last_features = [f[-1] for f in input_features]
        squeeze = nn.Conv(256, (1, 1), name="squeeze")  # shared across inputs
        cat = jnp.concatenate(
            [jax.nn.relu(squeeze(f)) for f in last_features], axis=-1)
        out = nn.Conv(256, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), name="pose_0")(cat)
        out = jax.nn.relu(out)
        out = nn.Conv(256, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), name="pose_1")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(6 * n_frames, (1, 1), name="pose_2")(out)

        out = out.mean(axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, n_frames, 1, 6)
        return out[..., :3], out[..., 3:]
