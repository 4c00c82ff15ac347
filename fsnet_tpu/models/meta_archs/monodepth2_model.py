"""MonoDepth meta-architectures (flax.linen).

Reference: ``monodepth/networks/models/meta_archs/monodepth2_model.py`` —
``MonoDepthMeta:8`` (learned pose), ``MonoDepthWPose:66`` (GT-pose "full-scale"
flagship, optional residual-pose refinement), ``DistillWPoseMeta:150``
(frozen-teacher self-distillation) — and ``teacher_model.py:5``
(``MonoDepthInference``).

Batches cross the jit boundary string-keyed (``'image/0'``); meta-archs decode
to the reference's tuple-key protocol at entry. ``meta['is_training']`` is a
static python bool (two traced graphs, reference ``base_meta.py:19-23``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.geometry import transformation_from_parameters
from ...utils.builder import build
from ...utils.keys import decode_batch
from .base_meta import BaseMetaArch


def _decode(data: Dict) -> Dict:
    """String-keyed jit-boundary batch -> tuple-key protocol dict."""
    if any("/" in k for k in data if isinstance(k, str)):
        return decode_batch(data)
    return dict(data)


class MonoDepthMeta(BaseMetaArch):
    """monodepth2 baseline: depth net on frame 0 + pose net on frame pairs
    (reference ``monodepth2_model.py:8-64``)."""

    depth_backbone_cfg: Optional[Dict] = None
    pose_backbone_cfg: Optional[Dict] = None
    head_cfg: Optional[Dict] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None

    def setup(self):
        self.depth_backbone = build(**dict(self.depth_backbone_cfg))
        self.pose_backbone = build(**dict(self.pose_backbone_cfg))
        self.head = build(frame_ids=tuple(self.train_cfg["frame_ids"]),
                          **dict(self.head_cfg))

    def _noise_rng(self):
        return self.make_rng("loss_noise") if self.has_rng("loss_noise") else None

    def forward_train(self, data: Dict, meta: Dict) -> Dict:
        data = _decode(data)
        frame_ids = list(self.train_cfg["frame_ids"])

        image_0 = data[("image", 0)]
        features = self.depth_backbone(image_0, train=True)
        outputs = self.head.forward_depth(features, train=True)

        for f_i in frame_ids[1:]:
            if f_i < 0:
                pose_inputs = [data[("image", f_i)], data[("image", 0)]]
            else:
                pose_inputs = [data[("image", 0)], data[("image", f_i)]]
            pose_feats = [self.pose_backbone(
                jnp.concatenate(pose_inputs, axis=-1), train=True)]
            axisangle, translation = self.head.forward_pose(pose_feats)

            outputs[("axisangle", f_i)] = axisangle
            outputs[("translation", f_i)] = translation
            outputs[("cam_T_cam", f_i)] = transformation_from_parameters(
                axisangle[:, 0], translation[:, 0], invert=(f_i < 0))

        return self.head.loss(outputs, data, noise_rng=self._noise_rng())

    def forward_test(self, data: Dict, meta: Dict) -> Dict:
        data = _decode(data)
        features = self.depth_backbone(data[("image", 0)], train=False)
        outputs = self.head.forward_depth(features, train=False)
        return self.head.get_prediction(data, outputs)

    def dummy_forward(self, image) -> Dict:
        features = self.depth_backbone(image, train=False)
        outputs = self.head.forward_depth(features, train=False)
        return self.head.get_prediction(None, outputs)


class MonoDepthWPose(BaseMetaArch):
    """"Full-scale" flagship: dataset GT relative poses drive the warp;
    optional residual-pose branch refines them with translation re-scaling
    (reference ``monodepth2_model.py:66-148``)."""

    depth_backbone_cfg: Optional[Dict] = None
    head_cfg: Optional[Dict] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None
    pose_backbone_cfg: Optional[Dict] = None

    def setup(self):
        self.depth_backbone = build(**dict(self.depth_backbone_cfg))
        self.head = build(frame_ids=tuple(self.train_cfg["frame_ids"]),
                          **dict(self.head_cfg))
        self.is_use_res_pose = self.pose_backbone_cfg is not None
        if self.is_use_res_pose:
            self.pose_backbone = build(**dict(self.pose_backbone_cfg))

    def _noise_rng(self):
        return self.make_rng("loss_noise") if self.has_rng("loss_noise") else None

    def forward_train(self, data: Dict, meta: Dict) -> Dict:
        data = _decode(data)
        frame_ids = list(self.train_cfg["frame_ids"])
        depth_production_frames = list(
            self.train_cfg.get("depth_production_frames", [0]))

        outputs: Dict = {}
        for f_i in depth_production_frames:
            image_0 = data[("image", 0)]
            features = self.depth_backbone(image_0, train=True)
            output_f_i = self.head.forward_depth(features, data["P2"], train=True)
            if f_i == 0:
                outputs.update(output_f_i)
            else:
                # reference quirk kept: re-keys frame-0 outputs under depth_{f}
                # (monodepth2_model.py:92-98)
                for key in output_f_i:
                    if key[0] == "depth":
                        outputs[(f"depth_{f_i}", key[1], key[2])] = outputs[key]

        if self.is_use_res_pose:
            for f_i in frame_ids[1:]:
                if f_i < 0:
                    pose_inputs = [data[("image", f_i)], data[("image", 0)]]
                    base_pose = data[("relative_pose", f_i)]
                else:
                    pose_inputs = [data[("image", 0)], data[("image", f_i)]]
                    base_pose = jnp.linalg.inv(data[("relative_pose", f_i)])

                pose_feats = [self.pose_backbone(
                    jnp.concatenate(pose_inputs, axis=-1), train=True)]
                axisangle, translation = self.head.forward_pose(pose_feats,
                                                                base_pose)
                outputs[("axisangle", f_i)] = axisangle
                outputs[("translation", f_i)] = translation

                # compose residual with GT, then re-scale translation so the
                # refined pose keeps the GT translation norm (reference
                # monodepth2_model.py:112-123; per-sample norms here — the
                # reference reduces over the whole batch, a latent bug in a
                # branch its shipped configs never enable)
                T = jnp.matmul(
                    data[("relative_pose", f_i)],
                    transformation_from_parameters(
                        axisangle[:, 0], translation[:, 0], invert=(f_i < 0)))
                gt_norm = jnp.linalg.norm(
                    data[("relative_pose", f_i)][:, :3, 3], axis=-1)
                ratio = jnp.linalg.norm(T[:, :3, 3], axis=-1) / (gt_norm + 1e-12)
                scale = jnp.ones_like(T)
                scale = scale.at[:, :3, 3].set(ratio[:, None])
                outputs[("cam_T_cam", f_i)] = T / scale
        else:
            for f_i in frame_ids[1:]:
                outputs[("cam_T_cam", f_i)] = data[("relative_pose", f_i)]
            # static marker: every warp pose is a dataset constant, so the
            # head may take the depth-direct Pallas warp (no pose gradient
            # path exists). Popped by _warp_all before the dict crosses any
            # jit boundary.
            outputs["pose_is_const"] = True

        return self.head.loss(outputs, data, noise_rng=self._noise_rng())

    def forward_test(self, data: Dict, meta: Dict) -> Dict:
        data = _decode(data)
        features = self.depth_backbone(data[("image", 0)], train=False)
        outputs = self.head.forward_depth(features, data["P2"], train=False)
        return self.head.get_prediction(data, outputs)

    def dummy_forward(self, image) -> Dict:
        features = self.depth_backbone(image, train=False)
        outputs = self.head.forward_depth(features, train=False)
        return self.head.get_prediction(None, outputs)


class MonoDepthInference(nn.Module):
    """Inference-only backbone + decoder used as the distill teacher
    (reference ``teacher_model.py:5-32``). Teacher parameters live under this
    submodule's scope; the optimizer masks them out and the checkpoint loader
    grafts trained weights in (``runtime/checkpoint.py``)."""

    backbone_cfg: Optional[Dict] = None
    depth_head_cfg: Optional[Dict] = None
    is_produce_detached: bool = True

    def setup(self):
        self.depth_backbone = build(**dict(self.backbone_cfg))
        self.depth_decoder = build(**dict(self.depth_head_cfg))

    def __call__(self, x, train: bool = False):
        features = self.depth_backbone(x, train=False)
        return self.depth_decoder(features, train=False)

    def compute_teacher_depth(self, x):
        output_dict = self(x)
        teacher_output = {}
        for key in output_dict:
            if key[0] == "depth":
                value = output_dict[key]
                if self.is_produce_detached:
                    value = jax.lax.stop_gradient(value)
                teacher_output[("teacher_depth", key[1], key[2])] = value
        return teacher_output


class DistillWPoseMeta(BaseMetaArch):
    """Self-distillation: frozen teacher depth merged into student outputs,
    GT poses for warping (reference ``monodepth2_model.py:150-206``)."""

    teacher_net_cfg: Optional[Dict] = None
    depth_backbone_cfg: Optional[Dict] = None
    teacher_net_path: str = ""  # consumed by runtime checkpoint surgery
    head_cfg: Optional[Dict] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None

    def setup(self):
        self.teacher_net = build(**dict(self.teacher_net_cfg))
        self.depth_backbone = build(**dict(self.depth_backbone_cfg))
        self.head = build(frame_ids=tuple(self.train_cfg["frame_ids"]),
                          **dict(self.head_cfg))

    def _noise_rng(self):
        return self.make_rng("loss_noise") if self.has_rng("loss_noise") else None

    def forward_train(self, data: Dict, meta: Dict) -> Dict:
        data = _decode(data)
        frame_ids = list(self.train_cfg["frame_ids"])

        image_0 = data[("image", 0)]
        features = self.depth_backbone(image_0, train=True)
        outputs = self.head.forward_depth(features, data["P2"], train=True)
        outputs.update(self.teacher_net.compute_teacher_depth(image_0))

        for f_i in frame_ids[1:]:
            outputs[("cam_T_cam", f_i)] = data[("relative_pose", f_i)]
        outputs["pose_is_const"] = True  # see MonoDepthWPose.forward_train

        return self.head.loss(outputs, data, noise_rng=self._noise_rng())

    def forward_test(self, data: Dict, meta: Dict) -> Dict:
        data = _decode(data)
        features = self.depth_backbone(data[("image", 0)], train=False)
        outputs = self.head.forward_depth(features, data["P2"], train=False)
        return self.head.get_prediction(data, outputs)

    def dummy_forward(self, image) -> Dict:
        features = self.depth_backbone(image, train=False)
        outputs = self.head.forward_depth(features, train=False)
        return self.head.get_prediction(None, outputs)
