"""torch checkpoint -> flax parameter conversion.

Reference behavior being replicated: backbones load torchvision model-zoo
weights at construction (``vision_base/networks/models/backbone/resnet.py:222-268``)
including the conv1 replication/averaging for multi-image pose inputs
(``resnet.py:155-160``). The zero-egress build can't download weights, so this
converter maps a LOCAL torch ``.pth``/state-dict into this framework's flax
trees (OIHW -> HWIO kernels, BN param/buffer split into params/batch_stats).

Works on plain tensor dicts — torch is only needed to unpickle ``.pth`` files
(`torch` CPU build is available in the image; numpy arrays also accepted).
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv_kernel(t) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return _to_np(t).transpose(2, 3, 1, 0)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into a flat name->ndarray dict; unwraps the reference's
    ``{model_state_dict, optimizer_state_dict}`` container
    (``vision_base/networks/utils/utils.py:3-9``)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: _to_np(v) for k, v in obj.items()}


def convert_resnet_state_dict(state_dict: Dict, num_input_images: int = 1,
                              prefix: str = "") -> Tuple[Dict, Dict]:
    """torchvision-style ResNet state dict -> (params, batch_stats) flax trees
    matching ``fsnet_tpu.models.backbones.resnet.ResNet`` scope names.

    ``num_input_images > 1`` replicates + averages conv1 along input channels
    (reference ``resnet.py:155-160``).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn(scope_path, torch_name):
        put(params, scope_path + ("bn", "scale"), _to_np(sd[f"{torch_name}.weight"]))
        put(params, scope_path + ("bn", "bias"), _to_np(sd[f"{torch_name}.bias"]))
        put(stats, scope_path + ("bn", "mean"),
            _to_np(sd[f"{torch_name}.running_mean"]))
        put(stats, scope_path + ("bn", "var"),
            _to_np(sd[f"{torch_name}.running_var"]))

    # stem
    conv1 = _conv_kernel(sd["conv1.weight"])  # [7, 7, 3, 64]
    if num_input_images > 1:
        conv1 = np.concatenate([conv1] * num_input_images, axis=2) / num_input_images
    put(params, ("conv1", "kernel"), conv1)
    bn(("bn1",), "bn1")

    # stages: torch layer{i}.{b}.* -> flax layer{i}_{b}/*
    block_re = re.compile(r"^layer(\d+)\.(\d+)\.")
    seen_blocks = sorted({
        (int(m.group(1)), int(m.group(2)))
        for k in sd if (m := block_re.match(k))
    })
    for (stage, block) in seen_blocks:
        t = f"layer{stage}.{block}"
        scope = f"layer{stage}_{block}"
        for conv_idx in (1, 2, 3):
            wname = f"{t}.conv{conv_idx}.weight"
            if wname not in sd:
                continue
            put(params, (scope, f"conv{conv_idx}", "kernel"),
                _conv_kernel(sd[wname]))
            put(params, (scope, f"bn{conv_idx}", "bn", "scale"),
                _to_np(sd[f"{t}.bn{conv_idx}.weight"]))
            put(params, (scope, f"bn{conv_idx}", "bn", "bias"),
                _to_np(sd[f"{t}.bn{conv_idx}.bias"]))
            put(stats, (scope, f"bn{conv_idx}", "bn", "mean"),
                _to_np(sd[f"{t}.bn{conv_idx}.running_mean"]))
            put(stats, (scope, f"bn{conv_idx}", "bn", "var"),
                _to_np(sd[f"{t}.bn{conv_idx}.running_var"]))
        if f"{t}.downsample.0.weight" in sd:
            put(params, (scope, "downsample_conv", "kernel"),
                _conv_kernel(sd[f"{t}.downsample.0.weight"]))
            put(params, (scope, "downsample_bn", "bn", "scale"),
                _to_np(sd[f"{t}.downsample.1.weight"]))
            put(params, (scope, "downsample_bn", "bn", "bias"),
                _to_np(sd[f"{t}.downsample.1.bias"]))
            put(stats, (scope, "downsample_bn", "bn", "mean"),
                _to_np(sd[f"{t}.downsample.1.running_mean"]))
            put(stats, (scope, "downsample_bn", "bn", "var"),
                _to_np(sd[f"{t}.downsample.1.running_var"]))
    return params, stats


def load_torch_resnet(path: str, num_input_images: int = 1,
                      prefix: str = "") -> Tuple[Dict, Dict]:
    """Convenience: .pth path -> (params, batch_stats) for the ResNet backbone."""
    return convert_resnet_state_dict(load_torch_checkpoint(path),
                                     num_input_images=num_input_images,
                                     prefix=prefix)


def convert_depth_decoder_state_dict(state_dict: Dict,
                                     scales=(0, 1, 2, 3),
                                     prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference DepthDecoder/MultiChannelDepthDecoder state dict ->
    (params, batch_stats) matching ``fsnet_tpu.models.heads.depth_decoder``
    scope names.

    The reference registers its conv dict as an nn.ModuleList in insertion
    order (``monodepth/networks/models/heads/depth_encoder.py:46-67``):
    indices 0..9 are (upconv, i, j) for i = 4..0, j = 0, 1 — each a
    vision_base ConvBnReLU whose state lives under ``sequence.0`` (conv) and
    ``sequence.1`` (BN) — and indices 10.. are the plain-Conv2d dispconvs in
    ``scales`` order.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {"trunk": {}}
    stats: Dict = {"trunk": {}}

    idx = 0
    for i in range(4, -1, -1):
        for j in (0, 1):
            t = f"decoder.{idx}.sequence"
            params["trunk"][f"upconv_{i}_{j}"] = {
                "conv": {"kernel": _conv_kernel(sd[f"{t}.0.weight"]),
                         "bias": _to_np(sd[f"{t}.0.bias"])},
                "norm": {"bn": {"scale": _to_np(sd[f"{t}.1.weight"]),
                                "bias": _to_np(sd[f"{t}.1.bias"])}},
            }
            stats["trunk"][f"upconv_{i}_{j}"] = {
                "norm": {"bn": {"mean": _to_np(sd[f"{t}.1.running_mean"]),
                                "var": _to_np(sd[f"{t}.1.running_var"])}},
            }
            idx += 1
    for s in scales:
        t = f"decoder.{idx}"
        params[f"dispconv_{s}"] = {
            "conv": {"kernel": _conv_kernel(sd[f"{t}.weight"]),
                     "bias": _to_np(sd[f"{t}.bias"])}}
        idx += 1
    return params, stats


def convert_wpose_state_dict(state_dict: Dict,
                             scales=(0, 1, 2, 3)) -> Tuple[Dict, Dict]:
    """Full reference MonoDepthWPose state dict (``depth_backbone.*`` ResNet +
    ``head.depth_decoder.*``) -> (params, batch_stats) trees matching
    ``fsnet_tpu.models.MonoDepthWPose`` scopes. Used by the torch-oracle
    full-model parity tests and by checkpoint migration."""
    bb_params, bb_stats = convert_resnet_state_dict(
        state_dict, prefix="depth_backbone.")
    dec_params, dec_stats = convert_depth_decoder_state_dict(
        state_dict, scales=scales, prefix="head.depth_decoder.")
    return ({"depth_backbone": bb_params,
             "head": {"depth_decoder": dec_params}},
            {"depth_backbone": bb_stats,
             "head": {"depth_decoder": dec_stats}})
