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

def _norm_densenet_keys(sd: Dict) -> Dict:
    """Normalize pre-torchvision-1.0 densenet key spellings
    (``norm.1`` -> ``norm1`` etc.), as torchvision's own loader does."""
    pat = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|"
        r"running_mean|running_var))$")
    out = {}
    for k, v in sd.items():
        m = pat.match(k)
        # "norm.1.weight" -> "norm1.weight" (group1 ends with the op name)
        out[m.group(1) + m.group(2) if m else k] = v
    return out


def convert_densenet_state_dict(state_dict: Dict,
                                prefix: str = "features.") -> Tuple[Dict, Dict]:
    """torchvision densenet state dict -> (params, batch_stats) flax trees
    matching ``fsnet_tpu.models.backbones.densenet.DenseNetFeatures`` scopes.

    The reference wraps torchvision's ``.features`` extractor
    (``vision_base/networks/models/backbone/densenet.py:3-21``); the
    classifier head is ignored.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    sd = _norm_densenet_keys(sd)

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn(scope_path, torch_name):
        put(params, scope_path + ("bn", "scale"),
            _to_np(sd[f"{torch_name}.weight"]))
        put(params, scope_path + ("bn", "bias"),
            _to_np(sd[f"{torch_name}.bias"]))
        put(stats, scope_path + ("bn", "mean"),
            _to_np(sd[f"{torch_name}.running_mean"]))
        put(stats, scope_path + ("bn", "var"),
            _to_np(sd[f"{torch_name}.running_var"]))

    put(params, ("conv0", "kernel"), _conv_kernel(sd["conv0.weight"]))
    bn(("norm0",), "norm0")

    layer_re = re.compile(r"^denseblock(\d+)\.denselayer(\d+)\.conv1\.weight$")
    for k in sorted(sd):
        m = layer_re.match(k)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        t = f"denseblock{i}.denselayer{j}"
        scope = f"block{i}_layer{j}"
        bn((scope, "norm1"), f"{t}.norm1")
        put(params, (scope, "conv1", "kernel"),
            _conv_kernel(sd[f"{t}.conv1.weight"]))
        bn((scope, "norm2"), f"{t}.norm2")
        put(params, (scope, "conv2", "kernel"),
            _conv_kernel(sd[f"{t}.conv2.weight"]))
    for i in (1, 2, 3):
        if f"transition{i}.conv.weight" not in sd:
            continue
        bn((f"transition{i}", "norm"), f"transition{i}.norm")
        put(params, (f"transition{i}", "conv", "kernel"),
            _conv_kernel(sd[f"transition{i}.conv.weight"]))
    bn(("norm5",), "norm5")
    return params, stats

def _dense_kernel(t) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return _to_np(t).transpose(1, 0)


def _ln(params, scope_path, sd, torch_name):
    node = params
    for p in scope_path[:-1]:
        node = node.setdefault(p, {})
    node[scope_path[-1]] = {"scale": _to_np(sd[f"{torch_name}.weight"]),
                            "bias": _to_np(sd[f"{torch_name}.bias"])}


def convert_convnext_state_dict(state_dict: Dict,
                                prefix: str = "") -> Tuple[Dict, Dict]:
    """Official-ConvNeXt state dict (the reference downloads these and
    ``load_state_dict``s them, ``vision_base/.../convnext.py:153-214``;
    checkpoints wrap the dict under a ``model`` key, unwrapped by
    ``load_torch_checkpoint``-style callers or here) -> (params, {}) flax
    trees matching ``fsnet_tpu.models.backbones.convnext.ConvNeXt`` scopes.
    ConvNeXt has no BN buffers, so batch_stats is empty."""
    if "model" in state_dict and not any(
            k.startswith("downsample_layers") for k in state_dict):
        state_dict = state_dict["model"]
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    params: Dict = {}
    params["stem_conv"] = {
        "kernel": _conv_kernel(sd["downsample_layers.0.0.weight"]),
        "bias": _to_np(sd["downsample_layers.0.0.bias"])}
    _ln(params, ("stem_norm",), sd, "downsample_layers.0.1")
    for i in (1, 2, 3):
        if f"downsample_layers.{i}.1.weight" not in sd:
            continue
        _ln(params, (f"down_norm_{i}",), sd, f"downsample_layers.{i}.0")
        params[f"down_conv_{i}"] = {
            "kernel": _conv_kernel(sd[f"downsample_layers.{i}.1.weight"]),
            "bias": _to_np(sd[f"downsample_layers.{i}.1.bias"])}

    blk_re = re.compile(r"^stages\.(\d+)\.(\d+)\.dwconv\.weight$")
    for k in sorted(sd):
        m = blk_re.match(k)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        t = f"stages.{i}.{j}"
        scope: Dict = {
            "dwconv": {"kernel": _conv_kernel(sd[f"{t}.dwconv.weight"]),
                       "bias": _to_np(sd[f"{t}.dwconv.bias"])},
            "norm": {"scale": _to_np(sd[f"{t}.norm.weight"]),
                     "bias": _to_np(sd[f"{t}.norm.bias"])},
            "pwconv1": {"kernel": _dense_kernel(sd[f"{t}.pwconv1.weight"]),
                        "bias": _to_np(sd[f"{t}.pwconv1.bias"])},
            "pwconv2": {"kernel": _dense_kernel(sd[f"{t}.pwconv2.weight"]),
                        "bias": _to_np(sd[f"{t}.pwconv2.bias"])},
        }
        if f"{t}.gamma" in sd:
            scope["gamma"] = _to_np(sd[f"{t}.gamma"])
        params[f"stage{i}_block{j}"] = scope
    return params, {}

def convert_vit_state_dict(state_dict: Dict, grid_old=None, grid_new=None,
                           prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference-fork ViT state dict -> (params, {}) flax trees matching
    ``fsnet_tpu.models.backbones.vit.ViT`` scopes.

    Handles both model-zoo checkpoints (standard PyTorch-Pretrained-ViT
    names; the fork-only zero-init params are simply absent, exactly the
    reference's ``strict=False`` load, ``vit.py:12-90``) and
    reference-trained checkpoints (which carry
    ``transformer.positional_embedding.pos_embedding`` and
    ``transformer.positional_embedding_attn.pos_embedding``). When
    ``grid_old``/``grid_new`` differ the positional embedding is resized
    bilinearly (reference ``resize_positional_embedding``, ``vit.py:91-118``).
    """
    from .backbones.vit import resize_pos_embed

    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}
    if "class_token" in sd:
        params["class_token"] = _to_np(sd["class_token"])
    pos = _to_np(sd["positional_embedding.pos_embedding"])
    if grid_old is not None and tuple(grid_old) != tuple(grid_new):
        pos = resize_pos_embed(pos, grid_old, grid_new)
    params["pos_embedding"] = pos
    if "transformer.positional_embedding.pos_embedding" in sd:
        params["transformer_pos"] = _to_np(
            sd["transformer.positional_embedding.pos_embedding"])
        params["transformer_pos_attn"] = _to_np(
            sd["transformer.positional_embedding_attn.pos_embedding"])
    params["patch_embedding"] = {
        "kernel": _conv_kernel(sd["patch_embedding.weight"]),
        "bias": _to_np(sd["patch_embedding.bias"])}

    blk_re = re.compile(r"^transformer\.blocks\.(\d+)\.norm1\.weight$")
    for k in sorted(sd):
        m = blk_re.match(k)
        if not m:
            continue
        i = int(m.group(1))
        t = f"transformer.blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": _to_np(sd[f"{t}.norm1.weight"]),
                      "bias": _to_np(sd[f"{t}.norm1.bias"])},
            "norm2": {"scale": _to_np(sd[f"{t}.norm2.weight"]),
                      "bias": _to_np(sd[f"{t}.norm2.bias"])},
            "attn": {
                p: {"kernel": _dense_kernel(sd[f"{t}.attn.{p}.weight"]),
                    "bias": _to_np(sd[f"{t}.attn.{p}.bias"])}
                for p in ("proj_q", "proj_k", "proj_v")},
            "proj": {"kernel": _dense_kernel(sd[f"{t}.proj.weight"]),
                     "bias": _to_np(sd[f"{t}.proj.bias"])},
            "fc1": {"kernel": _dense_kernel(sd[f"{t}.pwff.fc1.weight"]),
                    "bias": _to_np(sd[f"{t}.pwff.fc1.bias"])},
            "fc2": {"kernel": _dense_kernel(sd[f"{t}.pwff.fc2.weight"]),
                    "bias": _to_np(sd[f"{t}.pwff.fc2.bias"])},
        }
    return params, {}


def convert_swin_state_dict(state_dict: Dict,
                            prefix: str = "") -> Tuple[Dict, Dict]:
    """Official-Swin state dict -> (params, {}) flax trees matching
    ``fsnet_tpu.models.backbones.swin_transformer.SwinTransformer`` scopes.

    The reference downloads the official checkpoints (wrapped under a
    ``model`` key) and ``load_state_dict``s them with ``strict=False``
    after dropping ``attn_mask`` buffers
    (``vision_base/networks/models/backbone/swin_transformer.py:591-612``);
    the fork has no final norm or classifier, so ``norm.*`` / ``head.*``
    (and the ``relative_position_index`` buffers, recomputed statically
    here) are likewise dropped.
    """
    if "model" in state_dict and not hasattr(state_dict["model"], "shape"):
        state_dict = state_dict["model"]
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    params: Dict = {}
    params["patch_embed"] = {
        "kernel": _conv_kernel(sd["patch_embed.proj.weight"]),
        "bias": _to_np(sd["patch_embed.proj.bias"])}
    if "patch_embed.norm.weight" in sd:
        params["patch_norm"] = {
            "scale": _to_np(sd["patch_embed.norm.weight"]),
            "bias": _to_np(sd["patch_embed.norm.bias"])}
    if "absolute_pos_embed" in sd:
        params["absolute_pos_embed"] = _to_np(sd["absolute_pos_embed"])

    def ln(torch_name):
        return {"scale": _to_np(sd[f"{torch_name}.weight"]),
                "bias": _to_np(sd[f"{torch_name}.bias"])}

    blk_re = re.compile(r"^layers\.(\d+)\.blocks\.(\d+)\.norm1\.weight$")
    for k in sorted(sd):
        m = blk_re.match(k)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        t = f"layers.{i}.blocks.{j}"
        attn: Dict = {
            "relative_position_bias_table": _to_np(
                sd[f"{t}.attn.relative_position_bias_table"]),
            "qkv": {"kernel": _dense_kernel(sd[f"{t}.attn.qkv.weight"])},
            "proj": {"kernel": _dense_kernel(sd[f"{t}.attn.proj.weight"]),
                     "bias": _to_np(sd[f"{t}.attn.proj.bias"])},
        }
        if f"{t}.attn.qkv.bias" in sd:
            attn["qkv"]["bias"] = _to_np(sd[f"{t}.attn.qkv.bias"])
        params[f"layer{i}_block{j}"] = {
            "norm1": ln(f"{t}.norm1"),
            "attn": attn,
            "norm2": ln(f"{t}.norm2"),
            "mlp_fc1": {"kernel": _dense_kernel(sd[f"{t}.mlp.fc1.weight"]),
                        "bias": _to_np(sd[f"{t}.mlp.fc1.bias"])},
            "mlp_fc2": {"kernel": _dense_kernel(sd[f"{t}.mlp.fc2.weight"]),
                        "bias": _to_np(sd[f"{t}.mlp.fc2.bias"])},
        }
    ds_re = re.compile(r"^layers\.(\d+)\.downsample\.reduction\.weight$")
    for k in sorted(sd):
        m = ds_re.match(k)
        if not m:
            continue
        i = int(m.group(1))
        t = f"layers.{i}.downsample"
        params[f"merge{i}"] = {
            "norm": ln(f"{t}.norm"),
            "reduction": {"kernel": _dense_kernel(sd[f"{t}.reduction.weight"])},
        }
    return params, {}
