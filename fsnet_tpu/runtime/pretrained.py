"""Pretrained-encoder wiring: config ``pretrained``/``pretrained_path`` ->
converted torchvision weights grafted into a fresh TrainState.

Reference behavior: backbones load ImageNet weights at construction, with
conv1 replicated/averaged for multi-image pose inputs
(``/root/reference/vision_base/networks/models/backbone/resnet.py:155-160,
270-284``); every shipped config trains from pretrained encoders, and
self-supervised monodepth converges far worse from scratch.

In the functional design, weight loading is decoupled from module
construction: :func:`graft_pretrained_backbones` runs once in
``scripts/train.py`` after ``init_state`` and grafts converted trees into
``state.params`` / ``state.batch_stats``. The zero-egress build cannot
download the model zoo, so weights must exist locally — either an explicit
``pretrained_path`` in the backbone cfg, or a torchvision-style cache dir
(``$FSNET_PRETRAINED_DIR``, ``$TORCH_HOME/hub/checkpoints``,
``~/.cache/torch/hub/checkpoints``). ``pretrained=True`` with no findable
weights is a hard error: silently training from scratch is the round-1 bug
this module closes.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional, Tuple


#: search roots for torchvision-style weight caches, in priority order
def _cache_dirs() -> List[str]:
    dirs = []
    if os.environ.get("FSNET_PRETRAINED_DIR"):
        dirs.append(os.environ["FSNET_PRETRAINED_DIR"])
    torch_home = os.environ.get("TORCH_HOME",
                                os.path.expanduser("~/.cache/torch"))
    dirs.append(os.path.join(torch_home, "hub", "checkpoints"))
    dirs.append(os.path.join(torch_home, "checkpoints"))
    return dirs


def _find_cached_weights(patterns: List[str]) -> Optional[str]:
    """First file matching any torchvision filename pattern in the caches."""
    for d in _cache_dirs():
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(d, pat)))
            if hits:
                return hits[0]
    return None


def _count_leaves(tree: Any) -> int:
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return sum(_count_leaves(v) for v in tree.values())
    return 1


def _count_matching(target: Any, source: Any) -> int:
    """Leaves of ``source`` that land in ``target`` under the
    same-path/same-shape graft rule of ``load_partial_state_dict``."""
    if isinstance(source, dict) or hasattr(source, "items"):
        if not (isinstance(target, dict) or hasattr(target, "items")):
            return 0
        return sum(_count_matching(target[k], v)
                   for k, v in source.items() if k in target)
    return int(getattr(target, "shape", None) == getattr(source, "shape", ()))


def _resnet_weight_patterns(depth: int) -> List[str]:
    return [f"resnet{depth}-*.pth", f"resnet{depth}.pth"]


def _load_raw_state_dict(path: str) -> Dict:
    """torch.load a checkpoint and unwrap the common container keys
    (reference checkpoints: ``model_state_dict``; official Swin/ConvNeXt
    releases: ``model``; generic trainers: ``state_dict``) while keeping
    tensor values raw for the per-backbone converters."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
    return obj


def convert_backbone_weights(backbone_cfg: Dict,
                             weights_path: str) -> Tuple[Dict, Dict]:
    """Dispatch a local torch ``.pth`` to the matching converter. Returns
    (params, batch_stats) flax trees for the backbone scope.

    Mirrors the reference's per-backbone pretrained loaders: ResNet
    (``resnet.py:270-284``), Swin (``swin_transformer.py:591-612``), ViT
    (``vit.py:12-90``), ConvNeXt (``convnext.py:153-214``), DenseNet
    (torchvision wrapper, ``densenet.py:3-21``)."""
    name = str(backbone_cfg.get("name", "")).lower()
    if name.endswith(".resnet.resnet") or name.endswith("resnet"):
        from ..models.torch_convert import load_torch_resnet

        return load_torch_resnet(
            weights_path,
            num_input_images=int(backbone_cfg.get("num_input_images", 1)))
    if "swin" in name:
        from ..models.torch_convert import convert_swin_state_dict

        return convert_swin_state_dict(_load_raw_state_dict(weights_path))
    if "convnext" in name:
        from ..models.torch_convert import convert_convnext_state_dict

        return convert_convnext_state_dict(_load_raw_state_dict(weights_path))
    if "densenet" in name:
        from ..models.torch_convert import convert_densenet_state_dict

        return convert_densenet_state_dict(_load_raw_state_dict(weights_path))
    if name.endswith(".vit") or name.endswith(".vit.vit") or "vit" in name:
        from ..models.backbones.vit import PRESETS
        from ..models.torch_convert import convert_vit_state_dict

        sd = _load_raw_state_dict(weights_path)
        grid_old = grid_new = None
        image_size = backbone_cfg.get("image_size")
        if image_size is not None:
            preset = PRESETS.get(
                str(backbone_cfg.get("pretrained_name", "B_16")).lower(), {})
            patches = int(backbone_cfg.get("patches",
                                           preset.get("patches", 16)))
            pos = sd["positional_embedding.pos_embedding"]
            seq = int(pos.shape[1]) - 1  # class token
            side = int(round(seq ** 0.5))
            grid_old = (side, side)
            grid_new = (int(image_size[0]) // patches,
                        int(image_size[1]) // patches)
        return convert_vit_state_dict(sd, grid_old=grid_old,
                                      grid_new=grid_new)
    raise NotImplementedError(
        f"no pretrained-weight converter for backbone '{name}' — "
        "supported: ResNet, Swin, ViT, ConvNeXt, DenseNet "
        "(fsnet_tpu.models.torch_convert). Set pretrained=False or add a "
        "converter.")


def resolve_pretrained_path(backbone_cfg: Dict) -> Optional[str]:
    """Explicit ``pretrained_path`` if set, else a torchvision cache hit for
    ResNet depths; None when ``pretrained`` is falsy. Raises when
    ``pretrained=True`` but no weights can be found (error loudly — the
    reference would have trained from ImageNet here)."""
    path = str(backbone_cfg.get("pretrained_path", "") or "")
    pretrained = bool(backbone_cfg.get("pretrained", False))
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"pretrained_path does not exist: {path}")
        return path
    if not pretrained:
        return None
    name = str(backbone_cfg.get("name", "")).lower()
    pname = str(backbone_cfg.get("pretrained_name", "")).lower()
    patterns: List[str] = []
    if "resnet" in name:
        patterns = _resnet_weight_patterns(int(backbone_cfg.get("depth", 18)))
    elif "swin" in name:
        # official release filenames (reference swin_transformer.py:592-595)
        size = {"swin-t": "tiny", "swin-b": "base"}.get(pname or "swin-b",
                                                        "base")
        patterns = [f"swin_{size}_patch4_window7_224*.pth"]
    elif "convnext" in name:
        size = {"convnext-t": "tiny", "convnext-s": "small",
                "convnext-b": "base", "convnext-l": "large",
                "convnext-xt": "xlarge"}.get(pname or "convnext-t", "tiny")
        patterns = [f"convnext_{size}_*.pth"]
    elif "densenet" in name:
        depth = int(backbone_cfg.get("depth", 121))
        patterns = [f"densenet{depth}-*.pth", f"densenet{depth}.pth"]
    elif "vit" in name:
        # PyTorch-Pretrained-ViT release filenames (reference vit.py:459-520)
        pv = (pname or "b_16").upper()
        patterns = [f"{pv}.pth", f"{pv}_imagenet1k.pth", f"{pv}_*.pth"]
    if patterns:
        found = _find_cached_weights(patterns)
        if found:
            return found
    raise FileNotFoundError(
        f"backbone cfg sets pretrained=True but no weights were found for "
        f"'{name}'. The reference initializes encoders from ImageNet "
        f"(vision_base resnet.py:270-284) and self-supervised depth "
        f"converges far worse from scratch. Provide 'pretrained_path' in "
        f"the backbone cfg, or place torchvision weights under "
        f"$FSNET_PRETRAINED_DIR / $TORCH_HOME/hub/checkpoints, or set "
        f"pretrained=False to intentionally train from scratch.")


def graft_pretrained_backbones(state, meta_arch_cfg: Dict,
                               verbose: bool = True):
    """Graft pretrained encoder weights into a fresh TrainState.

    Walks the meta-arch config's backbone scopes (``depth_backbone``,
    ``pose_backbone``; the distill teacher is loaded from the teacher
    checkpoint instead), converts any requested torch weights and grafts
    them by path+shape. Returns ``(state, grafted_scope_names)``.
    """
    from .checkpoint import load_partial_state_dict

    scopes = [("depth_backbone", meta_arch_cfg.get("depth_backbone_cfg")),
              ("pose_backbone", meta_arch_cfg.get("pose_backbone_cfg"))]

    params = dict(state.params)
    stats = dict(state.batch_stats) if state.batch_stats else {}
    grafted: List[str] = []
    for scope, cfg in scopes:
        if not cfg:
            continue
        path = resolve_pretrained_path(dict(cfg))
        if path is None:
            continue
        if scope not in params:
            raise KeyError(
                f"backbone scope '{scope}' missing from params "
                f"(have {sorted(params)})")
        conv_params, conv_stats = convert_backbone_weights(dict(cfg), path)
        n_src = _count_leaves(conv_params)
        n_hit = _count_matching(params[scope], conv_params)
        if n_hit == 0:
            raise ValueError(
                f"pretrained graft into '{scope}' matched 0 of {n_src} "
                f"converted tensors — scope names or shapes disagree")
        params[scope] = load_partial_state_dict(params[scope], conv_params)
        if scope in stats:
            stats[scope] = load_partial_state_dict(stats[scope], conv_stats)
        grafted.append(scope)
        if verbose:
            print(f"pretrained: grafted {n_hit}/{n_src} tensors from "
                  f"{os.path.basename(path)} into '{scope}'")

    if not grafted:
        return state, grafted
    new_stats = type(state.batch_stats)(stats) if stats else state.batch_stats
    return state.replace(params=type(state.params)(params)
                         if not isinstance(state.params, dict) else params,
                         batch_stats=new_stats), grafted
