"""Checkpoint I/O: orbax-backed save/load + torch-style surgery.

Reference: ``vision_base/networks/utils/utils.py:3-19`` (``save_models`` /
``load_models``: single file with model+optimizer state, DDP-aware,
``strict=False``) and ``scripts/train.py:190-196`` (``_latest`` every epoch +
``_{epoch}`` periodic, rank 0 only). TPU-native improvements: asynchronous
orbax writes and full state (step/epoch/opt/BN) in the checkpoint so resume
restores the schedule position (SURVEY.md §5).

``load_partial_state_dict`` gives the reference's ``strict=False`` semantics:
only matching paths with matching shapes are grafted, enabling architecture
surgery like the distill-teacher transform (``monodepth/transform_teacher.py``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _state_payload(state, epoch: int) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }


def save_models(path: str, state, epoch: int = 0) -> None:
    """Save full train state to ``path`` (a directory; reference saves
    ``.pth`` files — we keep the same naming convention minus the suffix)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = jax.tree.map(np.asarray, _state_payload(state, epoch))
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_models(path: str, state, strict: bool = False):
    """Restore a checkpoint into ``state``. ``strict=False`` grafts only the
    intersecting subtree (reference ``load_models`` with strict=False,
    ``vision_base/networks/utils/utils.py:10-19``). Returns (state, epoch)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(np.asarray, _state_payload(state, 0))
    if strict:
        restored = ckptr.restore(path, template)
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
    else:
        restored = ckptr.restore(path)
        params = load_partial_state_dict(state.params, restored.get("params", {}))
        batch_stats = load_partial_state_dict(
            state.batch_stats, restored.get("batch_stats", {}))
        opt_state = state.opt_state
        try:
            opt_state = jax.tree.map(
                lambda a, b: b
                if getattr(a, "shape", None) == getattr(b, "shape", None) else a,
                state.opt_state, restored["opt_state"])
        except Exception:  # noqa: BLE001 - optimizer structure changed
            pass
    new_state = state.replace(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jax.numpy.asarray(restored.get("step", 0)),
    )
    return new_state, int(np.asarray(restored.get("epoch", 0)))


def load_partial_state_dict(target: Any, source: Any) -> Any:
    """Recursively overwrite leaves of ``target`` with same-path, same-shape
    leaves from ``source`` (torch ``strict=False`` analogue)."""
    if isinstance(target, dict) or hasattr(target, "items"):
        if not (isinstance(source, dict) or hasattr(source, "items")):
            return target
        out = {}
        for key, tval in target.items():
            if key in source:
                out[key] = load_partial_state_dict(tval, source[key])
            else:
                out[key] = tval
        return type(target)(out) if not isinstance(target, dict) else out
    # leaf
    if source is None:
        return target
    t_shape = getattr(target, "shape", None)
    s_shape = getattr(source, "shape", None)
    if t_shape == s_shape:
        return source
    return target


def extract_subtree(tree: Any, prefix: str) -> Optional[Any]:
    """Fetch a nested subtree by '/'-joined path, or None."""
    node = tree
    for part in prefix.split("/"):
        if not (isinstance(node, dict) or hasattr(node, "get")):
            return None
        node = node.get(part)
        if node is None:
            return None
    return node


def transform_teacher_params(params: Dict) -> Dict:
    """Strip a trained wpose checkpoint down to
    ``{depth_backbone, depth_decoder}`` for the distill teacher
    (reference ``monodepth/transform_teacher.py:6-23``: keeps
    ``depth_backbone.*`` + renames the head's depth decoder)."""
    out = {}
    backbone = extract_subtree(params, "depth_backbone")
    if backbone is not None:
        out["depth_backbone"] = backbone
    decoder = extract_subtree(params, "head/depth_decoder")
    if decoder is not None:
        out["depth_decoder"] = decoder
    return out


def load_teacher_into_params(params: Dict, teacher_params: Dict) -> Dict:
    """Graft transformed teacher weights under the ``teacher_net`` scope of a
    DistillWPoseMeta parameter tree (reference loads the transformed ``.pth``
    into ``self.teacher_net``, ``monodepth2_model.py:159-164``)."""
    params = dict(params)
    if "teacher_net" in params:
        params["teacher_net"] = load_partial_state_dict(
            params["teacher_net"], teacher_params)
    return params
