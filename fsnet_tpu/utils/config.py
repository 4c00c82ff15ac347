"""Config loading & CLI override merging.

Same public surface as the reference (``vision_base/utils/utils.py:38-113``):

- ``cfg_from_file(path)``: execute a user ``.py`` config file and return its ``cfg``
  EasyDict. The reference copies the file into a tempdir and imports it so repeated
  loads are independent; we exec the file in a fresh module namespace which has the
  same semantics without touching ``sys.path``.
- ``update_cfg(cfg, **{'a.b.c': v})``: recursive dotted-key override merge
  (reference ``update_dict``/``update_cfg``, ``utils.py:56-113``).
- ``set_random_seed(seed)``: seed python/numpy (reference ``utils.py:21-36``; the JAX
  train step takes explicit PRNG keys so there is no global device seed to set).
"""
from __future__ import annotations

import importlib.util
import os
import random
import sys
import types

import numpy as np

from .easydict import EasyDict

# Configs written against the reference do `from easydict import EasyDict as edict`.
# If the third-party package is absent, alias our native implementation so those
# configs load unchanged.
if "easydict" not in sys.modules:
    try:  # pragma: no cover - depends on environment
        import easydict  # noqa: F401
    except ImportError:
        _shim = types.ModuleType("easydict")
        _shim.EasyDict = EasyDict  # type: ignore[attr-defined]
        sys.modules["easydict"] = _shim


def cfg_from_file(cfg_filename: str) -> EasyDict:
    """Load a python config file that defines a module-level ``cfg`` EasyDict."""
    assert cfg_filename.endswith(".py"), \
        f"config must be a .py file, got {cfg_filename}"
    cfg_filename = os.path.abspath(cfg_filename)

    spec = importlib.util.spec_from_file_location(
        f"_fsnet_cfg_{abs(hash(cfg_filename))}", cfg_filename
    )
    assert spec is not None and spec.loader is not None, cfg_filename
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)

    cfg = getattr(module, "cfg")
    assert isinstance(cfg, EasyDict) or isinstance(cfg, dict), type(cfg)
    if not isinstance(cfg, EasyDict):
        cfg = EasyDict(cfg)
    return cfg


def update_dict(obj: dict, key: str, rest_items: list, value):
    """Recursively set ``obj[key][rest...[-1]] = value``, creating / overwriting
    intermediate non-dict values with fresh EasyDicts (reference ``utils.py:56-80``)."""
    if len(rest_items) == 0:
        obj[key] = value
        return obj

    if not (key in obj and isinstance(obj[key], dict)):
        obj[key] = EasyDict()
    obj[key] = update_dict(obj[key], rest_items[0], rest_items[1:], value)
    return obj


def update_cfg(cfg: EasyDict, **kwargs) -> EasyDict:
    """Apply dotted-key CLI overrides, e.g. ``update_cfg(cfg, **{'b.c': 3})``."""
    for key, value in kwargs.items():
        key_items = key.split(".")
        cfg = update_dict(cfg, key_items[0], key_items[1:], value)
    return cfg


def set_random_seed(seed: int, deterministic: bool = False) -> None:
    """Seed host-side RNGs (python + numpy). Device-side randomness in this framework
    is handled through explicit ``jax.random`` keys derived from the same seed."""
    del deterministic  # XLA is deterministic by default for a fixed program
    random.seed(seed)
    np.random.seed(seed)


def get_num_parameters(params) -> int:
    """Count trainable parameters of a flax param tree (reference
    ``vision_base/utils/utils.py:12-19``; DDP unwrapping is moot here)."""
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))
