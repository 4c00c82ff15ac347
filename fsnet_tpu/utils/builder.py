"""Reflective object builder — the DI kernel every layer plugs into.

Same public surface as the reference (``vision_base/utils/utils.py:115-169`` and
``vision_base/utils/builder.py:5-71``): components are named by fully-qualified
import path strings in configs and instantiated via ``build(name=..., **kwargs)``.

``Sequential`` / ``Parallel`` / ``Shuffle`` compose configured callables (used for
augmentation pipelines); ``common_keywords`` are merged under each child cfg.
"""
from __future__ import annotations

import importlib
from typing import Callable, Dict, List

import numpy as np


def merge_name(list_of_name) -> str:
    """Join ['A', 'B', 'C'] into 'A.B.C'."""
    return ".".join(list_of_name)


def find_object(object_string: str):
    """Resolve a dotted path to a module/class/function.

    Tries progressively shorter module prefixes (longest first) then getattr-walks
    the remainder, so both ``pkg.mod`` and ``pkg.mod.Class.attr`` resolve
    (reference ``find_object``, ``vision_base/utils/utils.py:127-169``).
    """
    splitted_names = object_string.split(".")

    error_traces = []
    for i in range(len(splitted_names), 0, -1):
        merged_name = merge_name(splitted_names[0:i])
        try:
            module = importlib.import_module(merged_name)
            base_obj = module
            for name in splitted_names[i:]:
                base_obj = getattr(base_obj, name)
        except Exception as e:  # noqa: BLE001 - collect all failed prefixes
            error_traces.append((merged_name, e))
            continue
        return base_obj

    error_log = "".join(f"{name} : {error} \n" for name, error in error_traces)
    raise ModuleNotFoundError(
        f"{object_string} not imported, error traces: \n{error_log}"
    )


def build(name: str, *args, **kwargs):
    """Instantiate/call the object named by ``name`` with the remaining arguments."""
    obj = find_object(name)
    return obj(*args, **kwargs)


class Sequential:
    """Chain configured callables; each child's output feeds the next
    (tuple outputs are splatted). Reference ``builder.py:9-29``."""

    def __init__(self, cfg_list: List[Dict], **common_keywords):
        self.children: List[Callable] = []
        for item in cfg_list:
            tmp = dict(common_keywords)
            tmp.update(item)
            self.children.append(build(**tmp))

    def __call__(self, *args, **kwargs):
        result = None
        for i, child in enumerate(self.children):
            if i == 0:
                result = child(*args, **kwargs)
            elif isinstance(result, tuple):
                result = child(*result)
            else:
                result = child(result)
        return result


class Parallel:
    """Fan the same inputs out to every child; collect outputs into a list.
    Reference ``builder.py:31-46``."""

    def __init__(self, cfg_list: List[Dict], **common_keywords):
        self.children: List[Callable] = []
        for item in cfg_list:
            tmp = dict(common_keywords)
            tmp.update(item)
            self.children.append(build(**tmp))

    def __call__(self, *args, **kwargs):
        return [child(*args, **kwargs) for child in self.children]


class Shuffle:
    """Run children sequentially in a random order (host numpy RNG); used to
    shuffle photometric augmentations. Reference ``builder.py:48-71``."""

    def __init__(self, cfg_list: List[Dict], **common_keywords):
        self.children: List[Callable] = []
        for item in cfg_list:
            tmp = dict(common_keywords)
            tmp.update(item)
            self.children.append(build(**tmp))

    def __call__(self, *args, **kwargs):
        shuffled_indexes = np.random.permutation(len(self.children))
        result = None
        for i, index in enumerate(shuffled_indexes):
            child = self.children[index]
            if i == 0:
                result = child(*args, **kwargs)
            elif isinstance(result, tuple):
                result = child(*result)
            else:
                result = child(result)
        return result
