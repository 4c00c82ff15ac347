"""Collate + multi-dataset concatenation.

Reference: ``vision_base/data/datasets/dataset_utils.py`` —
``collate_fn:16`` stacks only keys shared by ALL samples
(``find_shared_keys:7``); arrays are stacked, scalars become arrays, anything
else is kept as a python list. ``ConcatDataset:30`` builds children from
``cfg_list`` merged with ``common_keywords`` and routes a global index through
``np.searchsorted`` over cumulative lengths.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from ...utils.builder import build


def find_shared_keys(list_of_dicts: Sequence[Dict]) -> List:
    """Keys present in every sample (reference ``dataset_utils.py:7-13``)."""
    if not list_of_dicts:
        return []
    shared = set(list_of_dicts[0].keys())
    for d in list_of_dicts[1:]:
        shared &= set(d.keys())
    # preserve the ordering of the first sample for determinism
    return [k for k in list_of_dicts[0] if k in shared]


def collate_fn(batch: Sequence[Dict]) -> Dict:
    """Stack shared-key samples into batch arrays
    (reference ``dataset_utils.py:16-27``). Tensors/ndarrays are stacked along
    a new leading axis; numeric scalars become [B] arrays; everything else
    (strings, dicts like fisheye ``calib_meta``) stays a list."""
    collated: Dict[Any, Any] = {}
    for key in find_shared_keys(batch):
        values = [sample[key] for sample in batch]
        first = values[0]
        if isinstance(first, np.ndarray):
            collated[key] = np.stack(values, axis=0)
        elif isinstance(first, (int, float, np.integer, np.floating, bool)):
            collated[key] = np.asarray(values)
        else:
            collated[key] = values
    return collated


class ConcatDataset:
    """Joint training over multiple datasets (reference ``dataset_utils.py:30-56``)."""

    def __init__(self, cfg_list: Sequence[Dict], **common_keywords):
        self.datasets = []
        for item in cfg_list:
            cfg = dict(common_keywords)
            cfg.update(item)
            self.datasets.append(build(**cfg))
        lengths = [len(d) for d in self.datasets]
        self.separations = np.cumsum(lengths)
        self.total_length = int(self.separations[-1]) if lengths else 0

    def _determine_index(self, index: int):
        dataset_idx = int(np.searchsorted(self.separations, index, side="right"))
        local = index - (self.separations[dataset_idx - 1] if dataset_idx > 0 else 0)
        return dataset_idx, int(local)

    def __len__(self) -> int:
        return self.total_length

    def __getitem__(self, index: int) -> Dict:
        dataset_idx, local_idx = self._determine_index(index)
        return self.datasets[dataset_idx][local_idx]
