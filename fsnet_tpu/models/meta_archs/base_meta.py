"""Meta-architecture base: train/test dispatch + export contract.

Reference: ``vision_base/networks/models/meta_archs/base_meta.py:3-23``. In the
functional JAX design the dispatch flag must be static (two jit traces), so
``__call__(data, meta)`` reads ``meta['is_training']`` as a python bool.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn


class BaseMetaArch(nn.Module):
    """Subclasses implement ``forward_train``, ``forward_test`` and
    ``dummy_forward`` (image-only graph for export,
    reference ``base_meta.py:13-17``)."""

    def forward_train(self, data: Dict, meta: Dict) -> Dict:
        raise NotImplementedError

    def forward_test(self, data: Dict, meta: Dict) -> Dict:
        raise NotImplementedError

    def dummy_forward(self, image) -> Dict:
        raise NotImplementedError

    def __call__(self, data: Dict, meta: Dict) -> Dict:
        if meta["is_training"]:
            return self.forward_train(data, meta)
        return self.forward_test(data, meta)
