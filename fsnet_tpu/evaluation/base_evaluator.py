"""Abstract evaluator protocol (reference ``vision_base/evaluation/
base_evaluator.py:3-22``: ``reset``/``step``/``log``/``__call__``)."""
from __future__ import annotations


class BaseEvaluator:
    def reset(self):
        raise NotImplementedError

    def step(self, *args, **kwargs):
        raise NotImplementedError

    def log(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        raise NotImplementedError
