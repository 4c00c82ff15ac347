"""Config & builder DI-kernel tests.

Mirrors + extends the reference's only unit tests (``tests/test_cfg.py:11-39``):
config-file loading and dotted-key override merge, plus builder resolution and
combinator semantics the reference leaves untested.
"""
import os
import tempfile

import numpy as np
import pytest

from fsnet_tpu.utils import (
    EasyDict, Sequential, Shuffle, build, cfg_from_file, find_object, update_cfg,
)
from fsnet_tpu.utils.keys import decode_batch, decode_key, encode_batch, encode_key

CFG_BODY = """
from easydict import EasyDict as edict
import numpy as np

cfg = edict()
cfg.data = edict(batch_size=4, rgb_shape=(192, 640, 3))
cfg.optimizer = edict(name='adam', lr=1e-4)
cfg.aug = edict(mean=np.array([0.485, 0.456, 0.406]))
"""


def _write_cfg(tmpdir):
    path = os.path.join(tmpdir, "config.py")
    with open(path, "w") as f:
        f.write(CFG_BODY)
    return path


def test_cfg_from_file_loads_easydict():
    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = cfg_from_file(_write_cfg(tmpdir))
    assert isinstance(cfg, EasyDict)
    assert cfg.data.batch_size == 4
    assert cfg["optimizer"]["name"] == "adam"
    assert np.allclose(cfg.aug.mean, [0.485, 0.456, 0.406])


def test_update_cfg_semantics():
    # reference tests/test_cfg.py:18-39
    cfg = EasyDict({"a": 1, "b": {"c": 0, "f": 2}, "c": 3})
    cfg = update_cfg(cfg, **{"a": 2, "b.c": 3, "d.e.f": 4, "c.g": 1})
    assert cfg["b"]["f"] == 2          # untouched sibling
    assert cfg["a"] == 2               # direct update
    assert cfg["b"]["c"] == 3          # nested update
    assert isinstance(cfg["d"]["e"], dict) and cfg["d"]["e"]["f"] == 4  # creation
    assert isinstance(cfg["c"], dict) and cfg["c"]["g"] == 1  # type overwrite


def test_find_object_and_build():
    exp = find_object("numpy.exp")
    assert exp(0.0) == 1.0
    arr = build("numpy.zeros", 3)
    assert arr.shape == (3,)
    # getattr-walking past the module boundary
    assert find_object("numpy.linalg.inv") is np.linalg.inv


def test_find_object_error():
    with pytest.raises(ModuleNotFoundError):
        find_object("no.such.module.Klass")


class _AddN:
    def __init__(self, n, scale=1):
        self.n = n
        self.scale = scale

    def __call__(self, x):
        return (x + self.n) * self.scale


def test_sequential_common_keywords():
    seq = Sequential(
        cfg_list=[
            {"name": f"{__name__}._AddN", "n": 1},
            {"name": f"{__name__}._AddN", "n": 2, "scale": 2},
        ],
        scale=1,  # common keyword, overridden by the second child
    )
    assert seq(0) == 6  # (0+1)*1 -> (1+2)*2


def test_shuffle_runs_all_children():
    np.random.seed(0)
    sh = Shuffle(cfg_list=[{"name": f"{__name__}._AddN", "n": i} for i in (1, 2, 3)])
    assert sh(0) == 6  # addition commutes; all children must run exactly once


def test_key_encoding_roundtrip():
    keys = [("image", 0), ("relative_pose", -1), ("depth", 0, 0), "P2",
            ("image_resize", "effective_size")]
    for k in keys:
        assert decode_key(encode_key(k)) == k
    batch = {("image", 0): 1, "P2": 2}
    enc = encode_batch(batch)
    assert set(enc) == {"image/0", "P2"}
    assert decode_batch(enc) == batch
