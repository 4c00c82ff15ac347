"""All shipped config templates must load through cfg_from_file and reference
resolvable component names (the reference's config-loading compatibility floor,
``tests/test_cfg.py``, extended with name-resolution checks)."""
import glob
import os

import pytest

from fsnet_tpu.utils import EasyDict, cfg_from_file, find_object

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "*_example.py")))


@pytest.mark.parametrize("config", CONFIGS, ids=[os.path.basename(c)
                                                 for c in CONFIGS])
def test_config_loads(config):
    cfg = cfg_from_file(config)
    assert isinstance(cfg, EasyDict)
    for section in ("path", "trainer", "optimizer", "scheduler", "data",
                    "train_dataset", "val_dataset", "meta_arch"):
        assert section in cfg, f"{config} missing {section}"


def _collect_names(node, out):
    if isinstance(node, dict):
        if "name" in node and isinstance(node["name"], str):
            out.append(node["name"])
        for v in node.values():
            _collect_names(v, out)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _collect_names(v, out)


@pytest.mark.parametrize("config", CONFIGS, ids=[os.path.basename(c)
                                                 for c in CONFIGS])
def test_config_names_resolve(config):
    cfg = cfg_from_file(config)
    names = []
    _collect_names(cfg, names)
    assert names, config
    for name in names:
        if "." not in name:  # optimizer/scheduler switch names ('adam', ...)
            continue
        find_object(name)  # raises if not importable
