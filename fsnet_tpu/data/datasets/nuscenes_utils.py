"""Process-global NuScenes devkit singleton (reference
``vision_base/data/datasets/nuscenes_utils.py:1-6``): the devkit object is
expensive to construct, so it is cached per (dataroot, version).

The nuscenes-devkit is an optional dependency; importing is deferred so the
rest of the framework works without it (the JSON-ified fast dataset,
``NusceneJsonDataset``, needs no devkit at all).
"""
GLOBAL_DICT = {}


def NuScenes(dataroot, version, *args, **kwargs):
    if (dataroot, version) not in GLOBAL_DICT:
        try:
            from nuscenes.nuscenes import NuScenes as NuSceneObj
        except ImportError as e:  # pragma: no cover - env without devkit
            raise ImportError(
                "nuscenes-devkit is required for raw NuScenes datasets; use "
                "NusceneJsonDataset (precomputed JSON) instead") from e
        GLOBAL_DICT[(dataroot, version)] = NuSceneObj(
            version=version, dataroot=dataroot, *args, **kwargs)
    return GLOBAL_DICT[(dataroot, version)]
