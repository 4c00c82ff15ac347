"""On-disk fixture test for the devkit-free NuScenes JSON dataset
(reference ``monodepth/data/datasets/nuscene_dataset.py:171-251``)."""
import json

import numpy as np
import pytest
from PIL import Image

from fsnet_tpu.utils.builder import build

from test_kitti_dataset import CROP_H, CROP_W, H0, W0, _aug_cfg


@pytest.fixture(scope="module")
def nusc_json_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    img_dir = root / "samples" / "CAM_FRONT"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    paths = []
    for i in range(3):
        p = img_dir / f"frame_{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (H0, W0, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))

    pose = np.eye(4)
    pose[0, 3] = 0.8
    samples = [dict(
        frame0=paths[1], frame1=paths[2], **{"frame-1": paths[0]},
        P2=[120.0, 0.0, 40.0, 0.0, 120.0, 20.0, 0.0, 0.0, 1.0],
        pose01=pose.reshape(-1).tolist(),
        camera_type_indexes=0, camera_type="CAM_FRONT",
        **{"pose0-1": np.linalg.inv(pose).reshape(-1).tolist()},
    )]
    jf = root / "nusc.json"
    jf.write_text(json.dumps(dict(samples=samples)))
    return jf


def test_nuscene_json_dataset(nusc_json_tree):
    ds = build(
        name="fsnet_tpu.data.datasets.nuscene_dataset.NusceneJsonDataset",
        json_path=str(nusc_json_tree), augmentation=_aug_cfg(train=False))
    assert len(ds) == 1
    data = ds[0]
    assert data[("image", 0)].shape == (CROP_H, CROP_W, 3)
    assert data["camera_type"] == "CAM_FRONT"
    T = data[("relative_pose", 1)]
    assert abs(np.linalg.norm(T[:3, 3]) - 0.8) < 1e-5
    Tinv = data[("relative_pose", -1)]
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-6)
    # P rewrite followed the resize
    assert abs(data["P2"][0, 0] - 120.0 * CROP_W / W0) < 1e-4
    assert ("filename", 0) in data
